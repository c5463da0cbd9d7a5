"""Plan-quality regression pins for the core weather stages: the dims
must broadcast (no fact-table shuffle for dim joins), aggregations must
have map-side partial phases, and known Catalyst traps must stay fixed.
These are structural assertions on the executed plan string — they fail
if a future change silently degrades the physical strategy."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fact(spark, n_stations=4, n_rows=200):
    rows = [
        (s, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=10 * i),
         None if i % 9 == 0 else float(i % 7))
        for s in range(1, n_stations + 1) for i in range(n_rows)
    ]
    return spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, qc double"
    )


def _dims(spark, n=4):
    from weatherdb_spark.operators.neighbors import knn_stations

    meta = spark.createDataFrame(
        [(i, float(i * 10000), 0.0, 100) for i in range(1, n + 1)],
        "station_id int, x_utm double, y_utm double, stationshoehe int",
    )
    knn = knn_stations(meta, k=None, max_dist_m=130_000.0)
    ma = spark.createDataFrame(
        [(i, 10.0) for i in range(1, n + 1)], "station_id int, value double"
    )
    return knn, ma


def _broadcast_subtrees(plan: str) -> list[str]:
    """The full subtree under every BroadcastExchange node, delimited by
    the tree-art indentation (a following line at the same or shallower
    ``+-`` depth ends the subtree) — substring-splitting the plan text
    would swallow unrelated siblings printed after the exchange."""
    def depth(ln: str) -> int:
        j = ln.find("+-")
        return j if j >= 0 else -1

    lines = plan.splitlines()
    subs = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d = depth(ln)
        sub = [ln]
        for nxt in lines[i + 1:]:
            nd = depth(nxt)
            if 0 <= nd <= d:
                break
            sub.append(nxt)
        subs.append("\n".join(sub))
    return subs


def test_rank_fill_broadcasts_dims_not_facts(spark):
    """The (knn x ma) dim must be the broadcast side; the fact table must
    never appear under a BroadcastExchange."""
    from weatherdb_spark.operators.fillup import rank_fill

    knn, ma = _dims(spark)
    plan = _plan(rank_fill(_fact(spark), knn, ma, coef_sign="mult"))
    assert "BroadcastHashJoin" in plan
    # every BroadcastExchange subtree must be dim-sized or keys-only:
    # none may carry fact VALUE rows. The hole-keys side (filter
    # isnull(qc) projected to join keys) is allowed — it is keys-only
    # and Catalyst picks broadcast vs shuffle for it by size.
    for sub in _broadcast_subtrees(plan):
        if "isnull(qc" in sub:
            continue  # hole-keys side, keys-only
        assert "ExistingRDD" not in sub or "qc" not in sub, plan


def test_median_fill_single_fact_aggregate(spark):
    """T's median fill: exactly one groupBy aggregation over the donor
    join (no duplicated fact aggregation)."""
    from weatherdb_spark.operators.fillup import median_fill

    knn, ma = _dims(spark, n=7)
    plan = _plan(median_fill(_fact(spark, 7), knn, ma, n_donors=5))
    # one logical aggregate -> partial + final HashAggregate pair over
    # the percentile; collect_list forces ObjectHashAggregate
    assert plan.count("ObjectHashAggregate") >= 2, plan


def test_richter_correct_no_fact_shuffle_for_joinback(spark):
    """The correction dim is broadcast: the only hashpartitioning
    exchanges are the (dim-sized) daily aggregation and the t-daily
    distinct — the 10-min fact join-back must not shuffle."""
    from weatherdb_spark.operators.richter import (
        richter_correct,
        richter_parameters_df,
    )

    facts = _fact(spark).withColumnRenamed("qc", "filled")
    ts_t = spark.createDataFrame(
        [(s, dt.date(2024, 1, 1 + d), 1.0) for s in (1, 2, 3, 4) for d in range(2)],
        "station_id int, timestamp date, filled double",
    )
    meta = spark.createDataFrame(
        [(s, "no-protection") for s in (1, 2, 3, 4)],
        "station_id int, richter_class string",
    )
    plan = _plan(richter_correct(
        facts, ts_t, meta, richter_parameters_df(spark),
        est_station_days=8,  # the Broker's watermark-fed estimate
    ))
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 2, plan


def test_richter_correct_autosizes_correction_join(spark):
    """The correction-dim join auto-selects by (station, day) cardinality
    (VERDICT r2 'What's wrong' #2): under BROADCAST_STATION_DAYS_MAX it
    broadcasts; above, it falls back to a shuffle join so a fact-derived
    dim is never forced into executor memory at 100 TB."""
    from weatherdb_spark.operators.richter import (
        BROADCAST_STATION_DAYS_MAX,
        richter_correct,
        richter_parameters_df,
    )

    facts = _fact(spark).withColumnRenamed("qc", "filled")
    ts_t = spark.createDataFrame(
        [(s, dt.date(2024, 1, 1 + d), 1.0) for s in (1, 2, 3, 4) for d in range(2)],
        "station_id int, timestamp date, filled double",
    )
    meta = spark.createDataFrame(
        [(s, "no-protection") for s in (1, 2, 3, 4)],
        "station_id int, richter_class string",
    )
    params = richter_parameters_df(spark)

    small = _plan(richter_correct(
        facts, ts_t, meta, params, est_station_days=1000))
    assert "BroadcastHashJoin" in small, small

    big = _plan(richter_correct(
        facts, ts_t, meta, params,
        est_station_days=BROADCAST_STATION_DAYS_MAX + 1))
    # the corr join-back must not be broadcast; only the tiny meta/params
    # dims may. The join-back keys are (station_id, _day) — assert no
    # broadcast join on that pair.
    import re

    joinbacks = [
        ln for ln in big.splitlines()
        if "BroadcastHashJoin" in ln and re.search(r"station_id#\d+, _day", ln)
    ]
    assert not joinbacks, big

    # no estimate: the join-back is left unhinted so AQE sizes it at
    # runtime from the dim's actual size — and crucially no fact scan
    # runs at plan-build time just to pick a strategy
    auto = _plan(richter_correct(facts, ts_t, meta, params))
    assert "AdaptiveSparkPlan" in auto, auto
    auto_joinbacks = [
        ln for ln in auto.splitlines()
        if "BroadcastHashJoin" in ln and re.search(r"station_id#\d+, _day", ln)
    ]
    assert not auto_joinbacks, auto  # static plan leaves the choice to AQE


def test_single_station_read_prunes_bucket_partitions(spark, tmp_path):
    """A stids read from the bucketed warehouse must list only the
    matching station_bucket directories (PartitionFilters), not all N."""
    import datetime as ddt

    from weatherdb_spark.api import get_df
    from weatherdb_spark.broker import Broker

    b = Broker(spark, str(tmp_path / "wh"))
    rows = [(s, ddt.datetime(2024, 1, 1) + ddt.timedelta(days=d), float(d))
            for s in range(40) for d in range(5)]
    b.write(
        "ts_p_d",
        spark.createDataFrame(
            rows, "station_id int, timestamp timestamp, raw double"
        ),
        bucket_by_station=True,
    )
    df = get_df(b.read("ts_p_d"), "p_d", kinds=("raw",), stids=[1])
    plan = _plan(df)
    assert "PartitionFilters" in plan, plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "station_bucket" in pf, plan
    # the scan must touch 1 of the 16 bucket dirs
    assert df.count() == 5


def test_qc_t_broadcast_median_dim(spark):
    from weatherdb_spark.operators.qc import qc_t

    knn, ma = _dims(spark)
    meta = spark.createDataFrame(
        [(i, 100) for i in (1, 2, 3, 4)], "station_id int, stationshoehe int"
    )
    ts_t = spark.createDataFrame(
        [(s, dt.date(2024, 1, 1), 5.0) for s in (1, 2, 3, 4)],
        "station_id int, timestamp date, raw double",
    )
    plan = _plan(qc_t(ts_t, knn, ma, meta))
    assert "BroadcastHashJoin" in plan


def test_median_fill_near_path_no_per_timestamp_window(spark):
    """The near-distance median path must select its first-n-by-rank
    donors with a hash aggregate, never a row_number window over the
    (station, timestamp) candidate rows — a window forces a total sort
    of the |donor facts| x |near neighbors| stream. Windows partitioned
    by station alone (the dim-sized far-candidate ranking) are fine."""
    from weatherdb_spark.operators.fillup import median_fill

    knn, ma = _dims(spark, n=7)
    plan = _plan(median_fill(
        _fact(spark, 7), knn, ma, n_donors=5,
        near_dist_m=25_000.0, cascade_k=3,
    ))
    for line in plan.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            assert "timestamp" not in line, f"per-timestamp window:\n{line}"
    # the top-n selection is the collect_list/array_sort hash aggregate
    assert "ObjectHashAggregate" in plan, plan


def test_interpolate_gaps_has_no_unbounded_following_frame(spark):
    """Spark evaluates (k, UNBOUNDED FOLLOWING) window frames by
    recomputing the aggregate from every row to the partition end —
    O(rows^2) per partition (measured: ~10 min for ONE 52k-row
    station-year). interpolate_gaps must express its forward bracket as
    a running frame over descending order instead; pin the plan."""
    import datetime as dt

    from weatherdb_spark.operators.fillup import interpolate_gaps

    facts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0), (1, dt.datetime(2024, 1, 2), None),
         (1, dt.datetime(2024, 1, 3), 3.0)],
        "station_id int, timestamp timestamp, filled double",
    )
    plan = interpolate_gaps(facts, max_gap="2 days")._jdf.queryExecution() \
        .optimizedPlan().toString().lower()
    assert "unboundedfollowing" not in plan.replace(" ", "")


@pytest.mark.parametrize(
    "name,max_jobs",
    [
        # measured stable at sf0.001 (3 runs each, shuffle_partitions=8);
        # the counts include AQE stage-materialization jobs, so the pin is
        # an upper bound: an accidental extra ACTION (a new probe,
        # isEmpty, eager persist, driver collect) adds whole jobs and
        # trips it loudly, while plan-level improvements can only lower it
        # re-pinned after the unhinted timeline/hole-driven joins: AQE
        # decomposes the sort-merge stages into one or two extra
        # materialization jobs per query (still zero extra ACTIONS)
        ("fillup_median_deep", 30),
        ("fillup_rank_fill_deep", 23),
        ("fillup_rank_fill", 16),
        ("qc_neighbor_median", 13),
        # LSH family (measured 4/10/4 stable x3): the pairs/simhash
        # paths are pure map-side candidate generation + one verify
        # join, the minhash path adds the banded-signature exchange
        ("embedding_cosine_pairs_lsh", 7),
        ("dedup_minhash_lsh", 13),
        ("dedup_simhash_exact", 7),
        # round-6 training-pipeline family (measured stable x2 at
        # 14/11/6/2/4/7/5/6/3; pins leave AQE headroom only)
        ("search_bm25_topk", 16),
        # re-pinned r9: the LSH signature-base scoped_persist (its pair
        # stage computed once instead of per self-join side; interleaved
        # A/B -23% on the pair stage) materializes through 2-3 extra AQE
        # jobs — measured 15-16 across fresh/warm sessions, still ONE
        # action plus persists
        ("semantic_dedup", 18),
        ("pack_concat_chunk", 8),
        ("text_chunk_windows", 3),
        ("sample_source_quota", 6),
        ("text_unigram_logprob", 9),
        ("text_repetition", 7),
        # +1 action since round 7: the size-gate counts the reference
        # n-gram set before deciding the broadcast (measured 9 x3)
        ("decontaminate_ngram", 10),
        ("shuffle_shard", 5),
        # the five-stage composition (measured 26 x3 stable: AQE stage
        # materialization across the dedup/quota/pack joins plus the two
        # scoped_persists that keep the scan+regex work single-execution
        # — still one action); a second ACTION would add several jobs
        ("prepare_training_corpus", 29),
    ],
)
def test_query_job_count_pinned(spark, name, max_jobs):
    """Spark-UI-less job-count pin (round-4 ask #7): run the query under
    a job group and count the jobs the whole build+execute launched via
    statusTracker — the programmatic twin of reading the UI jobs page."""
    import uuid

    from tests.conftest import SF_DIR
    from weatherdb_spark.plans.registry import EXTRA_REGISTRY, REGISTRY

    spec = {**REGISTRY, **EXTRA_REGISTRY}[name]
    spark.catalog.clearCache()
    sc = spark.sparkContext
    group = f"jobpin_{uuid.uuid4().hex}"
    sc.setJobGroup(group, f"job pin {name}", False)
    try:
        df = spec.spark_fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
    finally:
        sc.setJobGroup("", "")
        spark.catalog.clearCache()
    n = len(sc.statusTracker().getJobIdsForGroup(group))
    # lower bound 1, not 2: the r9 schema memo (broker/testdata) removed
    # the per-read footer-inference job, so a single-stage query in a
    # warm session legitimately runs as ONE job (text_chunk_windows);
    # 0 would mean the query never executed
    assert 1 <= n <= max_jobs, (
        f"{name} launched {n} jobs (pin {max_jobs}): an extra action "
        "(probe/isEmpty/persist/collect) crept into the query path"
    )


def test_fillup_p_caches_filled_series_before_daily_adjust(spark, tmp_path):
    """The P fillup plan must read the filled+interpolated series from a
    cache (InMemoryRelation/InMemoryTableScan): daily_adjust_p consumes
    it from several NON-identical subtrees (daily-sum dim, row stream,
    year_chunked edge/context branches), so exchange reuse cannot fire —
    without the cache the whole rank_fill + interpolation chain
    re-executes 3-4x (measured 150s -> 42s at 10.5M rows)."""
    import datetime as ddt

    from weatherdb_spark.broker import Broker
    from weatherdb_spark.functions.caching import cache_scope

    b = Broker(spark, str(tmp_path / "wh"))
    b.update_meta(spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100), (2, "p", True, 5000.0, 0.0, 200)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    ))
    b.update_ma_raster(spark.createDataFrame(
        [(s, "p", t, 800.0) for s in (1, 2) for t in ("year", "wihy", "suhy")],
        "station_id int, parameter string, term string, value double",
    ))
    b.update_raw("p", spark.createDataFrame(
        [(s, ddt.datetime(2024, 1, 1) + ddt.timedelta(minutes=10 * i),
          float(i % 3), 1)
         for s in (1, 2) for i in range(288)],
        "station_id int, timestamp timestamp, raw double, qn short",
    ))
    b.update_raw("p_d", spark.createDataFrame(
        [(s, ddt.datetime(2024, 1, 1) + ddt.timedelta(days=d), 20.0)
         for s in (1, 2) for d in range(2)],
        "station_id int, timestamp timestamp, raw double",
    ))
    b.quality_check()
    with cache_scope():
        out = b._fillup_compute("p", b.read("ts_p"), b.read("ts_p_d"))
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" in plan, plan
        assert out.count() == 2 * 288  # and it still computes


def test_period_read_prunes_year_partitions(spark, tmp_path):
    """A fully-bounded period read prunes the ts_year leaves (layout 3):
    the scan's PartitionFilters carry the year predicate, so a two-year
    query over a 50-year archive never opens the other 48 years."""
    import datetime as ddt

    from weatherdb_spark.broker import Broker
    from weatherdb_spark.station import Station

    b = Broker(spark, str(tmp_path / "wh"))
    rows = [(s, ddt.datetime(2018 + y, 6, 1) + ddt.timedelta(days=d), float(d))
            for s in (1, 2) for y in range(6) for d in range(10)]
    b.write(
        "ts_p_d",
        spark.createDataFrame(
            rows, "station_id int, timestamp timestamp, raw double"
        ),
        bucket_by_station=True,
    )
    df = Station(b, 1, "p_d").get_df(
        kinds=("raw",), period=("2020-01-01", "2021-12-31")
    )
    plan = _plan(df)
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "ts_year" in pf, plan
    assert "station_bucket" in pf, plan
    assert df.count() == 20  # 2 years x 10 rows, station 1 only


def test_ivf_topk_plan_no_cross_join_and_grouped_topk(spark):
    """The IVF path's per-query cell choice is a centroid-literal
    expression (sorted-slice over the distance array), NOT the old
    crossJoin(centroids) + row_number window; and the final top-k runs
    through WindowGroupLimit (partial per-partition pruning before the
    exchange) instead of ranking the full candidate set."""
    import random

    from weatherdb_spark.llm.similarity import ivf_topk

    rng = random.Random(3)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(150)],
        "vec_id long, embedding array<float>",
    )
    plan = _plan(ivf_topk(emb, emb.limit(4), k=3, n_cells=4, n_probe=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "WindowGroupLimit" in plan
