"""Opt-in scaled-integer storage: value x decimals as int with
divide-on-read, mirroring the reference database's storage form
(StationBases.py:1080-1082 import scaling, 2638-2643 read division,
:60 exempt kinds)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.api import get_df
from weatherdb_spark.config import PARAMETERS
from weatherdb_spark.functions.units import from_db_unit, to_db_unit


@pytest.fixture(scope="module")
def double_ts(spark):
    rows = []
    for s in (1, 2):
        for i in range(144):
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=10 * i)
            raw = None if i % 11 == 5 else round((i % 9) * 0.13, 2)
            rows.append((s, ts, raw, 3, None if raw is None else 2))
    return spark.createDataFrame(
        rows,
        "station_id int, timestamp timestamp, raw double, qn short, "
        "filled_by short",
    )


def test_to_db_unit_scales_and_exempts(double_ts):
    scaled = to_db_unit(double_ts, "p")
    dtypes = dict(scaled.dtypes)
    assert dtypes["raw"] == "bigint"
    assert dtypes["qn"] == "smallint"  # exempt kind untouched
    assert dtypes["filled_by"] == "smallint"
    row = scaled.filter(
        (F.col("station_id") == 1)
        & (F.col("timestamp") == dt.datetime(2024, 1, 1, 0, 10))
    ).first()
    assert row["raw"] == 13  # 0.13 * decimals(100)
    # NULLs survive the scaling
    assert scaled.filter(F.col("raw").isNull()).count() == \
        double_ts.filter(F.col("raw").isNull()).count()


def test_get_df_divides_scaled_storage_on_read(double_ts):
    scaled = to_db_unit(double_ts, "p")
    dec = PARAMETERS["p"]["decimals"]
    a = {(r["station_id"], r["timestamp"]): r["raw"]
         for r in get_df(double_ts, "p", kinds=("raw", "qn")).collect()}
    b = {(r["station_id"], r["timestamp"]): r["raw"]
         for r in get_df(scaled, "p", kinds=("raw", "qn")).collect()}
    assert a.keys() == b.keys()
    for k, va in a.items():
        vb = b[k]
        if va is None:
            assert vb is None
        else:
            assert vb == pytest.approx(va, abs=1.0 / dec)


def test_get_df_db_unit_true_returns_stored_integers(double_ts):
    scaled = to_db_unit(double_ts, "p")
    out = get_df(scaled, "p", kinds=("raw",), db_unit=True)
    assert dict(out.dtypes)["raw"] == "bigint"
    assert out.filter(F.col("raw") == 13).count() > 0


def test_get_df_double_tables_unaffected(double_ts):
    # a double table must read identically whether db_unit is set or not
    a = get_df(double_ts, "p", kinds=("raw",)).collect()
    b = get_df(double_ts, "p", kinds=("raw",), db_unit=True).collect()
    assert a == b


def test_aggregated_read_matches_double_mode(double_ts):
    scaled = to_db_unit(double_ts, "p")
    a = {(r["station_id"], r["timestamp"]): r["raw"]
         for r in get_df(double_ts, "p", kinds=("raw",), agg_to="hour").collect()}
    b = {(r["station_id"], r["timestamp"]): r["raw"]
         for r in get_df(scaled, "p", kinds=("raw",), agg_to="hour").collect()}
    assert a.keys() == b.keys()
    for k, va in a.items():
        # 6 rows per hour, each within half a storage ulp
        if va is None:
            assert b[k] is None
        else:
            assert b[k] == pytest.approx(va, abs=6 * 0.5 / 100 + 1e-9)


def test_from_db_unit_roundtrip(double_ts):
    back = from_db_unit(to_db_unit(double_ts, "p"), "p")
    assert dict(back.dtypes)["raw"] == "double"
    pairs = (
        double_ts.select("station_id", "timestamp", F.col("raw").alias("a"))
        .join(
            back.select("station_id", "timestamp", F.col("raw").alias("b")),
            ["station_id", "timestamp"],
        )
    )
    bad = pairs.filter(F.abs(F.col("a") - F.col("b")) > 1.0 / 100).count()
    assert bad == 0


def test_checkpoint_checksum_disable_scoped_to_local_masters(spark):
    """The Spark 4.1 checkpoint-checksum hang workaround must not weaken
    checkpoint durability on real clusters: only local[n] masters disable
    the checksums; cluster masters keep Spark's default (enabled)."""
    from weatherdb_spark.session import checkpoint_checksum_conf

    key = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    assert checkpoint_checksum_conf("local[32]") == {key: "false"}
    assert checkpoint_checksum_conf("local[*]") == {key: "false"}
    for master in ("yarn", "spark://host:7077", "k8s://https://host:443"):
        assert checkpoint_checksum_conf(master) == {}
    # the live (local) test session actually carries the workaround
    assert spark.conf.get(key) == "false"


def test_margin_delta_compound_and_calendar_units():
    """_margin_delta must accept every margin the INTERVAL expressions
    accept: compound ('5 hours 50 minutes') and calendar units (month/
    year, over-approximated — the delta only widens the year-pruning
    span, where over-coverage is safe and under-coverage drops rows)."""
    import datetime as dt

    import pytest

    from weatherdb_spark.broker import Broker

    md = Broker._margin_delta
    assert md("2 days") == dt.timedelta(days=2)
    assert md("5 hours 50 minutes") == dt.timedelta(hours=5, minutes=50)
    assert md("1 week") == dt.timedelta(days=7)
    assert md("1 month") >= dt.timedelta(days=31)
    assert md("1 year") >= dt.timedelta(days=366)
    with pytest.raises(ValueError, match="not supported"):
        md("3 fortnights")
    with pytest.raises(ValueError, match="not"):
        md("3")


def test_stream_simhash_saturation_warning(spark, caplog):
    """Default bits=32 / max_hamming=6 gives 4-5-bit block keys (16-32
    buckets per block) — state saturates at a few hundred residents per
    TTL window. That bound must be logged loudly at plan build; bits=63
    (8-9-bit keys) must stay quiet."""
    import logging

    from pyspark.sql import functions as F

    from weatherdb_spark.streaming.neardup import stream_simhash_neardup

    src = (
        spark.readStream.format("rate").load()
        .select(
            F.col("value").alias("doc_id"),
            F.col("timestamp").alias("event_ts"),
            F.lit("hello saturation world").alias("text"),
        )
    )
    with caplog.at_level(logging.WARNING, "weatherdb_spark.streaming.neardup"):
        stream_simhash_neardup(src)
    assert any("saturates" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, "weatherdb_spark.streaming.neardup"):
        stream_simhash_neardup(src, bits=63)
    assert not any("saturates" in r.message for r in caplog.records)


def test_raster2points_cell_centers_and_nan_mask(spark):
    """raster2points (the reference utils/geometry.py:41-68 drop-in):
    non-NaN cells only, coordinates at cell centers, both the affine
    6-tuple and the (x0, y_top, cellsize) ESRI-ASCII spelling."""
    import math

    from weatherdb_spark.functions.spatial import raster2points

    grid = [[1.0, float("nan")], [3.0, 4.0]]
    # north-up grid: origin x0=100, top y=200, cellsize 10
    got = {
        (r.x, r.y): r.data
        for r in raster2points(spark, grid, (100.0, 200.0, 10.0)).collect()
    }
    assert got == {
        (105.0, 195.0): 1.0,   # row 0, col 0
        (105.0, 185.0): 3.0,   # row 1, col 0
        (115.0, 185.0): 4.0,   # row 1, col 1
    }
    # equivalent affine spelling gives the identical frame
    affine = (10.0, 0.0, 100.0, 0.0, -10.0, 200.0)
    got_affine = {
        (r.x, r.y): r.data
        for r in raster2points(spark, grid, affine).collect()
    }
    assert got_affine == got
    # single-band 3-D input (rasterio read shape) accepted like the reference
    got_3d = raster2points(spark, [grid], affine).count()
    assert got_3d == 3
    assert not any(math.isnan(v) for v in got.values())


def test_deterministic_sampling_semantics(spark):
    """Membership is a pure function of (id, salt): repartitioning never
    changes the kept set, re-weighting a stratum keeps a superset (no
    global resample), and distinct salts give different samples."""
    from pyspark.sql import functions as F

    from weatherdb_spark.llm.sampling import deterministic_sample, stratified_mix

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    kept = {r.doc_id for r in deterministic_sample(df, 0.3, salt="a").collect()}
    kept_re = {
        r.doc_id
        for r in deterministic_sample(df.repartition(13), 0.3, salt="a").collect()
    }
    assert kept == kept_re and 0.2 < len(kept) / 2000 < 0.4
    other_salt = {r.doc_id for r in deterministic_sample(df, 0.3, salt="b").collect()}
    assert other_salt != kept

    lo = {r.doc_id for r in stratified_mix(df, {"src0": 0.2}).collect()}
    hi = {r.doc_id for r in stratified_mix(df, {"src0": 0.6}).collect()}
    assert lo < hi  # monotone: re-weighting never resamples
    # unlisted strata drop entirely
    assert {r.source for r in stratified_mix(df, {"src1": 1.0}).collect()} == {"src1"}
    assert stratified_mix(df, {}).count() == 0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="fraction"):
        deterministic_sample(df, 1.5)
    with _pytest.raises(ValueError, match="stratum"):
        stratified_mix(df, {"src0": -0.1})


def test_ngram_contamination_catches_quoted_paragraph(spark):
    from weatherdb_spark.llm.dedup import exact_contamination, ngram_contamination

    ref_text = " ".join(f"e{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [
            # quotes a 13-word span of the eval doc inside novel text
            (1, "novel a b " + " ".join(f"e{i}" for i in range(13)) + " z y"),
            (2, "completely unrelated words " + " ".join(f"u{i}" for i in range(20))),
            (3, ref_text),  # byte-identical copy
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame([(100, ref_text)], "doc_id long, text string")
    flagged = {r.doc_id: r.n_collisions
               for r in ngram_contamination(corpus, ref, n=13).collect()}
    assert set(flagged) == {1, 3}          # the quote AND the copy, not doc 2
    assert flagged[1] == 1 and flagged[3] == 8
    # the exact layer alone misses the quoted paragraph
    assert {r.doc_id for r in exact_contamination(corpus, ref).collect()} == {3}
    # min_collisions raises the bar
    deep = ngram_contamination(corpus, ref, n=13, min_collisions=2)
    assert {r.doc_id for r in deep.collect()} == {3}


def test_ngram_contamination_broadcast_is_size_gated(spark):
    """The reference n-gram set broadcasts only under the gate: a
    multi-benchmark production reference (10^8-10^9 distinct 13-grams)
    must never be FORCED into driver memory. Both regimes return the
    same rows; below the gate the hint is present, above it absent."""
    from weatherdb_spark.llm.dedup import ngram_contamination

    ref_text = " ".join(f"e{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [(1, "x " + ref_text + " y"), (2, "unrelated words only here")],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame([(9, ref_text)], "doc_id long, text string")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    small = ngram_contamination(corpus, ref, n=13)          # auto-count
    big = ngram_contamination(corpus, ref, n=13, est_ref_ngrams=10**9)
    assert "BroadcastHashJoin" in plan(small)
    # above the gate the hash-key join is left to Catalyst/AQE: no
    # broadcast HINT in the logical plan (AQE may still pick one at
    # runtime from true sizes — that is the point of un-forcing it)
    assert "UnresolvedHint" not in big._jdf.queryExecution().logical().toString()
    assert "hints=[broadcast]" not in \
        big._jdf.queryExecution().optimizedPlan().toString()
    assert sorted(map(tuple, small.collect())) \
        == sorted(map(tuple, big.collect())) == [(1, 8)]
