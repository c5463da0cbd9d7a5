"""Property-based equivalence for the round-5 rewrites.

merge_upsert (sinks/merge.py), hole_census (operators/aggregate.py) and
the stateful streaming run-flagger (streaming/stateful.py) were all
reworked for NULL-handling / bound-intersection / window semantics; each
had only example-based pins. These tests pit them against independent
pure-Python implementations of the reference semantics
(StationBases.py:525-587 upsert, StationBases.py:1981-2029 hole census,
StationP.py:145-166 consecutive-run rule) on randomized fixtures.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ------------------------------------------------------------ merge_upsert

_val = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
_key = st.one_of(st.none(), st.integers(min_value=0, max_value=6))


def _keyed_rows():
    # dict keyed by the (nullable) merge key -> unique keys per side,
    # the documented contract of a keyed upsert
    return st.dictionaries(_key, st.tuples(_val, _val), max_size=8)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_keyed_rows(), _keyed_rows())
def test_merge_upsert_matches_dict_upsert(spark, current, updates):
    from weatherdb_spark.sinks.merge import merge_upsert

    schema = "k int, a int, b int"
    cur_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in current.items()], schema
    )
    upd_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in updates.items()], schema
    )
    got = {
        r["k"]: (r["a"], r["b"], r["_merge_action"])
        for r in merge_upsert(cur_df, upd_df, ["k"]).collect()
    }

    expected = {}
    for k, v in current.items():
        if k in updates:
            action = "keep" if updates[k] == v else "update"
            expected[k] = (*updates[k], action)
        else:
            expected[k] = (*v, "keep")
    for k, v in updates.items():
        if k not in current:
            expected[k] = (*v, "insert")
    assert got == expected


# ------------------------------------------------------------ hole_census

# whole seconds: hole_census diffs via unix_timestamp (second
# resolution) and period bounds round-trip through second-format strings
_ts = st.datetimes(
    min_value=dt.datetime(2019, 1, 1), max_value=dt.datetime(2025, 12, 31)
).map(lambda d: d.replace(microsecond=0))


def _brute_hole_counts(obs, lo, hi, thresholds):
    """Crop, add the given bounds as sentinel observations, count
    consecutive-diff gaps >= each threshold."""
    stream = [t for t in obs if (lo is None or t >= lo) and (hi is None or t <= hi)]
    if not stream:
        return None  # station drops out entirely (no rows to group)
    stream += [b for b in (lo, hi) if b is not None]
    stream.sort()
    gaps = [
        (b - a).total_seconds() for a, b in zip(stream, stream[1:])
    ]
    return tuple(sum(1 for g in gaps if g >= th) for th in thresholds)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.dictionaries(
        st.integers(min_value=1, max_value=3),
        st.lists(_ts, min_size=1, max_size=12),
        min_size=1, max_size=3,
    ),
    st.one_of(st.none(), st.tuples(st.one_of(st.none(), _ts),
                                   st.one_of(st.none(), _ts))),
)
def test_hole_census_matches_brute_scan(spark, per_station, period):
    from weatherdb_spark.operators.aggregate import hole_census

    thresholds = ("2 weeks", "30 days")
    secs = (14 * 604800 // 7, 30 * 86400)
    rows = [
        (sid, ts, 1.0) for sid, obs in per_station.items() for ts in obs
    ]
    df = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double"
    )
    got = {
        r["station_id"]: (r["holes_ge_2_weeks"], r["holes_ge_30_days"])
        for r in hole_census(
            df, gap_thresholds=thresholds,
            period=tuple(
                b.strftime("%Y-%m-%d %H:%M:%S") if b is not None else None
                for b in period
            ) if period is not None else None,
        ).collect()
    }

    lo, hi = period if period is not None else (None, None)
    expected = {}
    for sid, obs in per_station.items():
        counts = _brute_hole_counts(obs, lo, hi, secs)
        if counts is not None:
            expected[sid] = counts
    assert got == expected


# ---------------------------------------------- stateful streaming run rule

def _python_run_flags(rows, consec_min=0.1, run_len=3):
    """The batch rule as a direct sliding-window scan: every window of
    ``run_len`` equal values > consec_min whose HEAD row has a non-NULL
    qn != 3 flags all its members (StationP.py:145-166)."""
    flagged = set()
    by_station = {}
    for sid, ts, raw, qn in rows:
        by_station.setdefault(sid, []).append((ts, raw, qn))
    for sid, srows in by_station.items():
        srows.sort()
        window = []
        for ts, raw, qn in srows:
            if (
                len(window) == run_len - 1
                and raw is not None
                and raw > consec_min
                and all(w_raw == raw for _, w_raw, _ in window)
                and window[0][2] is not None
                and window[0][2] != 3
            ):
                flagged.update((sid, t) for t, _, _ in window)
                flagged.add((sid, ts))
            window.append((ts, raw, qn))
            window = window[-(run_len - 1):]
    return flagged


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stream_flags_match_python_rule_random(spark, tmp_path, seed):
    """Randomized in-order rows split across 3 micro-batches (file-source
    maxFilesPerTrigger=1): the stream's flagged set must equal the
    sliding-window batch rule — runs straddling batch boundaries
    included, each member emitted exactly once."""
    import os
    import random

    import pandas as pd

    from weatherdb_spark.streaming.stateful import consec_run_flags

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for sid in (1, 2):
        for i in range(24):
            rows.append((
                sid,
                base + dt.timedelta(minutes=10 * i),
                rng.choice([None, 0.0, 0.5, 0.5, 0.5, 0.7]),
                rng.choice([None, 1.0, 3.0]),
            ))
    rows.sort(key=lambda r: (r[1], r[0]))  # global time order

    src = tmp_path / "src"
    src.mkdir()
    n = len(rows)
    for part, chunk in enumerate(
        (rows[: n // 3], rows[n // 3: 2 * n // 3], rows[2 * n // 3:])
    ):
        p = src / f"{part}.csv"
        pd.DataFrame(
            chunk, columns=["station_id", "timestamp", "raw", "qn"]
        ).to_csv(p, index=False)
        # file source processes in mtime order: pin arrival = time order
        os.utime(p, (1_700_000_000 + part, 1_700_000_000 + part))

    stream = (
        spark.readStream.schema(
            "station_id int, timestamp timestamp, raw double, qn double"
        )
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        consec_run_flags(stream)
        .writeStream.format("memory").queryName(f"prop_flags_{seed}")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination()
    out = spark.sql(f"SELECT * FROM prop_flags_{seed}").collect()
    got = {(r["station_id"], r["timestamp"]) for r in out}
    assert len(out) == len(got)  # exactly-once per member
    assert got == _python_run_flags(rows)


@pytest.mark.parametrize("seed", [0, 1])
def test_stream_simhash_pairs_match_batch_join_random(spark, tmp_path, seed):
    """Randomized docs split across 3 micro-batches: the streaming
    SimHash pair set (dropDuplicates over blocks) must equal the batch
    multi-index join's pair set — pairs straddling batch boundaries
    included. Bucket caps are sized above the corpus so the comparison
    is exact."""
    import os
    import random

    import pandas as pd

    from weatherdb_spark.llm.dedup import simhash_pairs_exact
    from weatherdb_spark.streaming.neardup import stream_simhash_neardup

    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = []
    for i in range(12):
        if i >= 6 and rng.random() < 0.5:
            # near-duplicate of an earlier doc: one word changed
            base = list(texts[rng.randrange(len(texts))].split())
            base[rng.randrange(len(base))] = rng.choice(words)
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(rng.choice(words) for _ in range(10)))
    base_ts = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (i + 1, texts[i], base_ts + dt.timedelta(minutes=i))
        for i in range(len(texts))
    ]

    src = tmp_path / "docs"
    src.mkdir()
    n = len(rows)
    for part, chunk in enumerate(
        (rows[: n // 3], rows[n // 3: 2 * n // 3], rows[2 * n // 3:])
    ):
        p = src / f"{part}.csv"
        pd.DataFrame(chunk, columns=["doc_id", "text", "event_ts"]).to_csv(
            p, index=False
        )
        os.utime(p, (1_700_000_000 + part, 1_700_000_000 + part))

    stream = (
        spark.readStream.schema("doc_id long, text string, event_ts timestamp")
        .option("header", "true").option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        stream_simhash_neardup(stream, max_hamming=6, bits=32,
                               max_bucket_docs=64)
        .writeStream.format("memory").queryName(f"prop_simhash_{seed}")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination()
    streamed = {
        (r["id_a"], r["id_b"])
        for r in spark.sql(f"SELECT * FROM prop_simhash_{seed}")
        .dropDuplicates(["id_a", "id_b"]).collect()
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    batch = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in simhash_pairs_exact(docs, max_hamming=6, bits=32).collect()
    }
    # stream emits (earlier, newer) = (smaller id, larger id) here since
    # arrival order is id order
    assert streamed == batch
