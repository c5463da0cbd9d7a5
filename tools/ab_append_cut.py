#!/usr/bin/env python
"""Interleaved A/B of the CorpusStore append plan cut (r9).

The r9 append re-roots the dedup anti-join chain on a parquet scratch
roundtrip before the archive checks (``corpus._APPEND_PLAN_CUT``). The
cut is load-bearing for ``collapse_batch=True`` (the analyzed plan
grows 2^stages and OOMs the driver), but on the DEFAULT path it trades
one batch-linear write+read against Catalyst re-analyzing — and the
executor re-running — the whole spine once per archive-leg consumer.
This harness settles which way that trade goes the repo's standard way:
alternating A (cut) / B (no cut) appends against the SAME live archive
in one process, so sandbox weather hits both arms equally.

Each iteration appends a unique, mostly-admitting batch (the documents
table shifted and re-worded per iteration, the corpus_append_bench
recipe), so every arm pays the same verify + write work and the archive
grows identically regardless of arm order.

Usage: python tools/ab_append_cut.py [iters_per_arm] [--sf-dir DIR]
Prints one JSON line: per-arm walls, min/median, and the host load.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

# runnable as `python tools/ab_append_cut.py` (sys.path[0] is tools/)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = int(args[0]) if args else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for i, a in enumerate(sys.argv):
        if a == "--sf-dir":
            sf_dir = sys.argv[i + 1]

    from pyspark.sql import functions as F

    from weatherdb_spark.llm import corpus as corpus_mod
    from weatherdb_spark.llm.corpus import CorpusStore
    from weatherdb_spark.session import get_spark
    from weatherdb_spark.sources.testdata import load

    spark = get_spark(app_name="ab_append_cut")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="wdb_ab_append_cut_")
    store = CorpusStore(spark, os.path.join(tmp, "wh"))
    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    store.append(base)  # the archive every measured append dedups against
    span = (base.agg(F.max("doc_id")).first()[0] or 0) + 1

    def batch(k: int):
        return base.select(
            (F.col("doc_id") + F.lit(k * span)).alias("doc_id"),
            F.concat_ws(f" ab{k} ", F.split(F.col("text"), " "))
            .alias("text"),
        )

    walls: dict[str, list[float]] = {"cut": [], "nocut": []}
    k = 0
    for _ in range(iters):
        for arm in ("cut", "nocut"):
            k += 1
            corpus_mod._APPEND_PLAN_CUT = arm == "cut"
            t0 = time.monotonic()
            res = store.append(batch(k))
            walls[arm].append(round(time.monotonic() - t0, 3))
            assert res["admitted"] > 0, res
    corpus_mod._APPEND_PLAN_CUT = True  # restore the shipped default

    print(json.dumps({
        "metric": "ab_append_plan_cut",
        "iters_per_arm": iters,
        "sf_dir": sf_dir,
        "walls": walls,
        "min": {a: min(w) for a, w in walls.items()},
        "median": {a: round(statistics.median(w), 3)
                   for a, w in walls.items()},
        "load_1min": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
