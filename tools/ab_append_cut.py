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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pos = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--sf-dir":
            sf_dir = argv[i + 1]
            i += 2
        else:
            pos.append(argv[i])
            i += 1
    iters = int(pos[0]) if pos else 3

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

    # seed the archive past the EPOCH_PRUNE_MIN gate with tiny unique
    # batches (the corpus_append_bench recipe) so EVERY measured append
    # runs the same epoch-pruned verify plan — otherwise the gate flips
    # mid-run and lands on one arm first
    from weatherdb_spark.llm.corpus import DOCS_TABLE, EPOCH_PRUNE_MIN

    seed = 0
    while len(store._epoch_values(DOCS_TABLE) or ()) <= EPOCH_PRUNE_MIN:
        seed += 1
        store.append(base.filter(F.col("doc_id") < 200).select(
            (F.col("doc_id") - F.lit(seed * 1000 + 1000)).alias("doc_id"),
            F.concat_ws(f" seed{seed} ",
                        F.split(F.col("text"), " ")).alias("text"),
        ))

    def batch(k: int):
        return base.select(
            (F.col("doc_id") + F.lit(k * span)).alias("doc_id"),
            F.concat_ws(f" ab{k} ", F.split(F.col("text"), " "))
            .alias("text"),
        )

    # ABBA order: plain ABAB would hand the SECOND arm a systematically
    # larger archive every iteration (each append grows it by a batch),
    # biasing the comparison; alternating which arm goes first cancels
    # the growth to first order, and the per-iteration deltas (same
    # adjacent archive sizes) are reported alongside the aggregates.
    walls: dict[str, list[float]] = {"cut": [], "nocut": []}
    k = 0
    try:
        for it in range(iters):
            order = ("cut", "nocut") if it % 2 == 0 else ("nocut", "cut")
            for arm in order:
                k += 1
                corpus_mod._APPEND_PLAN_CUT = arm == "cut"
                t0 = time.monotonic()
                res = store.append(batch(k))
                walls[arm].append(round(time.monotonic() - t0, 3))
                assert res["admitted"] > 0, res
    finally:
        corpus_mod._APPEND_PLAN_CUT = True  # restore the shipped default

    print(json.dumps({
        "metric": "ab_append_plan_cut",
        "iters_per_arm": iters,
        "sf_dir": sf_dir,
        "walls": walls,
        "per_iteration_delta_nocut_minus_cut": [
            round(n - c, 3)
            for n, c in zip(walls["nocut"], walls["cut"])
        ],
        "min": {a: min(w) for a, w in walls.items()},
        "median": {a: round(statistics.median(w), 3)
                   for a, w in walls.items()},
        "load_1min": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
