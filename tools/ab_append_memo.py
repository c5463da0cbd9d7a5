#!/usr/bin/env python
"""Interleaved A/B: CorpusStore large-append wall with the r9 schema
memo ACTIVE vs BYPASSED (the pre-r9 read path).

Motivation: the two post-opt CORPUS_STRESS runs recorded
corpus_append_large at 51-61 s vs 34 s pre-opt. The only r9 change on
that path is the broker schema memo, which REMOVES inference jobs — a
slowdown from it is implausible, but this box's windows drift 1.5-4x,
so settle it the honest way: one process, alternating arms, fresh
disjoint batch per append against a growing archive (growth and any
weather hit both arms equally; batch-keyed cost is constant by design).

Arm "memo": the shipped `Broker.read` (schema memoized per snapshot).
Arm "plain": `broker._schema_memo_read` monkeypatched back to a bare
`spark.read.parquet` — byte-identical to the pre-r9 read path.

Usage: python tools/ab_append_memo.py [--base 1000000] [--batch 500000]
       [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=500_000)
    ap.add_argument("--iters", type=int, default=3, help="appends per arm")
    args = ap.parse_args()

    from tools.corpus_stress import _docs  # same deterministic generator
    from weatherdb_spark import broker as broker_mod
    from weatherdb_spark.llm.corpus import CorpusStore
    from weatherdb_spark.session import get_spark

    spark = get_spark(app_name="ab_append_memo")
    spark.sparkContext.setLogLevel("ERROR")

    total = args.base + 2 * args.iters * args.batch
    tmp = tempfile.mkdtemp(prefix="ab_append_memo_")
    try:
        # pre-materialize every slice so generation is never timed
        src = os.path.join(tmp, "docs")
        _docs(spark, total).write.parquet(src)
        docs = spark.read.parquet(src)

        # same store parameters as tools/corpus_stress.py — WITHOUT the
        # hot-bucket cap the stopword-heavy generator's band buckets go
        # quadratic at this batch size (first cut of this A/B OOM'd a
        # 16g heap exactly there)
        store = CorpusStore(spark, os.path.join(tmp, "wh"),
                            near_threshold=0.8, max_bucket_docs=32)
        store.append(docs.filter(F.col("doc_id") < args.base))

        real_read = broker_mod._schema_memo_read

        def plain_read(spark_, path):
            return spark_.read.parquet(path)

        def run(arm: str, lo: int) -> float:
            broker_mod._schema_memo_read = (
                real_read if arm == "memo" else plain_read
            )
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + args.batch)
            )
            spark.sparkContext.setJobDescription(f"ab_append_memo:{arm}")
            t0 = time.perf_counter()
            store.append(batch)
            dt = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            return dt

        a, b = [], []
        lo = args.base
        for _ in range(args.iters):
            a.append(run("memo", lo)); lo += args.batch
            b.append(run("plain", lo)); lo += args.batch
        broker_mod._schema_memo_read = real_read
        print(json.dumps({
            "metric": "ab_append_memo",
            "base": args.base, "batch": args.batch,
            "memo": {"runs": a, "min": min(a),
                     "median": statistics.median(a)},
            "plain": {"runs": b, "min": min(b),
                      "median": statistics.median(b)},
            "load_1min_end": round(os.getloadavg()[0], 2),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
