#!/usr/bin/env python
"""Interleaved A/B at REAL scale (2M vectors) for cosine_pairs_lsh's
payload placement: the shipped form carries (vector, norm, signature)
through the (table, bucket) self-join; the candidate variant explodes
only (id, signature), dedups candidates first-match as before, and
joins the (vector, norm) payload back onto the deduped pair stream —
guide §8's "shuffle keys, move payloads once".

The r6 A/B rejected the id-fetch form at sf0.1 (2k vectors: two extra
joins cost more than the wider exchange); OPTIMIZATION_r09.md's "Not
yet optimized" #2 says the call needs a larger-than-sf0.1 harness to
decide honestly. This is that harness: same generator and LSH
parameters as tools/corpus_stress.py's semantic_dedup stage, arms
alternated per iteration in ONE process, outputs asserted identical
(count + order-insensitive hash) before any timing is trusted.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def idfetch_pairs(embeddings, threshold, planes, dim, n_tables,
                  id_col, vec_col, max_bucket_docs):
    """The candidate arm: ids+signature through the bucket join,
    vector/norm fetched once per surviving pair. Pair semantics are
    bit-identical to cosine_pairs_lsh: same base frame (same persisted
    signature/norm computation), same cap, same first-match dedup, same
    rounded-cos filter."""
    from weatherdb_spark.functions.caching import scoped_persist
    from weatherdb_spark.functions.partitioning import spread
    from weatherdb_spark.llm.bucketing import cap_bucket_residents
    from weatherdb_spark.llm.similarity import (
        _dot,
        _with_bucket_signature,
    )

    b = spread(embeddings).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    base = scoped_persist(
        _with_bucket_signature(b, "_v", planes, n_tables, dim)
        .withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    )
    bucketed = base.select(
        "_id", "_sig",
        F.posexplode(F.col("_sig")).alias("_table", "_bucket"),
    )
    lhs = bucketed.select(
        "_table", "_bucket", F.col("_id").alias("id_a"),
        F.col("_sig").alias("_sa"))
    lhs = cap_bucket_residents(
        lhs, ["_table", "_bucket"], "id_a", max_bucket_docs)
    rhs = bucketed.select(
        "_table", "_bucket", F.col("_id").alias("id_b"),
        F.col("_sig").alias("_sb"))
    first_match = F.array_position(
        F.zip_with(F.col("_sa"), F.col("_sb"), lambda a, bb: a == bb),
        True,
    )
    cand = (
        lhs.join(rhs, ["_table", "_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(first_match == F.col("_table") + 1)
        .select("id_a", "id_b")
    )
    va = base.select(F.col("_id").alias("id_a"),
                     F.col("_v").alias("_va"),
                     F.col("_norm").alias("_na"))
    vb = base.select(F.col("_id").alias("id_b"),
                     F.col("_v").alias("_vb"),
                     F.col("_norm").alias("_nb"))
    cos = F.try_divide(
        _dot(F.col("_va"), F.col("_vb")), F.col("_na") * F.col("_nb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cos", F.round(cos, 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=2_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--planes", type=int, default=16)
    ap.add_argument("--tables", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--flip", action="store_true",
                    help="start with the idfetch arm (order control)")
    args = ap.parse_args()

    from tools.corpus_stress import _embeddings  # same generator
    from weatherdb_spark.functions.caching import cache_scope
    from weatherdb_spark.llm.similarity import cosine_pairs_lsh
    from weatherdb_spark.session import get_spark

    spark = get_spark(app_name="ab_lsh_fetch")
    work = tempfile.mkdtemp(prefix="ab_lsh_")
    path = os.path.join(work, "emb")
    _embeddings(spark, args.vectors, args.dim).write.parquet(path)
    emb = spark.read.parquet(path)
    kw = dict(threshold=args.threshold, planes=args.planes,
              dim=args.dim, n_tables=args.tables,
              id_col="vec_id", vec_col="embedding",
              max_bucket_docs=args.cap)

    def run(arm):
        t0 = time.perf_counter()
        with cache_scope():
            df = (cosine_pairs_lsh(emb, **kw) if arm == "ship"
                  else idfetch_pairs(emb, **kw))
            row = df.withColumn(
                "_h", F.xxhash64("id_a", "id_b",
                                 (F.col("cos") * 1e6).cast("long"))
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(_h)").alias("h"),
            ).first()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return round(dt, 2), (row["n"], row["h"])

    res = {"ship": [], "idfetch": []}
    sig = {}
    for it in range(args.iters):
        first_ship = (it % 2 == 0) != args.flip
        order = ("ship", "idfetch") if first_ship else ("idfetch", "ship")
        for arm in order:
            dt, s = run(arm)
            res[arm].append(dt)
            sig.setdefault(arm, s)
            assert sig[arm] == s, f"{arm} nondeterministic: {sig[arm]} vs {s}"
            print(f"iter{it} {arm}: {dt}s rows={s[0]}", flush=True)
    assert sig["ship"] == sig["idfetch"], (
        f"ARMS DISAGREE: {sig['ship']} vs {sig['idfetch']}")
    print("outputs identical:", sig["ship"])
    for arm, r in res.items():
        print(f"{arm}: {r} min={min(r)} median={sorted(r)[len(r) // 2]}")


if __name__ == "__main__":
    main()
