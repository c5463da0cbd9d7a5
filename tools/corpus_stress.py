#!/usr/bin/env python
"""LLM-corpus stress: synthesize a >= 10M-document corpus (plus a
multi-million-vector embedding table) and time the training-data
pipeline's headline compositions end-to-end. Prints ONE JSON line so
rounds can diff it (the ``pipeline_stress.py`` twin for the LLM family,
whose 100x claims otherwise rest on sf<=0.1 slopes).

Usage::

    python tools/corpus_stress.py [--docs 10000000] [--vectors 2000000]

Stages timed (each against data pre-materialized to parquet, so the
timing is the operator, not the generator):

- ``prepare_training_corpus`` over the full corpus (gates + scrub +
  exact dedup + quota + packing, one lazy plan) — noop-written.
- ``semantic_dedup`` over the embedding table. NOTE the parameters
  scale with the corpus: at 2M vectors the sf0.1 default of planes=3
  (8 buckets/table) would make every bucket ~250k residents and the
  candidate join quadratic — the stress runs planes=16 (65k buckets/
  table) with ``max_bucket_docs`` engaged, which is exactly how the
  operator's docstring says to deploy it at scale.
- Three ``CorpusStore`` appends: a large first batch against an empty
  archive, a SMALL second batch against the now-large archive, and a
  TINY third. With the epoch-partitioned layout and the persisted
  signature index an append's cost tracks its batch (band-key joins
  against STORED keys, write = one epoch leaf + hard links), not the
  archive size — the tiny append shows the fixed-overhead floor, and
  a regression back to O(archive) per append (the shape the first
  stress run caught: a 50k append costing a 500k one) is visible in
  the spread of the three numbers.

Data is deterministic (pure column arithmetic, no RNG): ~5% exact
duplicate docs, ~10% German docs (language gate), ~5% punctuation soup
(quality gate), ~9% PII-bearing docs (scrub), embedding clusters of 4
near-identical vectors (semantic groups).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from weatherdb_spark.session import get_spark  # noqa: E402

# stopword-heavy vocab: most docs pass the en language + quality gates
VOCAB = (
    ["the", "a", "of", "and", "to", "in", "is", "it"] * 3
    + [f"word{j}" for j in range(96)]
)


def _docs(spark, n):
    """Deterministic corpus: (doc_id, text, source)."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    # every 20th doc duplicates its predecessor's text (exact-dup load)
    key = F.when(F.col("doc_id") % 20 == 19, F.col("doc_id") - 1).otherwise(
        F.col("doc_id")
    )
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    n_words = 12 + (key % 8)
    # xxhash64(key, i): a LINEAR mix (key*a + i*b) % V aliases every
    # key pair congruent mod V/gcd into IDENTICAL word streams — the
    # first cut of this generator near-dup-rejected 88% of the corpus
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(key, i), F.lit(len(VOCAB))) + 1).cast("int"),
        ),
    )
    normal = F.concat(
        F.array_join(words, " "), F.lit(" u"), key.cast("string")
    )
    pii = F.concat(normal, F.lit(" mail u"), key.cast("string"),
                   F.lit("@x.example"))
    german = F.concat(
        F.lit("der die das und ist ein zu den der die das und x"),
        key.cast("string"),
    )
    soup = F.concat(F.lit(";;; ??? !!! ### $$$ %%% ^^^ &&& ::: y"),
                    key.cast("string"))
    text = (
        F.when(key % 10 == 3, german)
        .when(key % 20 == 7, soup)
        .when(key % 11 == 5, pii)
        .otherwise(normal)
    )
    return base.select(
        "doc_id",
        text.alias("text"),
        F.concat(F.lit("s"), (F.col("doc_id") % 5).cast("string")).alias("source"),
    )


def _embeddings(spark, n, dim):
    """Deterministic clustered embeddings: groups of 4 near-identical
    vectors (the semantic-dup shape), (vec_id, embedding).

    Components mix with xxhash64(group, i) — the SAME lesson _docs
    already records: a linear mix ((group*a + i*b) % M) aliases every
    group pair congruent mod M/stride into near-identical vectors. The
    first form of this generator did exactly that, which stayed
    invisible while the semantic_dedup lap hashed these 32-dim vectors
    with 64-dim hyperplanes (NULL buckets, zero candidates — the r9 dim
    fix) and then surfaced as a 142M-pair / avg-degree-142 graph, 47x
    the clustered shape this generator documents. With the hash mix,
    cross-group cosines concentrate near 0 (|cos| ~ 1/sqrt(dim)) and
    the pair set is the intended ~6 pairs per 4-vector group."""
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    g = F.col("vec_id") / 4  # floor via integer division below
    group = F.floor(g).cast("long")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (F.pmod(F.xxhash64(group, i), F.lit(2000)) / 1000.0 - 1.0)
            + ((F.col("vec_id") * 31 + i * 7) % 100) / 5000.0
        ).cast("float"),
    )
    return base.select("vec_id", emb.alias("embedding"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--vectors", type=int, default=2_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--planes", type=int, default=16)
    ap.add_argument("--tables", type=int, default=8)
    ap.add_argument("--append1", type=int, default=1_000_000)
    ap.add_argument("--append2", type=int, default=50_000)
    ap.add_argument("--append3", type=int, default=5_000)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    load_start = os.getloadavg()
    spark = get_spark(app_name="corpus_stress")
    work = tempfile.mkdtemp(prefix="wdb_corpus_stress_")
    stages: dict[str, float] = {}

    def lap(name, fn):
        t0 = time.perf_counter()
        out = fn()
        stages[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {stages[name]}s", file=sys.stderr, flush=True)
        return out

    try:
        # ---- generation (timed separately; stages read the parquet)
        lap("gen_docs", lambda: _docs(spark, args.docs)
            .write.mode("overwrite").parquet(os.path.join(work, "docs")))
        lap("gen_embeddings", lambda: _embeddings(
            spark, args.vectors, args.dim)
            .write.mode("overwrite").parquet(os.path.join(work, "emb")))
        docs = spark.read.parquet(os.path.join(work, "docs"))
        emb = spark.read.parquet(os.path.join(work, "emb"))

        # ---- prepare_training_corpus: the five-stage lazy plan
        from weatherdb_spark.functions.caching import cache_scope
        from weatherdb_spark.llm.corpus import CorpusStore
        from weatherdb_spark.llm.pipeline import prepare_training_corpus
        from weatherdb_spark.llm.similarity import semantic_dedup

        def _prepare():
            with cache_scope():
                prepare_training_corpus(
                    docs, min_quality=0.5, lang="en", quota=args.docs,
                    capacity=2048,
                ).write.format("noop").mode("overwrite").save()

        lap("prepare_training_corpus", _prepare)

        # ---- semantic_dedup at scale-appropriate LSH parameters
        def _semdedup():
            with cache_scope():
                # dim MUST match the generated vectors: before r9 this
                # lap omitted it, the (then implicit) dim=64 hyperplanes
                # NULLed every bucket key of the 32-dim vectors, and the
                # stage benched a ZERO-candidate pipeline (the signature
                # pass ran, the verify/components ran on empty frames;
                # since r10 that mismatch raises instead). With dims
                # matched, the PRE-fix aliased linear-mix generator
                # yielded a 142.3M-pair graph; the fixed _embeddings in
                # this file yields 240,968 verified pairs at these
                # parameters (see its docstring) — numbers before/after
                # either fix are not comparable.
                semantic_dedup(
                    emb, threshold=0.85, planes=args.planes,
                    n_tables=args.tables, max_bucket_docs=64,
                    dim=args.dim,
                ).write.format("noop").mode("overwrite").save()

        lap("semantic_dedup", _semdedup)

        # ---- CorpusStore: big first append, small second append
        store = CorpusStore(spark, os.path.join(work, "wh"),
                            near_threshold=0.8, max_bucket_docs=32)
        lo2 = args.append1
        lo3 = args.append1 + args.append2
        b1 = docs.filter(F.col("doc_id") < args.append1)
        b2 = docs.filter((F.col("doc_id") >= lo2) & (F.col("doc_id") < lo3))
        b3 = docs.filter(
            (F.col("doc_id") >= lo3) & (F.col("doc_id") < lo3 + args.append3)
        )
        r1 = lap("corpus_append_large", lambda: store.append(b1))
        r2 = lap("corpus_append_small", lambda: store.append(b2))
        r3 = lap("corpus_append_tiny", lambda: store.append(b3))
        print(f"  append1={r1} append2={r2} append3={r3}",
              file=sys.stderr, flush=True)

        # ---- IVF serving index: build on 90% of the vectors, then a
        # 10% MVCC merge-append (r8: write_partition_merge — new files
        # per touched cell + hard-linked history + atomic flip). The
        # append must track its BATCH, not the index: a regression to
        # an O(index) rewrite shows as append ~ build here.
        from weatherdb_spark.llm.similarity import (
            append_to_ivf_index,
            build_ivf_index,
            ivf_cell_stats,
        )

        cut = args.vectors - args.vectors // 10
        idx = os.path.join(work, "ivf")
        lap("ivf_build", lambda: build_ivf_index(
            emb.filter(F.col("vec_id") < cut), idx, n_cells=64))
        lap("ivf_append_10pct", lambda: append_to_ivf_index(
            spark, idx, emb.filter(F.col("vec_id") >= cut)))
        n_indexed = lap(
            "ivf_cell_stats",
            lambda: ivf_cell_stats(spark, idx)
            .agg(F.sum("n_vectors")).first()[0],
        )
        assert n_indexed == args.vectors, (
            f"IVF index lost rows: {n_indexed} != {args.vectors}"
        )

        print(json.dumps({
            "metric": "corpus_stress_wall",
            "value": round(sum(stages.values()), 2),
            "unit": "sec",
            "docs": args.docs,
            "vectors": args.vectors,
            "dim": args.dim,
            "planes": args.planes,
            "n_tables": args.tables,
            "append1": {"batch": args.append1, **r1},
            "append2": {"batch": args.append2, **r2},
            "append3": {"batch": args.append3, **r3},
            "stages": stages,
            "load_1min_start": round(load_start[0], 2),
            "load_5min_start": round(load_start[1], 2),
            "load_1min_end": round(os.getloadavg()[0], 2),
            "load_5min_end": round(os.getloadavg()[1], 2),
        }))
        sys.stdout.flush()
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
