#!/usr/bin/env python
"""One-line JSON corpus health report — the triage step before a
training run: what is in this corpus, how duplicated, how clean?

    python tools/corpus_report.py [docs.parquet|sf_dir]

Composes the llm text/dedup operators into a single pass per family:
doc/token counts per source, exact-duplicate rate, quality-score and
repetition distributions, language mix. Every number is a distributed
aggregate (the per-source table is dim-sized); nothing collects a
fact-sized frame to the driver.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    path = arg if arg.endswith(".parquet") else os.path.join(
        arg, "documents.parquet")

    from pyspark.sql import functions as F

    from weatherdb_spark.llm.dedup import exact_dedup
    from weatherdb_spark.llm.text import (
        lang_id,
        quality_score,
        repetition_stats,
        token_stats,
    )
    from weatherdb_spark.session import get_spark

    spark = get_spark(app_name="corpus_report")
    docs = spark.read.parquet(path)

    if docs.isEmpty():
        # an empty (or fully filtered) corpus is a report, not a crash
        print(json.dumps({"path": path, "docs": 0, "tokens": 0}))
        return

    enriched = quality_score(token_stats(docs))
    per_source = {
        r.source: {"docs": r.docs, "tokens": r.tokens,
                   "mean_quality": round(r.mq, 4)}
        for r in enriched.groupBy("source").agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens_ws").alias("tokens"),
            F.avg("quality").alias("mq"),
        ).collect()
    }
    totals = enriched.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens_ws").alias("tokens"),
        F.avg("quality").alias("mq"),
    ).first()

    dup = exact_dedup(docs).agg(
        (F.count(F.lit(1)) - F.sum(F.col("is_kept").cast("int"))).alias("dropped")
    ).first()

    rep = repetition_stats(docs).agg(
        F.avg(F.col("is_repetitive").cast("int")).alias("frac"),
        F.avg("dup_word_frac").alias("dw"),
    ).first()

    from weatherdb_spark.llm.text import compression_ratio

    comp = compression_ratio(docs).agg(
        F.avg("compression_ratio").alias("cr")
    ).first()

    langs = {
        r.lang_pred: r.c
        for r in lang_id(docs).groupBy("lang_pred").agg(
            F.count(F.lit(1)).alias("c")).collect()
    }

    print(json.dumps({
        "path": path,
        "docs": totals.docs,
        "tokens": totals.tokens,
        "mean_quality": round(totals.mq, 4),
        "exact_dup_rate": round(dup.dropped / totals.docs, 6),
        "repetitive_frac": round(rep.frac, 6),
        "mean_dup_word_frac": round(rep.dw, 6),
        "mean_compression_ratio": round(comp.cr, 6) if comp.cr is not None else None,
        "langs": langs,
        "sources": per_source,
    }))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
