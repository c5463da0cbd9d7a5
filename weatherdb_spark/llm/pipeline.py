"""End-to-end training-corpus preparation as ONE declarative plan.

``prepare_training_corpus`` chains the pipeline a pretraining run
actually executes — quality gate, language gate, PII scrub, exact
dedup, per-source quota, sequence packing — as a single lazy DataFrame
composition: no materialization between stages, so Catalyst sees the
whole pipeline at once (filters collapse into the scan, the scrub
projection rides the same stage as the gates, and only the dedup /
quota / packing aggregates shuffle). This is the shape that matters at
100 TB: a stage-per-table pipeline writes the corpus to storage five
times; this plan writes it once, at the end.

Every stage is one of the module's oracle-checked operators, and the
composition itself has a chained-CTE DuckDB oracle (registry entry
``prepare_training_corpus``), so the END-TO-END result is
value-checked, not just the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prepare_training_corpus(
    docs: DataFrame,
    min_quality: float = 0.77,
    lang: str = "en",
    quota: int = 8,
    capacity: int = 256,
    salt: str = "prep",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    tokens=None,
) -> DataFrame:
    """Filter -> scrub -> dedup -> quota -> pack, one lazy plan.

    Returns the packed segment map over the surviving corpus:
    (id_col, source_col, n_tokens, tok_offset, seq_id, seg_start,
    seg_len) — feed it to :func:`~weatherdb_spark.llm.packing.
    write_training_shards` (or a loader) to materialize sequences.

    Stage order is semantic, not arbitrary: the scrub runs BEFORE
    dedup so two documents differing only in redacted PII dedup
    together; the quota ranks AFTER dedup so duplicate copies cannot
    occupy a source's budget; packing runs last over exactly the
    surviving stream.

    ``tokens`` swaps the PACKING tokenizer (the ``llm.text.tokens_expr``
    callable shape, e.g. ``arrow_regex_tokens``) — sequence boundaries
    then follow the model's real token counts; the heuristic quality /
    language gates keep the whitespace convention (they are statistical
    filters, not length accounting).
    """
    from weatherdb_spark.functions.caching import scoped_persist
    from weatherdb_spark.functions.partitioning import spread
    from weatherdb_spark.llm.dedup import exact_dedup
    from weatherdb_spark.llm.packing import pack_concat_chunk
    from weatherdb_spark.llm.sampling import source_quota_cap
    from weatherdb_spark.llm.text import lang_id, quality_score, scrub_pii

    # spread BEFORE the scoring/scrub chain: a small corpus file scans
    # as ONE partition, so the per-row regex work (quality + lang + the
    # 3-pass PII scrub) would run on one core — and the persisted frame
    # below is materialized CONCURRENTLY by several AQE query stages
    # (cache misses race, each recomputing the chain: profiled as six
    # parallel 2.3 s single-task jobs, the bulk of the bench entry).
    # spread() is a no-op when the scan already has enough splits.
    #
    # The quality taint below (+ 0.0 * rand) is load-bearing: predicate
    # pushdown substitutes the computed quality/lang_pred into the gate
    # filter and pushes the WHOLE scoring expression through spread's
    # exchange, back onto the single-task scan stage the spread exists
    # to escape (r10 plan audit: the gate sat under the Exchange as a
    # 1-task stage worth ~half the bench entry). A nondeterministic
    # no-op term in the quality projection trips the optimizer's
    # fields.forall(_.deterministic) pushdown guard while leaving every
    # value bit-identical: rand(seed) is in [0, 1), the product is
    # exactly +0.0, and x + 0.0 == x for every non-negative quality.
    # The term is pipeline-local — quality_score itself stays pushdown-
    # transparent for callers that WANT the gate at the scan.
    gated = (
        lang_id(quality_score(spread(docs, id_col), text_col), text_col)
        .withColumn("quality", F.col("quality") + F.lit(0.0) * F.rand(42))
        .filter(
            (F.col("quality") >= min_quality) & (F.col("lang_pred") == lang)
        )
    )
    # scoped_persist: the dedup / quota / packing stages each branch off
    # this frame from NON-identical subtrees, so exchange reuse cannot
    # collapse them — without the persist the scan + regex scoring +
    # 3-pass scrub (the expensive per-row work) would execute once per
    # branch. A cache_scope (stage / bench / CorpusStore) releases it.
    scrubbed = scoped_persist(
        scrub_pii(gated, text_col)
        .select(
            F.col(id_col),
            F.col(source_col),
            F.col("text_scrubbed").alias(text_col),
        )
    )
    kept = exact_dedup(scrubbed, id_col, text_col).filter("is_kept").select(id_col)
    deduped = scrubbed.join(kept, id_col)
    final_ids = source_quota_cap(
        deduped, quota, source_col, salt, id_col
    ).select(id_col)
    final = scoped_persist(deduped.join(final_ids, id_col))
    packed = pack_concat_chunk(final, capacity, id_col, text_col,
                               tokens=tokens)
    return packed.join(final.select(id_col, source_col), id_col).select(
        id_col, source_col, "n_tokens", "tok_offset", "seq_id",
        "seg_start", "seg_len",
    )
