"""Lexical search: BM25 top-k retrieval over the corpus — the keyword
complement to the embedding ANN family (``llm/similarity.py``), used by
training pipelines for eval-set mining, hard-negative selection, and
targeted corpus slicing.

Shape (100 TB): the per-(doc, word) term-frequency table is the
inverted index — one explode + hash aggregate over the corpus; query
terms are dim-sized and broadcast onto it, so scoring touches only
postings of queried words (Catalyst pushes the semi-join into the
scan side of the aggregate). Per-query top-k ranks inside
query-partitioned windows (bounded by the candidate postings, never
the corpus).

Cross-engine exactness: each term's BM25 contribution is quantized to
integer micro-units BEFORE the per-(query, doc) sum — identical to the
``unigram_logprob`` discipline — so aggregation order cannot flip a
rank between Spark and the DuckDB oracle.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

logger = logging.getLogger(__name__)


#: default degenerate-term gate: a query term present in more than this
#: share of documents is dropped before the candidate join (see
#: :func:`bm25_topk`). At 0.5 the dropped terms have idf <= ln(2) while
#: a corpus-ubiquitous stopword (df ~ N) has idf ~ 0 — noise that would
#: otherwise pull a corpus-sized posting list into one query's window.
MAX_DF_SHARE = 0.5

#: persist the shared tf/stats frames only when the corpus scan has at
#: least this many input splits (~0.5 GB at the default 128 MB split):
#: below it the cache materialization barrier costs more than the
#: corpus-token pass it saves (interleaved sf0.1 A/B: 2.61 s vs 1.72 s
#: min), above it each avoided re-pass saves a full corpus scan. A
#: derived (already-shuffled) docs frame probes as adaptive -> treated
#: as small; callers feeding a large derived corpus should persist it
#: themselves.
BM25_PERSIST_MIN_PARTS = 4

# the activation warning fires once per process, not once per call: a
# serving path scoring one query per call would otherwise flood the log
# with an unchanged message (real drops are quantified on demand with
# bm25_dropped_terms)
_GATE_LOGGED = False


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    max_df_share: float | None = MAX_DF_SHARE,
    tokens=None,
) -> DataFrame:
    """Top-``k`` documents per query under BM25 (Okapi, distinct query
    terms): ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
    ``tfn = tf (k1+1) / (tf + k1 (1 - b + b dl/avgdl))``. Ties break on
    ascending doc id. Returns (query_id, rank, id_col, score_bm25);
    documents sharing no term with the query never appear.

    ``max_df_share`` (default :data:`MAX_DF_SHARE`) drops query terms
    whose document frequency exceeds that share of the corpus BEFORE
    the candidate join — the degenerate-term guard: a corpus-ubiquitous
    word (df ~ N, idf ~ 0) in a query would otherwise pull its
    corpus-sized posting list through the join and into that ONE
    query's window partition (fact-sized skew at corpus scale) while
    contributing near-zero score to every candidate. The drop is a
    filter on the query-vocabulary-sized df dim, so the postings of a
    dropped term never reach the scoring shuffle. Pass ``None`` to
    disable. A query ALL of whose terms are dropped returns no rows —
    it matched nothing distinctive.

    ``tokens`` swaps the tokenizer for BOTH the corpus and the query
    side (a col -> array<string> Column callable, the
    ``llm.text.tokens_expr`` shape; e.g. the Arrow-backed
    ``llm.text.arrow_regex_tokens``) — term matching stays consistent
    because one callable produces every token stream.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if max_df_share is not None and not 0 < max_df_share <= 1:
        raise ValueError(
            f"max_df_share must be in (0, 1] or None, got {max_df_share}"
        )
    from weatherdb_spark.llm.text import tokens_expr

    tok = tokens if tokens is not None else tokens_expr
    words = tok(text_col)
    toks = docs.select(F.col(id_col), F.explode(words).alias("_w"),
                       F.size(words).alias("_dl"))
    # The tf and stats frames below each feed 2-3 consumers; without a
    # persist every consumer re-runs the corpus scan + tokenize +
    # aggregate behind them — 2-3 full corpus-token passes per query at
    # scale. At sf0.1 the persist itself LOSES (interleaved A/B:
    # 2.61 s vs 1.72 s min — cache materialization barriers cost more
    # than the ~0.1 s corpus pass they save), so it is gated on the
    # scan's split count: a corpus wide enough to have
    # BM25_PERSIST_MIN_PARTS input splits (~0.5 GB at default split
    # size) pays for one cached pass many times over, a toy corpus
    # recomputes. Free probe (no job — reads the cached physical plan).
    from weatherdb_spark.functions.caching import scoped_persist
    from weatherdb_spark.functions.partitioning import _plan_num_partitions

    big_corpus = (_plan_num_partitions(docs) or 0) >= BM25_PERSIST_MIN_PARTS
    maybe_persist = scoped_persist if big_corpus else (lambda df: df)

    stats = maybe_persist(docs.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.size(words)).alias("_sumdl"),
    ))
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(
            tok(query_col))).alias("_w"),
    ).distinct()
    # the query-word semi-join lands BELOW the term-frequency aggregate
    # (Catalyst cannot push a join under a groupBy on its own): the
    # (doc, word) shuffle carries only queried words' tokens, so its
    # size is postings-of-query-terms, never corpus-vocabulary x docs.
    # Per-word document frequency is exact on the filtered stream (it
    # still holds every posting of those words) and the df dim is
    # query-vocabulary-sized.
    tf = (
        toks.join(F.broadcast(qterms.select("_w").distinct()), "_w")
        .groupBy(id_col, "_w")
        .agg(F.count(F.lit(1)).alias("_tf"), F.min("_dl").alias("_dl"))
    )
    # persisted (big corpora only — see the gate above): BOTH consumers
    # below (the per-word document-frequency dim and the scoring join)
    # otherwise re-run the corpus tokenize + explode + semi-join + tf
    # aggregate — a full corpus-token pass each. The frame is
    # postings-of-query-terms sized (bounded by the query vocabulary),
    # never corpus-vocabulary x docs.
    tf = maybe_persist(tf)
    postings = tf
    dfreq = postings.groupBy("_w").agg(F.count(F.lit(1)).alias("_df"))
    if max_df_share is not None:
        # NO SILENT CAPS (the cap_bucket_residents precedent): the gate
        # is declarative — which terms fall is decided executor-side at
        # action time — so the activation is logged (once per process)
        # with the quantifying companion named, instead of a query
        # silently returning fewer (or zero) rows.
        global _GATE_LOGGED
        if not _GATE_LOGGED:
            _GATE_LOGGED = True
            logger.warning(
                "BM25 degenerate-term gate active: query terms present "
                "in more than %.0f%% of documents are dropped before "
                "scoring (a query whose EVERY term exceeds the share "
                "returns no rows). Quantify with "
                "llm.search.bm25_dropped_terms at the same parameters, "
                "or pass max_df_share=None to disable. (Logged once per "
                "process.)",
                max_df_share * 100,
            )
        # the guard lives on the query-vocabulary-sized df dim: the
        # scoring join below is INNER on the broadcast dfreq, so a
        # dropped term's postings are filtered map-side before the
        # (query, doc) aggregate and the per-query rank window — the
        # candidate stream stays bounded by the kept terms' df.
        dfreq = (
            dfreq.join(F.broadcast(stats))
            .filter(F.col("_df") <= max_df_share * F.col("_n"))
            .select("_w", "_df")
        )
    avgdl = F.col("_sumdl") / F.col("_n")
    idf = F.log(
        F.lit(1.0) + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    tfn = (F.col("_tf") * (k1 + 1)) / (
        F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / avgdl)
    )
    term_micro = F.round(idf * tfn * 1e6, 0).cast("bigint")
    scored = (
        postings.join(F.broadcast(qterms), "_w")
        .join(F.broadcast(dfreq), "_w")
        .join(F.broadcast(stats))
        .select(query_id_col, id_col, term_micro.alias("_m"))
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_m").alias("_sm"))
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy(query_id_col).orderBy(F.desc("_sm"), F.col(id_col))
        ),
    ).filter(F.col("rank") <= k)
    return ranked.select(
        query_id_col,
        F.col("rank").cast("long").alias("rank"),
        id_col,
        F.round(F.col("_sm") / 1e6, 6).alias("score_bm25"),
    )


def bm25_dropped_terms(
    docs: DataFrame,
    queries: DataFrame,
    max_df_share: float | None = MAX_DF_SHARE,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_col: str = "query",
    tokens=None,
) -> DataFrame:
    """The 'no silent caps' companion to :func:`bm25_topk`'s
    ``max_df_share`` gate (the :func:`~weatherdb_spark.llm.bucketing.
    bucket_overflow` twin): one row per DROPPED query term with its
    document frequency and share — run it at the same parameters to see
    exactly which terms the gate removed and why a query returned fewer
    (or zero) rows. Empty result == the gate never engaged and the
    gated top-k is identical to ``max_df_share=None``.

    Same token pipeline as the scorer (one ``tokens`` callable feeds
    both), same df definition (documents containing the term at least
    once among the distinct query terms' postings), so the report and
    the gate cannot disagree. ``max_df_share=None`` mirrors the
    scorer's gate-off mode: nothing is dropped, so the report is empty
    by construction.
    """
    if max_df_share is None:
        spark = docs.sparkSession
        return spark.createDataFrame(
            [], "word string, doc_freq long, n_docs long, df_share double"
        )
    if not 0 < max_df_share <= 1:
        raise ValueError(
            f"max_df_share must be in (0, 1], got {max_df_share}"
        )
    from weatherdb_spark.llm.text import tokens_expr

    tok = tokens if tokens is not None else tokens_expr
    words = tok(text_col)
    qterms = (
        queries.select(
            F.explode(F.array_distinct(tok(query_col))).alias("_w"))
        .distinct()
    )
    toks = docs.select(F.col(id_col), F.explode(words).alias("_w"))
    dfreq = (
        toks.join(F.broadcast(qterms), "_w")
        .groupBy("_w").agg(F.count_distinct(id_col).alias("doc_freq"))
    )
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        dfreq.join(F.broadcast(stats))
        .filter(F.col("doc_freq") > max_df_share * F.col("n_docs"))
        .select(
            F.col("_w").alias("word"),
            "doc_freq",
            "n_docs",
            F.round(F.col("doc_freq") / F.col("n_docs"), 6).alias("df_share"),
        )
    )
