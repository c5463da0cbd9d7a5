"""Sequence shaping for training-data pipelines: context-window
chunking, concat-then-split packing, and deterministic shuffle-sharding.

These are the steps BETWEEN a cleaned corpus and a training run: cut
each document into model-context-sized windows (``chunk_windows``),
assign every token of the corpus to a fixed-capacity training sequence
exactly the way GPT-style pretraining packs data — concatenate the
document stream, cut every ``capacity`` tokens (``pack_concat_chunk``),
and deal documents into shards in a reproducible pseudo-random order
(``shuffle_shard``).

All three are deterministic pure functions of (corpus, parameters) with
exact DuckDB oracle twins; none uses a Python UDF by default. Tokens
are whitespace words (the engine-wide convention shared with
``llm.text``); a real tokenizer plugs in through the ``tokens``
parameter (any col -> array<string> Column callable, e.g. the
Arrow-backed ``llm.text.arrow_regex_tokens``) — it changes only the
token expression, never the packing plan.

Scale notes (100 TB):

- ``chunk_windows`` is a projection + bounded explode — it rides the
  scan, no shuffle.
- ``pack_concat_chunk`` needs a GLOBAL prefix sum of token counts in
  document order. A bare ``Window.orderBy`` running sum collapses to a
  single partition (Spark's unpartitioned-window trap), so the offset
  is computed as a two-level prefix sum: per-bucket totals (a dim-sized
  aggregate) carry the cross-bucket base, and the running sum windows
  only WITHIN each bucket — bounded partitions, fully distributed.
- ``shuffle_shard`` is a projection (hash shard + hash sort key); the
  optional in-shard position is a per-shard window kept for the oracle
  check — at 100 TB drop it and write with
  ``repartition(n_shards, shard).sortWithinPartitions(sort_key)``,
  which realizes the identical order without a row_number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from weatherdb_spark.llm.hashing import md5_int64

#: documents per prefix-sum bucket in pack_concat_chunk: bounds every
#: within-bucket window partition while keeping the bucket-totals dim
#: tiny (corpus_size / PACK_BUCKET_DOCS rows).
PACK_BUCKET_DOCS = 1000


def _tokens(text_col: str, tokens=None):
    """Resolve the tokenizer seam: ``tokens`` is any col ->
    array<string> Column callable (``llm.text.tokens_expr``'s shape —
    a JVM expression or an Arrow pandas_udf like
    ``llm.text.arrow_regex_tokens``); None = the engine default."""
    if tokens is not None:
        return tokens(text_col)
    from weatherdb_spark.llm.text import tokens_expr

    return tokens_expr(text_col)


def chunk_windows(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens=None,
) -> DataFrame:
    """Cut each document's token stream into fixed-size windows with
    overlap ``window - stride`` (context chunking for embedding /
    finetune pipelines). Windows start at ``i * stride``; the last
    window may be short but every token is covered exactly
    ``ceil(window / stride)`` times or fewer. Zero shuffle.

    NULL-text documents emit NOTHING: their token array is NULL, and
    ``greatest(NULL - window, 0)`` would otherwise schedule one phantom
    chunk with NULL token count and NULL text (CorpusStore deliberately
    admits one NULL-text representative per dedup group, so a
    corpus-fed chunking pass WOULD hit this) — the 'every token
    covered' contract has zero tokens to cover, hence zero rows."""
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride} > {window}")
    toks = _tokens(text_col, tokens)
    n = F.col("_n")
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - window, F.lit(0)) + stride - 1) / F.lit(stride)
    ).cast("int")
    out = (
        df.select(F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n"))
        # filter on the ARRAY's nullness, not the size column: under
        # spark.sql.legacy.sizeOfNull=true (ANSI off) size(NULL) is -1,
        # not NULL, and the phantom chunk would silently return
        .filter(F.col("_toks").isNotNull())
        .select(
            id_col,
            "_toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .withColumn("chunk_start", F.col("chunk_id") * stride)
        .withColumn("_chunk", F.slice(F.col("_toks"), F.col("chunk_start") + 1, window))
    )
    return out.select(
        id_col,
        "chunk_id",
        "chunk_start",
        F.size("_chunk").alias("n_chunk_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )


def pack_concat_chunk(
    df: DataFrame,
    capacity: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_docs: int | None = PACK_BUCKET_DOCS,
    tokens=None,
) -> DataFrame:
    """GPT-style packing: concatenate every document's tokens in
    ``id_col`` order and cut the stream every ``capacity`` tokens. Each
    output row maps one document segment into one training sequence:
    ``(doc_id, n_tokens, tok_offset, seq_id, seg_start, seg_len)`` where
    ``seg_start`` is 0-based within the document and consecutive
    segments of a sequence tile it exactly (no padding rows — the final
    sequence may be short).

    The global token offset is a two-level prefix sum (see module
    docstring): dim-sized bucket totals + within-bucket running sums —
    never an unpartitioned window. ``bucket_docs`` is a pure compute
    strategy (results are identical at any value — pinned by test);
    both levels stay bounded when it is sized ~sqrt(corpus docs): the
    bucket-totals window then holds sqrt(N) rows and every within-
    bucket partition sqrt(N) rows, so even an N of 10^10 documents
    keeps each side at ~10^5. ``bucket_docs=None`` AUTO-SIZES to
    ceil(sqrt(max_id + 1)) (one narrow max-aggregate job over the id
    column — ids bound the bucket count since buckets are id ranges),
    removing the foot-gun of packing a 10^10-doc corpus at the default
    1000 (a 10^7-row bucket-totals window in one task). The explicit
    default stays for plan-pinned callers.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    id_type = dict(df.dtypes).get(id_col, "")
    if not (id_type in ("bigint", "int", "smallint", "tinyint")
            or id_type.startswith("decimal")):
        # a string id would floor() to NULL buckets and the bucket-base
        # join would silently drop EVERY row — fail loudly instead; the
        # sibling hash-based operators accept any id, but packing needs
        # the id ORDER, so a numeric id is semantic here
        raise TypeError(
            f"pack_concat_chunk needs an integral {id_col!r} to order and "
            f"bucket the stream, got {id_type or 'missing column'}; map "
            "string ids to a dense rank first"
        )
    if bucket_docs is None:
        # after the type check: a string id must hit the curated
        # TypeError above, not a raw int() failure after a wasted job
        max_id = df.agg(F.max(id_col)).first()[0]
        bucket_docs = max(1, int((int(max_id) + 1) ** 0.5) + 1) \
            if max_id is not None else PACK_BUCKET_DOCS
    base = df.select(
        F.col(id_col),
        F.size(_tokens(text_col, tokens)).alias("n_tokens"),
        F.floor(F.col(id_col) / bucket_docs).alias("_bucket"),
    )
    # dim-sized: one row per PACK_BUCKET_DOCS documents
    totals = base.groupBy("_bucket").agg(F.sum("n_tokens").alias("_bt"))
    bucket_base = totals.withColumn(
        "_base",
        F.coalesce(
            F.sum("_bt").over(
                W.orderBy("_bucket").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_bucket", "_base")
    within = F.sum("n_tokens").over(
        W.partitionBy("_bucket").orderBy(id_col).rowsBetween(W.unboundedPreceding, -1)
    )
    offs = (
        base.join(F.broadcast(bucket_base), "_bucket")
        .withColumn("tok_offset", F.col("_base") + F.coalesce(within, F.lit(0)))
    )
    seq_first = F.floor(F.col("tok_offset") / capacity)
    seq_last = F.floor((F.col("tok_offset") + F.col("n_tokens") - 1) / capacity)
    out = offs.filter(F.col("n_tokens") > 0).select(
        id_col,
        "n_tokens",
        "tok_offset",
        F.explode(F.sequence(seq_first, seq_last)).alias("seq_id"),
    )
    seg_lo = F.greatest(F.col("tok_offset"), F.col("seq_id") * capacity)
    seg_hi = F.least(
        F.col("tok_offset") + F.col("n_tokens"), (F.col("seq_id") + 1) * capacity
    )
    return out.select(
        id_col,
        "n_tokens",
        "tok_offset",
        "seq_id",
        (seg_lo - F.col("tok_offset")).alias("seg_start"),
        (seg_hi - seg_lo).alias("seg_len"),
    )


def _shard_key(id_col: str, salt: str):
    """THE shard-key expression — single source shared by
    :func:`shuffle_shard` and :func:`write_training_shards` so the
    operator, the sink, and the registry oracle cannot drift (the
    tokens_expr/shingles_expr convention applied to sharding)."""
    return md5_int64(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))


def shuffle_shard(
    df: DataFrame,
    n_shards: int = 8,
    salt: str = "",
    id_col: str = "doc_id",
    with_position: bool = True,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment: every document
    gets a pseudo-random 60-bit ``sort_key`` from (id, salt) via the
    cross-engine md5 hash, a ``shard`` = key mod ``n_shards``, and (if
    ``with_position``) its 1-based position within the shard's key
    order. Re-running is bit-stable; changing ``salt`` reshuffles.

    ``with_position=False`` keeps the operator a pure projection — the
    100 TB path writes ``repartition(n_shards, shard)
    .sortWithinPartitions(sort_key, id)`` instead of ranking rows.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    key = _shard_key(id_col, salt)
    out = df.select(
        F.col(id_col),
        key.alias("sort_key"),
        F.pmod(key, F.lit(n_shards)).alias("shard"),
    )
    if not with_position:
        return out
    return out.withColumn(
        "shard_pos",
        F.row_number().over(W.partitionBy("shard").orderBy("sort_key", id_col)),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    salt: str = "",
    id_col: str = "doc_id",
    columns: list[str] | None = None,
) -> None:
    """Materialize the training-data write the module docstring
    promises: shuffle-shard the corpus deterministically and write ONE
    parquet file per shard under ``path``, rows inside each file in
    shard-key order — the exact layout a data loader streams
    sequentially per worker.

    This is the 100 TB path the ``with_position`` flag alludes to:
    ``repartition(n_shards, shard)`` + ``sortWithinPartitions`` realize
    the global pseudo-random order with ONE shuffle and ZERO windows —
    no row_number, no global sort. ``partitionBy("shard")`` keeps shard
    directories addressable (`shard=3/`), so a loader reads its shard
    with partition pruning and replays it bit-identically across runs.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    key = _shard_key(id_col, salt)
    keyed = (
        df.select(*(columns or df.columns))
        .withColumn("sort_key", key)
        .withColumn("shard", F.pmod(F.col("sort_key"), F.lit(n_shards)))
    )
    (
        keyed.repartition(n_shards, F.col("shard"))
        # "shard" leads the sort: the dynamic-partition write requires
        # ordering by the partition column and would otherwise insert
        # its own non-stable sort on shard alone, scrambling sort_key
        # order inside each file; with the prefix already satisfied the
        # writer's SortExec elides and file order = this order
        .sortWithinPartitions("shard", "sort_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
