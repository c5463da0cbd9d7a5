"""Deduplication operators for large-scale training-data pipelines.

All operators take a documents DataFrame (id_col, text_col) and are pure
DataFrame compositions — no Python UDFs in the hot path. Scale notes per
operator; the common theme is that candidate generation must avoid the
O(n^2) cross join: exact dedup is one shuffle on the content hash, MinHash
LSH shuffles on (band, band-signature), SimHash on hash prefix buckets.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weatherdb_spark.functions.partitioning import spread
from weatherdb_spark.llm.hashing import md5_int64, minhash_perm


def shingles_expr(text_col, n: int = 3):
    """Distinct word n-gram shingles of a text Column as a PURE
    expression (JVM-side, no UDF, no shuffle). The single source of the
    shingling definition — the batch pipeline (word_shingles) and the
    streaming near-dup signature (streaming/neardup.py) both build on
    it, so their signatures cannot drift apart. Texts with fewer than n
    words give an empty array."""
    words = F.split(text_col, " ")
    n_words = F.size(words)
    idx = F.sequence(F.lit(1), n_words - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j) for j in range(n)]
    )
    return F.when(
        n_words >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                  out_col: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles per document (JVM-side transform,
    no UDF). Documents with fewer than n words get an empty array."""
    return df.withColumn(out_col, shingles_expr(F.col(text_col), n))


def exploded_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) rows, one per distinct word n-gram, computed in
    parallel after a keyed ``spread``.

    Uses ``explode_outer`` deliberately: plain ``explode`` makes Catalyst
    infer a ``size(shingles) > 0`` filter and push it below the exchange,
    re-evaluating the whole shingle expression in the (possibly single)
    pre-shuffle task. ``explode_outer`` infers nothing; empty docs emit a
    NULL shingle that one cheap post-exchange filter drops."""
    sh = word_shingles(spread(df, id_col), text_col, n)
    return (
        sh.select(F.col(id_col), F.explode_outer("shingles").alias("_s"))
        .filter(F.col("_s").isNotNull())
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on the content hash: one shuffle on md5(text). Returns
    (id_col, group_size, is_kept) where the smallest id per group is kept."""
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
    groups = h.groupBy("_h").agg(
        F.min(id_col).alias("_keep"), F.count(F.lit(1)).alias("group_size")
    )
    # eqNullSafe: NULL-text docs hash to a NULL key; a plain equi-join
    # would drop them from the output entirely (NULL != NULL). groupBy
    # already collects them into one group (SQL grouping semantics), so
    # the null-safe join keeps them flowing through as one dedup group.
    return (
        h.join(groups, h["_h"].eqNullSafe(groups["_h"]))
        .select(
            h[id_col].alias(id_col),
            "group_size",
            (h[id_col] == F.col("_keep")).alias("is_kept"),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 10_000,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs via an inverted shingle index:
    explode shingles -> self-join on shingle -> count common / union.

    Scale path: the self-join is keyed on the shingle (no cross join), so
    cost is sum over shingles of df(s)^2. ``max_df`` caps that quadratic
    term: shingles shared by more than ``max_df`` documents are dropped
    from the INDEX before the join (standard near-dup practice — a
    stop-word shingle shared by 1M docs would otherwise make a 10^12-pair
    bucket). Document sizes keep counting capped shingles, so the
    reported jaccard is a lower bound that converges to exact as
    ``max_df`` grows; pairs whose overlap is only stop-word shingles are
    the ones a near-dup pass wants to miss. ``max_df=None`` disables the
    cap (exact, small corpora only). For the full LSH pipeline use
    :func:`minhash_lsh_pairs`.

    The df count is a window over the shingle key, so the self-join that
    follows reuses the same hash partitioning — the cap costs a sort, not
    an extra shuffle.
    """
    sh = exploded_shingles(df, id_col, text_col, n).select(
        F.col(id_col).alias("_id"), "_s"
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    if max_df is not None:
        from pyspark.sql import Window

        sh = sh.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("_s"))
        ).filter(F.col("_df") <= F.lit(max_df)).drop("_df")
    a = sh.select(F.col("_id").alias("id_a"), "_s")
    b = sh.select(F.col("_id").alias("id_b"), "_s")
    common = (
        a.join(b, "_s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    out = (
        common.join(sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


@lru_cache(maxsize=64)
def _min_perm_aggs(num_perm: int) -> tuple:
    """The ``num_perm`` MinHash min-aggregate Columns over ``_h``,
    built ONCE per process: Column objects are immutable, plan-
    independent expression templates, but constructing them costs one
    py4j round trip per operator — profiled at ~1.0 s of pure driver
    time per CorpusStore append (32 perms x ~8 JVM calls each, plus
    the band-key encode below) before this memo. Cached expressions
    resolve per-plan exactly like freshly built ones."""
    return tuple(
        F.min(minhash_perm(F.col("_h"), k)).alias(f"_m{k}")
        for k in range(num_perm)
    )


@lru_cache(maxsize=64)
def _signature_array(num_perm: int):
    """array(_m0.._mN) Column — see :func:`_min_perm_aggs`."""
    return F.array(*[F.col(f"_m{k}") for k in range(num_perm)]).alias(
        "signature"
    )


def _signatures_from_exploded(
    sh: DataFrame, num_perm: int, id_col: str
) -> DataFrame:
    """MinHash signatures from pre-exploded (id, _s) shingle rows."""
    hashed = sh.withColumn("_h", md5_int64(F.col("_s"))).drop("_s")
    mins = hashed.groupBy(id_col).agg(*_min_perm_aggs(num_perm))
    return mins.select(F.col(id_col), _signature_array(num_perm))


def minhash_signatures(
    df: DataFrame,
    num_perm: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per document: md5-hash each shingle to int64 once,
    apply ``num_perm`` universal-hash permutations, take the min of each.

    Shape: explode shingles -> hash -> groupBy(doc) with ``num_perm``
    ``min`` aggregates. The hash runs once per shingle (not once per
    permutation), the mins combine map-side (the shuffle carries ~one
    partial row of ``num_perm`` mins per doc per task, not per shingle),
    and the groupBy reuses the keyed ``spread`` exchange — one tiny
    shuffle, never of the text. A shuffle-free alternative (signatures as
    ``array_min``/``transform`` expressions over the shingle array)
    measures ~1.8x SLOWER at sf0.1: higher-order-function lambdas are
    interpreted per element, while this explode+agg pipeline stays inside
    whole-stage codegen — keep the aggregate form."""
    return _signatures_from_exploded(
        exploded_shingles(df, id_col, text_col, n), num_perm, id_col
    )


def band_key_exprs(sig, bands: int, rows: int) -> list:
    """One '-'-joined key Column per band from a signature array Column
    — THE band-key encoding, single-sourced: the batch pair join
    (:func:`_banded_keys`), the overflow report, and the streaming
    near-dup / decontamination joins (``streaming/neardup.py``) all
    derive their keys here, so the two sides of a stream-static band
    join cannot drift (the tokens_expr/shingles_expr convention applied
    to bucketing)."""
    return [
        F.concat_ws(
            "-", *[sig[b * rows + r].cast("string") for r in range(rows)]
        )
        for b in range(bands)
    ]


@lru_cache(maxsize=64)
def _banded_keys_explode(bands: int, rows: int):
    """The exploded (band, key) struct Column over ``signature`` —
    memoized per process like :func:`_min_perm_aggs` (bands x rows
    element accessors + casts + concats are py4j round trips)."""
    keys = band_key_exprs(F.col("signature"), bands, rows)
    return F.explode(
        F.array(
            *[
                F.struct(F.lit(b).alias("band"), keys[b].alias("key"))
                for b in range(bands)
            ]
        )
    ).alias("bk")


def _banded_keys(sig: DataFrame, bands: int, rows: int, id_col: str) -> DataFrame:
    """LSH band keys from MinHash signatures: one (id, band, key) row per
    band, key = the band's ``rows`` signature slots joined. Shared by the
    pair join and :func:`minhash_bucket_overflow` so the overflow report
    sees exactly the buckets the join shuffles on."""
    return sig.select(
        id_col, _banded_keys_explode(bands, rows)
    ).select(id_col, "bk.band", "bk.key")


def minhash_bucket_overflow(
    df: DataFrame,
    cap: int,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-bucket overflow report for :func:`minhash_lsh_pairs` with
    ``max_bucket_docs=cap``: one row per (band, key) bucket whose
    population exceeds the cap, with the denied-resident count — the
    'no silent caps' companion (pass the SAME num_perm/bands/n as the
    capped run; this rebuilds the identical banded stream). Empty
    result == the cap never engaged and the capped pair set is
    identical to the uncapped one."""
    from weatherdb_spark.llm.bucketing import bucket_overflow

    sig = minhash_signatures(df, num_perm, n, id_col, text_col)
    return bucket_overflow(
        _banded_keys(sig, bands, num_perm // bands, id_col),
        ["band", "key"], cap,
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_docs: int | None = None,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, verified with exact Jaccard.

    shingle -> minhash (num_perm) -> band into ``bands`` groups of
    ``num_perm/bands`` rows -> shuffle on (band, band-signature) -> candidate
    pairs from same-bucket docs -> exact-Jaccard verify >= threshold.

    With 32 perms / 8 bands / 4 rows: P(candidate | s=0.9) ~ 0.9998,
    P(candidate | s=0.07) ~ 2e-4 — the candidate set stays near-linear at
    100 TB while recall at the 0.8+ range is ~1.

    The corpus is shingled ONCE: the signature stage explodes the persisted
    shingle arrays that the verify stage reads back, instead of re-running
    the split/transform text pass. The persist is deliberate and bounded
    (one array column per doc, MEMORY_AND_DISK spills under pressure).

    ``max_bucket_docs`` (default None = uncapped) bounds the hot-bucket
    quadratic: a corpus of B near-identical documents lands its band
    signatures in one bucket, and the candidate join inside it is
    O(B^2). With the cap, the LEFT (smaller-id) side of each
    (band, key) bucket keeps only its first N residents by ascending
    id, so the bucket yields O(N*B) candidates — the batch twin of the
    streaming ``max_bucket_docs`` (``streaming/neardup.py``). A pair
    survives if ANY band keeps it (bands stay independent, as in the
    stream). Not silent: logged on activation, quantifiable with
    :func:`weatherdb_spark.llm.bucketing.bucket_overflow`.
    """
    from pyspark import StorageLevel

    from weatherdb_spark.functions.caching import scoped_persist

    rows = num_perm // bands
    sh = scoped_persist(
        word_shingles(spread(df, id_col), text_col, n).select(id_col, "shingles"),
        StorageLevel.MEMORY_AND_DISK,
    )
    exploded = (
        sh.select(F.col(id_col), F.explode_outer("shingles").alias("_s"))
        .filter(F.col("_s").isNotNull())
    )
    sig = _signatures_from_exploded(exploded, num_perm, id_col)
    banded = _banded_keys(sig, bands, rows, id_col)
    return verified_pairs_from_banded(
        banded, sh, threshold, id_col, max_bucket_docs
    )


def verified_pairs_from_banded(
    banded: DataFrame,
    sh: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    max_bucket_docs: int | None = None,
) -> DataFrame:
    """The candidate-join + exact-Jaccard-verify tail of
    :func:`minhash_lsh_pairs`, over PRECOMPUTED band keys
    (``banded``: (id, band, key)) and shingle arrays (``sh``: (id,
    shingles), ideally persisted). Split out so a caller that already
    holds these frames — ``CorpusStore.append`` computes them once for
    the archive index and its own within-batch check — never pays a
    second shingle + signature pass over the same documents."""
    from weatherdb_spark.llm.bucketing import cap_bucket_residents

    left = cap_bucket_residents(
        banded.select(F.col(id_col).alias("id_a"), "band", "key"),
        ["band", "key"], "id_a", max_bucket_docs,
    )
    right = banded.select(F.col(id_col).alias("id_b"), "band", "key")
    candidates = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # adversarial-verify candidates with exact jaccard over the SAME
    # persisted shingle arrays the signatures came from
    sh = sh.select(F.col(id_col).alias("_id"), F.col("shingles"))
    verified = (
        candidates.join(sh.select(F.col("_id").alias("id_a"), F.col("shingles").alias("_sa")), "id_a")
        .join(sh.select(F.col("_id").alias("id_b"), F.col("shingles").alias("_sb")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("_sa", "_sb"))
                / F.size(F.array_union("_sa", "_sb")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def simhash(
    df: DataFrame,
    bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash fingerprint per document (token-frequency weighted).

    Each token hashes to int64; bit i of the fingerprint is 1 iff the sum
    over token occurrences of (2*bit_i(token_hash) - 1) is positive. Pure
    explode + groupBy — two shuffles, both keyed on doc id.
    """
    toks = spread(df, id_col).select(
        F.col(id_col), F.explode_outer(F.split(F.col(text_col), " ")).alias("_w")
    ).filter(F.col("_w").isNotNull()).withColumn("_h", md5_int64(F.col("_w")))
    # bit extraction via shiftright, NOT division — the 60-bit hash exceeds
    # double's 53-bit integer precision
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                (F.shiftright(F.col("_h"), i) % 2) * 2 - 1
            ).alias(f"_b{i}")
            for i in range(bits)
        ]
    )
    fingerprint = sum(
        [F.when(F.col(f"_b{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0)) for i in range(bits)],
        F.lit(0),
    )
    return bit_sums.select(F.col(id_col), fingerprint.cast("bigint").alias("simhash"))


def simhash_blocks(bits: int, max_hamming: int) -> list[tuple[int, int, int]]:
    """The multi-index pigeonhole block layout shared by the batch pair
    join (:func:`simhash_pairs_exact`) and the streaming twin
    (``streaming.neardup.stream_simhash_neardup``): ``max_hamming + 1``
    contiguous (index, low_bit, width) blocks covering all bits, widths
    differing by at most 1. ONE definition so the two pipelines bucket
    identically."""
    n_blocks = max_hamming + 1
    base, extra = divmod(bits, n_blocks)
    blocks, lo = [], 0
    for i in range(n_blocks):
        width = base + (1 if i < extra else 0)
        blocks.append((i, lo, width))
        lo += width
    return blocks


def simhash_pairs_exact(
    df: DataFrame,
    max_hamming: int = 6,
    bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ALL pairs with SimHash hamming distance <= max_hamming — exact,
    without the O(n^2) cross join.

    Multi-index hamming search (Norouzi/Punjani/Fleet, "Fast Search in
    Hamming Space with Multi-Index Hashing", CVPR 2012): split the
    fingerprint into ``max_hamming + 1`` disjoint bit blocks; by
    pigeonhole, two fingerprints within ``max_hamming`` differing bits
    agree EXACTLY on at least one whole block, so a per-block equi-join
    on (block_id, block_value) generates every qualifying pair — no
    recall loss, unlike a single-prefix bucket join
    (:func:`simhash_pairs`), and each block key spreads the corpus over
    2^width buckets so no bucket goes quadratic unless the corpus is
    degenerate on all blocks at once.

    Cost shape: one explode to (doc, block, key) — ``max_hamming+1``
    rows per doc — one keyed self-join, a distinct on the pair, then the
    exact popcount filter. All shuffles are keyed; scales like LSH
    banding.
    """
    fp = simhash(df, bits, id_col, text_col)
    return hamming_pairs_exact(fp, "simhash", max_hamming, bits, id_col)


def banded_fingerprint_keys(
    fp: DataFrame,
    fp_col: str,
    max_hamming: int,
    bits: int,
    id_col: str = "doc_id",
    extra_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """(id, [extra...], fp, block, key) — THE multi-index pigeonhole
    block-key explosion, shared by :func:`hamming_pairs_exact`'s
    self-join, the asymmetric archive checks (``CorpusStore``'s image
    index), and the streaming fingerprint states
    (``streaming.neardup._stream_fp_neardup``, which passes
    ``extra_cols=("event_ts",)``): one row per (doc, block), keys
    extracted sign-safely (unsigned shift + bitwise-AND mask; the whole
    fingerprint for a full 64-bit block). One definition — a change to
    the key encoding cannot de-synchronize the batch, store, and stream
    buckets."""
    def _key(lo: int, width: int):
        shifted = F.shiftrightunsigned(F.col(fp_col), lo)
        if width >= 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    blocks = simhash_blocks(bits, max_hamming)
    return fp.select(
        id_col,
        *extra_cols,
        fp_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block"),
                        _key(lo, width).alias("key"),
                    )
                    for i, lo, width in blocks
                ]
            )
        ).alias("bk"),
    ).select(id_col, *extra_cols, fp_col, "bk.block", "bk.key")


def hamming_pairs_exact(
    fp: DataFrame,
    fp_col: str,
    max_hamming: int = 6,
    bits: int = 32,
    id_col: str = "doc_id",
    max_bucket_docs: "int | None" = None,
) -> DataFrame:
    """ALL (id_a, id_b, hamming) pairs whose ``fp_col`` int64
    fingerprints differ in at most ``max_hamming`` bits — the generic
    multi-index pigeonhole join :func:`simhash_pairs_exact` is built on
    (same :func:`simhash_blocks` layout), factored out so ANY int64
    fingerprint family rides it: SimHash over text, dHash/pHash over
    image payloads (``llm.multimodal.image_neardup_pairs``), audio
    chroma hashes. Exact (recall 1 by pigeonhole), every shuffle keyed
    on (block, key) — no cross join at any corpus size.

    Block keys extract with an unsigned shift + a bitwise AND mask: a
    fingerprint using all 64 bits (dHash) is negative as an int64, and
    sign-following arithmetic (``shiftright`` or Spark's ``%``, whose
    remainder follows the dividend — including at shift 0, where even
    the unsigned shift is the identity) would give two fps with
    identical low-block bits DIFFERENT keys (silent recall loss; the
    mixed-sign block-0 case is pinned by test). The mask form is
    bit-identical to the modulo form for the non-negative fps (simhash
    at bits<=32) the streaming twin and the mirrored oracles share the
    layout with; a full-width block (bits=64, max_hamming=0) keys on
    the fingerprint itself — ``2**64`` fits no JVM long.

    ``max_bucket_docs`` (default None = uncapped, recall 1 preserved)
    opts into the standard hot-bucket resident cap
    (:func:`~weatherdb_spark.llm.bucketing.cap_bucket_residents`) on
    the smaller-id side per (block, key) — a degenerate fingerprint
    population (e.g. thousands of all-zero dHashes from empty payloads)
    collapses into one bucket and the join inside it goes O(B^2); the
    cap trades the pairs whose smaller id is not a resident for a
    linear bound, the same knob and semantics as the LSH generators.
    Quantify engaged caps with
    :func:`~weatherdb_spark.llm.bucketing.bucket_overflow` over the
    same :func:`banded_fingerprint_keys` frame."""
    from weatherdb_spark.llm.bucketing import cap_bucket_residents

    banded = banded_fingerprint_keys(fp, fp_col, max_hamming, bits, id_col)
    a = cap_bucket_residents(
        banded.select(
            F.col(id_col).alias("id_a"), F.col(fp_col).alias("_fa"),
            "block", "key",
        ),
        ["block", "key"], "id_a", max_bucket_docs,
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col(fp_col).alias("_fb"), "block", "key"
    )
    return (
        a.join(b, ["block", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    bits: int = 32,
    prefix_bits: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Scale path: bucket by the fingerprint's top ``prefix_bits`` so the
    pair join is per-bucket (near-dups share prefixes with high
    probability); exact hamming check inside the bucket. NOTE this single
    prefix table has recall < 1 (pairs differing inside the prefix are
    missed) and one hot prefix can go quadratic — prefer
    :func:`simhash_pairs_exact`, which is exact AND bounded.
    """
    fp = simhash(df, bits, id_col, text_col)
    bucket = F.floor(F.col("simhash") / F.lit(2 ** (bits - prefix_bits)))
    fp = fp.withColumn("_bucket", bucket)
    a = fp.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("_fa"), "_bucket")
    b = fp.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("_fb"), "_bucket")
    return (
        a.join(b, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


#: below this DIRECTED edge count (2x the undirected pairs) the
#: component labels are computed with a driver-side union-find instead
#: of the iterative distributed loop: near-dup edge sets are
#: sketch-sized (pairs that SURVIVED verification), so at local/NB scale
#: the loop's O(diameter) job overhead dwarfs the actual work. Only the
#: undirected half transfers (Arrow columns, ~8 MB of int64 at the
#: threshold); driver cost is the python dict of NODES (bounded by the
#: edge count) plus one find() per edge — ~1 s/1M edges, comfortably
#: under the several-job distributed floor it replaces.
DRIVER_CC_MAX_EDGES = 2_000_000


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, component_id)
    with component_id = the smallest doc id in the component. This is the
    last step of a dedup pipeline: groups tell you which documents are
    interchangeable so one representative per group survives.

    Auto-sized like the Richter correction join: the edge list is
    materialized once (``localCheckpoint`` — every propagation round
    would otherwise re-execute the entire upstream pair-generation
    pipeline), counted, and

    - ``<= DRIVER_CC_MAX_EDGES``: collected and solved with union-find
      on the driver — exact same min-label output, zero per-round job
      overhead. Dedup edge lists are verified near-dup pairs, i.e.
      sketch-sized even when the corpus is not.
    - larger: iterative min-label propagation — every node takes the min
      label in its closed neighborhood per round; stop when no label
      changes. Rounds needed = graph diameter (near-dup graphs are
      shallow — duplicate clusters are dense), each round is ONE job
      (the change flag rides on the label frame; the lazy checkpoint
      materializes during the change count) and one keyed shuffle, with
      lineage cut per round. The driver loop is O(diameter) distributed
      jobs, not a per-row loop.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    n_edges = edges.count()  # cheap: counts the checkpointed partitions
    if n_edges <= DRIVER_CC_MAX_EDGES:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        # undirected half only (src <= dst, keeping self-loop NODES),
        # via one Arrow transfer — row-at-a-time toLocalIterator would
        # dominate near the threshold
        half = edges.filter(F.col("src") <= F.col("dst")).toPandas()
        for src, dst in zip(half["src"].tolist(), half["dst"].tolist()):
            for node in (src, dst):
                if node not in parent:
                    parent[node] = node
            ra, rb = find(src), find(dst)
            if ra != rb:  # union by min so the root IS the min label
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        import pandas as pd

        from pyspark.sql.types import StructField, StructType

        id_type = pairs.schema[a_col].dataType  # ids may be long or str
        schema = StructType([
            StructField("doc_id", id_type),
            StructField("component_id", id_type),
        ])
        # upload through pandas/Arrow like the download leg — a plain
        # list of tuples would pickle row-at-a-time at the threshold
        out = pd.DataFrame({
            "doc_id": list(parent),
            "component_id": [find(node) for node in parent],
        })
        return pairs.sparkSession.createDataFrame(out, schema)

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component_id", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nb_min = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("component_id").alias("_nb_lbl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("_nb_lbl").alias("_min_nb"))
        )
        new_labels = (
            labels.join(nb_min.withColumnRenamed("src", "id"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component_id"), F.coalesce("_min_nb", F.col("component_id"))
                ).alias("component_id"),
                (F.coalesce("_min_nb", F.col("component_id"))
                 < F.col("component_id")).alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter("_changed").limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        # Falling through with labels still moving means a component is
        # split across several ids — silently wrong downstream (multiple
        # "representatives" of one duplicate group). Min-label propagation
        # needs O(component diameter) rounds, so this only triggers on
        # chain-shaped clusters longer than max_iter hops.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the graph has a component with a larger diameter — raise "
            "max_iter"
        )
    return labels.select(F.col("id").alias("doc_id"), "component_id")


# --------------------------------------------------------------------------
# Cross-corpus contamination (test-set decontamination)
# --------------------------------------------------------------------------

def exact_contamination(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus documents whose text is byte-identical to a reference
    document — the exact layer of test-set decontamination (drop
    training docs that appear in an eval set). Returns
    (id_col, ref_id), one row per contaminated corpus doc with the
    SMALLEST matching reference id.

    Scale: one md5 shuffle per side, equi-join on the hash; the
    reference side pre-aggregates to one row per distinct hash, so the
    join output is bounded by the corpus size even when the reference
    is duplicate-heavy. At a typical eval-set-sized reference the join
    auto-broadcasts.
    """
    ch = corpus.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
    rh = (
        reference.select(
            F.col(id_col).alias("ref_id"), F.md5(F.col(text_col)).alias("_h")
        )
        .groupBy("_h").agg(F.min("ref_id").alias("ref_id"))
    )
    # eqNullSafe, like exact_dedup: md5(NULL) is NULL and a plain
    # equi-join would silently pass every NULL-text document through —
    # in CorpusStore that bypassed dedup AND broke replay idempotency
    # (a replayed NULL-text doc was re-admitted every time). Two
    # NULL/missing texts count as identical, matching exact_dedup.
    return (
        ch.join(rh, ch["_h"].eqNullSafe(rh["_h"]))
        .select(id_col, "ref_id")
    )


def minhash_contamination(
    corpus: DataFrame,
    reference: DataFrame,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_docs: int | None = None,
) -> DataFrame:
    """NEAR-duplicate test-set decontamination: corpus documents whose
    word-n-gram Jaccard similarity to ANY reference document reaches
    ``threshold``. Returns (id_col, ref_id, jaccard) — every verified
    (corpus, reference) match, exact-Jaccard checked, so precision is 1
    and recall is the banding's (~1 at 0.8+ with 8 bands x 4 rows).

    The asymmetric twin of :func:`minhash_lsh_pairs`: both corpora
    shingle and sign once, band keys join corpus x reference (no
    id_a < id_b — the sides are distinct), and the verify reads the
    persisted shingle arrays. At 100 TB the reference (an eval set) is
    tiny next to the corpus: its banded keys broadcast and the corpus
    never shuffles more than its own band keys.

    ``max_bucket_docs`` caps the REFERENCE side per (band, key) bucket
    (ascending id) — the same hot-bucket bound as the symmetric path;
    a corpus doc keeps matches against capped-in residents only.
    """
    from pyspark import StorageLevel

    from weatherdb_spark.functions.caching import scoped_persist
    from weatherdb_spark.llm.bucketing import cap_bucket_residents

    rows = num_perm // bands

    def prep(df: DataFrame, name: str):
        sh = scoped_persist(
            word_shingles(spread(df, id_col), text_col, n)
            .select(F.col(id_col).alias(name), "shingles"),
            StorageLevel.MEMORY_AND_DISK,
        )
        exploded = (
            sh.select(F.col(name).alias(id_col),
                      F.explode_outer("shingles").alias("_s"))
            .filter(F.col("_s").isNotNull())
        )
        sig = _signatures_from_exploded(exploded, num_perm, id_col)
        return sh, _banded_keys(sig, bands, rows, id_col)

    c_sh, c_band = prep(corpus, "_cid")
    r_sh, r_band = prep(reference, "_rid")
    r_band = cap_bucket_residents(
        r_band.select(F.col(id_col).alias("ref_id"), "band", "key"),
        ["band", "key"], "ref_id", max_bucket_docs,
    )
    candidates = (
        c_band.join(r_band, ["band", "key"])
        .select(id_col, "ref_id")
        .distinct()
    )
    verified = (
        candidates
        .join(c_sh.select(F.col("_cid").alias(id_col),
                          F.col("shingles").alias("_sc")), id_col)
        .join(r_sh.select(F.col("_rid").alias("ref_id"),
                          F.col("shingles").alias("_sr")), "ref_id")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("_sc", "_sr"))
                / F.size(F.array_union("_sc", "_sr")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select(id_col, "ref_id", "jaccard")


#: broadcast the reference n-gram hash set only up to this many distinct
#: hashes (~8 bytes each -> ~80 MB at the cap). One eval set fits with
#: room; a PRODUCTION decontamination reference (every benchmark + held
#: -out suites, distinct 13-grams ~ its token count) reaches 10^8-10^9
#: rows, where a forced broadcast OOMs the driver — the same lesson
#: unigram_logprob's vocabulary join already learned.
NGRAM_REF_BROADCAST_MAX = 10_000_000


def ngram_contamination(
    corpus: DataFrame,
    reference: DataFrame,
    n: int = 13,
    min_collisions: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    est_ref_ngrams: int | None = None,
) -> DataFrame:
    """N-gram collision test-set decontamination (the published
    GPT-3-style filter): flag corpus documents sharing at least
    ``min_collisions`` distinct word ``n``-grams with ANY reference
    document. Returns (id_col, n_collisions) for flagged documents —
    deterministic, threshold-free at the default (one 13-gram collision
    with an eval set is essentially impossible by chance, so any hit is
    contamination), and complements the exact (byte-identical) and
    MinHash (whole-document Jaccard) layers by catching a PARAGRAPH of
    an eval document quoted inside an otherwise-novel training doc.

    Scale: the reference's distinct n-gram hash set is eval-set-sized
    and the join key is a narrow 8-byte hash either way; the corpus
    side explodes its shingles once (the shared :func:`shingles_expr`
    definition), hashes, joins, and aggregates per document — the only
    guaranteed exchange is the per-doc count's hash aggregation.

    The broadcast is SIZE-GATED (:data:`NGRAM_REF_BROADCAST_MAX`): the
    reference hash set is counted (one eval-set-sized job; under an
    active ``cache_scope`` the count's persist is reused by the join,
    otherwise the join recomputes it — no leaked blocks) — or taken from
    ``est_ref_ngrams`` when the caller already knows it — and only a
    set under the gate gets the broadcast hint; above it the join is
    left to Catalyst/AQE (shuffled on the 8-byte key). A forced
    ``F.broadcast`` of a multi-benchmark production reference (distinct
    13-grams ~ tokens, 10^8-10^9 rows) would OOM the driver.
    """
    from weatherdb_spark.functions.caching import scope_active, scoped_persist

    if n < 1:
        raise ValueError(f"n must be positive, got {n}")
    ref_sh = (
        exploded_shingles(reference, id_col, text_col, n)
        .select(md5_int64(F.col("_s")).alias("_h"))
        .distinct()
    )
    if est_ref_ngrams is None:
        # persist ONLY under an active cache_scope (which releases it on
        # exit): outside one, a persist here would never be unpersisted
        # — repeated calls in a long-lived session would accumulate dead
        # reference-set blocks, the exact leak the caching module
        # exists to prevent. Unpersisted, the join recomputes the
        # eval-set-sized explode once — cheap next to the corpus side.
        if scope_active():
            ref_sh = scoped_persist(ref_sh)
        est_ref_ngrams = ref_sh.count()
    if est_ref_ngrams <= NGRAM_REF_BROADCAST_MAX:
        ref_sh = F.broadcast(ref_sh)
    cor_sh = exploded_shingles(corpus, id_col, text_col, n).select(
        F.col(id_col), md5_int64(F.col("_s")).alias("_h")
    )
    return (
        cor_sh.join(ref_sh, "_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_collisions"))
        .filter(F.col("n_collisions") >= min_collisions)
    )
