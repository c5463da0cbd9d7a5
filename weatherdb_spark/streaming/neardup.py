"""Streaming MinHash-LSH near-duplicate detection (SURVEY.md §2.10 +
the LLM-pipeline dedup family in ``llm/dedup.py``).

The batch operator (``llm.dedup.minhash_lsh_pairs``) shuffles banded
signatures and joins same-bucket documents. Its streaming twin cannot
self-join an unbounded stream, so it keeps PER-BUCKET STATE instead: a
custom ``applyInPandasWithState`` operator keyed on (band, key) whose
state holds the first documents seen in that bucket. Each arriving
document is compared against the bucket's residents by SIGNATURE
AGREEMENT (matching minhash positions / num_perm — the standard unbiased
Jaccard estimate; the full text never enters state), and qualifying
(earlier_doc, new_doc) pairs are emitted append-mode.

Scale/boundedness design:

- The signature is computed STATELESSLY per row (``array_min`` /
  ``transform`` expressions over the shingle array) with the same
  md5-int64 + universal-hash constants as the batch pipeline
  (``llm/hashing.py``), so a document's streaming signature is
  bit-identical to its batch signature — the equivalence tests compare
  the two pipelines directly. Batch prefers the explode+agg shape (it
  whole-stage-codegens ~1.8x faster there); a stream cannot afford that
  extra stateful aggregation, and per-row expressions are exactly the
  stateless shape streaming wants.
- Bucket state is doubly bounded: at most ``max_bucket_docs`` residents
  per bucket (a crowded bucket is the stop-word-shingle degeneracy the
  batch pipeline's document-frequency cap handles — extra residents stop
  accumulating but still get compared on arrival), and event-time
  timeout drops a bucket once the watermark passes ``ttl`` beyond the
  last arrival. State per bucket is O(max_bucket_docs x num_perm) longs.
- A pair colliding in several bands emits once per colliding band
  (bands are independent state groups — coordinating them would need a
  second stateful exchange). Downstream consumers take
  ``dropDuplicates(["id_a", "id_b"])`` batch-side; the tests do.

Late data: a document older than the watermark may find its bucket
already expired — near-dups farther apart than ``ttl`` are an
at-least-once residue for the batch sweep, the same contract as
``stream_dedup_exact``.
"""

from __future__ import annotations

import logging
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from weatherdb_spark.llm.hashing import md5_int64, minhash_perm

logger = logging.getLogger(__name__)

_OUT_SCHEMA = T.StructType([
    T.StructField("id_a", T.LongType()),
    T.StructField("id_b", T.LongType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("est_jaccard", T.DoubleType()),
])
_STATE_SCHEMA = T.StructType([
    T.StructField("doc_ids", T.ArrayType(T.LongType())),
    # residents' signatures, flattened num_perm-per-doc
    T.StructField("sigs", T.ArrayType(T.LongType())),
])


def row_minhash_signature(text_col: Column, num_perm: int = 32,
                          n: int = 3) -> Column:
    """Per-row minhash signature as a pure expression (no shuffle, no
    state) — built on the SAME shingle expression and hash constants as
    the batch ``minhash_signatures`` (``llm.dedup.shingles_expr``), so
    values are bit-identical by construction. Documents with fewer than
    ``n`` words get an all-NULL signature (no shingles)."""
    from weatherdb_spark.llm.dedup import shingles_expr

    hashed = F.transform(shingles_expr(text_col, n), md5_int64)

    def perm_fn(k):
        # single-arg lambda per k: a `lambda h, k=k` would be called by
        # F.transform with (element, INDEX) — arity 2 means the second
        # arg is the array position, silently replacing the constant
        return lambda h: minhash_perm(h, k)

    return F.array(*[
        F.array_min(F.transform(hashed, perm_fn(k))) for k in range(num_perm)
    ])


def stream_neardup_pairs(
    stream: DataFrame,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    ttl: str = "1 hour",
    max_bucket_docs: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Append-mode stream of near-duplicate candidate pairs.

    Emits (id_a, id_b, band, est_jaccard) where ``id_a`` arrived first
    in that (band, key) bucket and the signature-agreement estimate is
    >= ``threshold``. See the module docstring for state bounds and the
    per-band emission contract.
    """
    import pandas as pd

    from weatherdb_spark.operators.timeline import _interval_seconds

    if bands <= 0 or num_perm % bands != 0:
        # silent truncation would weaken recall (dropped permutations);
        # bands > num_perm would give empty band keys that collapse the
        # whole stream into one state bucket per band
        raise ValueError(
            f"num_perm ({num_perm}) must be a positive multiple of "
            f"bands ({bands})"
        )
    ttl_ms = _interval_seconds(ttl) * 1000
    rows = num_perm // bands
    sig = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(ts_col).alias("event_ts"),
        row_minhash_signature(F.col(text_col), num_perm, n).alias("signature"),
    ).filter(F.col("signature")[0].isNotNull())
    from weatherdb_spark.llm.dedup import band_key_exprs

    _keys = band_key_exprs(F.col("signature"), bands, rows)
    banded = sig.select(
        "doc_id", "event_ts", "signature",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), _keys[b].alias("key"))
            for b in range(bands)
        ])).alias("bk"),
    ).select("doc_id", "event_ts", "signature", "bk.band", "bk.key")

    def fn(key, pdf_iter, state) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        band = int(key[0])
        if state.exists:
            doc_ids, sigs = state.get
            doc_ids = list(doc_ids)
            sigs = list(sigs)
        else:
            doc_ids, sigs = [], []
        chunks = [pdf for pdf in pdf_iter]
        pdf = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1
            else chunks[0] if chunks else pd.DataFrame(
                columns=["doc_id", "event_ts", "signature"]
            )
        )
        # earlier event time = earlier resident; doc_id tiebreak keeps
        # replays deterministic
        pdf = pdf.sort_values(["event_ts", "doc_id"])
        out = []
        for doc_id, signature in zip(pdf["doc_id"], pdf["signature"]):
            doc_id = int(doc_id)
            if doc_id in doc_ids:
                continue  # micro-batch replay of a known resident
            new_sig = [int(v) for v in signature]
            for i, resident in enumerate(doc_ids):
                res_sig = sigs[i * num_perm:(i + 1) * num_perm]
                est = sum(
                    1 for a, b in zip(res_sig, new_sig) if a == b
                ) / num_perm
                if est >= threshold:
                    out.append((resident, doc_id, band, est))
            if len(doc_ids) < max_bucket_docs:
                doc_ids.append(doc_id)
                sigs.extend(new_sig)
        state.update((doc_ids, sigs))
        # expire once the watermark passes last arrival + ttl. Expiry is
        # LAZY (evaluated per trigger for groups with no new data), so a
        # resident can outlive ttl until the next trigger — extra recall,
        # never lost pairs. The timestamp must stay above the current
        # watermark or Spark rejects it.
        last_ms = (
            int(pd.Timestamp(pdf["event_ts"].max()).value // 1_000_000)
            if len(pdf) else 0
        )
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs() + 1000, last_ms + ttl_ms)
        )
        if out:
            yield pd.DataFrame({
                "id_a": [r[0] for r in out],
                "id_b": [r[1] for r in out],
                "band": [r[2] for r in out],
                "est_jaccard": [r[3] for r in out],
            })

    return (
        banded.withWatermark("event_ts", ttl)
        .groupBy("band", "key")
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


_EMB_OUT_SCHEMA = T.StructType([
    T.StructField("id_a", T.LongType()),
    T.StructField("id_b", T.LongType()),
    T.StructField("table", T.IntegerType()),
    T.StructField("cos", T.DoubleType()),
])
_EMB_STATE_SCHEMA = T.StructType([
    T.StructField("vec_ids", T.ArrayType(T.LongType())),
    # residents' embeddings, flattened dim-per-vector
    T.StructField("vecs", T.ArrayType(T.DoubleType())),
])


def stream_embedding_neardup(
    stream: DataFrame,
    threshold: float = 0.4,
    planes: int = 3,
    dim: int = 64,
    n_tables: int = 16,
    ttl: str = "1 hour",
    max_bucket_vecs: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Streaming embedding-cosine near-dup pairs — the streaming twin of
    ``llm.similarity.cosine_pairs_lsh`` with the SAME deterministic
    hyperplanes (``_hyperplane_sign``), so a vector's (table, bucket)
    keys match the batch pipeline's exactly.

    Stateless hyperplane bucketing (n_tables keys per vector, pure
    expressions) feeds per-(table, bucket) ``applyInPandasWithState``
    groups whose state holds at most ``max_bucket_vecs`` resident
    embeddings. Arriving vectors verify against residents by EXACT
    cosine (precision 1, like batch; recall is the OR-construction
    1-(1-p^planes)^n_tables), emitting (earlier, newer, cos) pairs
    append-mode; a pair sharing several tables emits once per table
    (consumers ``dropDuplicates(["id_a","id_b"])``). State per bucket is
    O(max_bucket_vecs x dim) doubles; buckets expire lazily once the
    watermark passes last arrival + ttl."""
    import numpy as np
    import pandas as pd

    from weatherdb_spark.llm.similarity import _with_bucket_signature
    from weatherdb_spark.operators.timeline import _interval_seconds

    ttl_ms = _interval_seconds(ttl) * 1000
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # the batch pipeline's shared signature builder, so a vector's
    # (table, bucket) keys are bit-identical to cosine_pairs_lsh's —
    # and the plan builds with 3 higher-order expressions instead of
    # tables x planes per-plane trees (see _with_bucket_signature)
    keyed = _with_bucket_signature(
        stream.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(ts_col).alias("event_ts"),
            vec.alias("_v"),
        ),
        "_v", planes, n_tables, dim,
    ).select(
        "vec_id", "event_ts", F.col("_v").alias("vec"),
        F.posexplode(F.col("_sig")).alias("table", "bucket"),
    )

    def fn(key, pdf_iter, state) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        table = int(key[0])
        if state.exists:
            vec_ids, vecs = state.get
            vec_ids = list(vec_ids)
            vecs = list(vecs)
        else:
            vec_ids, vecs = [], []
        chunks = [pdf for pdf in pdf_iter]
        pdf = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1
            else chunks[0] if chunks else pd.DataFrame(
                columns=["vec_id", "event_ts", "vec"]
            )
        )
        pdf = pdf.sort_values(["event_ts", "vec_id"])
        out = []
        for vec_id, v in zip(pdf["vec_id"], pdf["vec"]):
            vec_id = int(vec_id)
            if vec_id in vec_ids:
                continue
            nv = np.asarray(list(v), dtype=np.float64)
            if len(nv) != dim:
                # a wrong dim would silently mis-slice every resident's
                # flattened embedding and emit garbage pairs
                raise ValueError(
                    f"embedding of vec_id {vec_id} has {len(nv)} "
                    f"components, expected dim={dim}"
                )
            n_nv = float(np.linalg.norm(nv))
            for i, resident in enumerate(vec_ids):
                rv = np.asarray(vecs[i * dim:(i + 1) * dim], dtype=np.float64)
                denom = n_nv * float(np.linalg.norm(rv))
                if denom == 0.0:
                    continue  # zero-norm vectors rank nowhere (try_divide twin)
                cos = float(np.dot(rv, nv) / denom)
                if cos >= threshold:
                    out.append((resident, vec_id, table, cos))
            if len(vec_ids) < max_bucket_vecs:
                vec_ids.append(vec_id)
                vecs.extend(float(x) for x in nv)
        state.update((vec_ids, vecs))
        last_ms = (
            int(pd.Timestamp(pdf["event_ts"].max()).value // 1_000_000)
            if len(pdf) else 0
        )
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs() + 1000, last_ms + ttl_ms)
        )
        if out:
            yield pd.DataFrame({
                "id_a": [r[0] for r in out],
                "id_b": [r[1] for r in out],
                "table": [r[2] for r in out],
                "cos": [r[3] for r in out],
            })

    return (
        keyed.withWatermark("event_ts", ttl)
        .groupBy("table", "bucket")
        .applyInPandasWithState(
            fn,
            outputStructType=_EMB_OUT_SCHEMA,
            stateStructType=_EMB_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


_SH_OUT_SCHEMA = T.StructType([
    T.StructField("id_a", T.LongType()),
    T.StructField("id_b", T.LongType()),
    T.StructField("block", T.IntegerType()),
    T.StructField("hamming", T.IntegerType()),
])
_SH_STATE_SCHEMA = T.StructType([
    T.StructField("doc_ids", T.ArrayType(T.LongType())),
    T.StructField("fps", T.ArrayType(T.LongType())),
])


def row_simhash_fingerprint(text_col: Column, bits: int = 32) -> Column:
    """Per-row SimHash fingerprint as a pure expression — the stateless
    twin of the batch ``llm.dedup.simhash`` (same tokens, same md5-int64
    hash, same ``(bit*2 - 1)`` weighting and ``> 0`` sign rule), so a
    document's streaming fingerprint is bit-identical to its batch one.
    The batch shape explodes tokens and aggregates per doc (two keyed
    shuffles); a stream computes the per-bit sums with per-row
    ``aggregate`` folds instead. NULL text yields a NULL fingerprint
    (the batch pipeline's explode simply drops such docs)."""
    hashed = F.transform(F.split(text_col, " "), md5_int64)
    zero = F.lit(0).cast("long")
    # one fold per bit; shiftright not division — the 60-bit token hash
    # exceeds double's 53-bit integer precision (see llm.dedup.simhash)
    bit_sums = [
        F.aggregate(
            hashed, zero,
            # bind i now: a late-bound closure would give every fold the
            # last bit index
            (lambda i: lambda acc, h:
                acc + (F.shiftright(h, i) % 2) * 2 - 1)(i),
        )
        for i in range(bits)
    ]
    fp = sum(
        [F.when(bit_sums[i] > 0, F.lit(2 ** i)).otherwise(zero)
         for i in range(bits)],
        zero,
    ).cast("bigint")
    # NULL text: the when() above would silently fold the NULL bit sums
    # to fingerprint 0 and pair every textless doc with every other —
    # the batch pipeline's explode drops them, so NULL mirrors that
    return F.when(text_col.isNull(), F.lit(None).cast("bigint")).otherwise(fp)


def stream_simhash_neardup(
    stream: DataFrame,
    max_hamming: int = 6,
    bits: int = 32,
    ttl: str = "1 hour",
    max_bucket_docs: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Streaming SimHash near-duplicate pairs — the streaming twin of
    ``llm.dedup.simhash_pairs_exact`` (multi-index pigeonhole hamming
    blocks, Norouzi et al. CVPR 2012), completing the streaming dedup
    family next to exact / MinHash / embedding-cosine.

    Stateless per-row fingerprints (:func:`row_simhash_fingerprint`,
    bit-identical to batch) explode into the SAME ``max_hamming + 1``
    pigeonhole block keys as the batch join (``llm.dedup.simhash_blocks``
    — by pigeonhole, two fingerprints within ``max_hamming`` agree on at
    least one whole block, so per-block state groups see every
    qualifying pair). Each (block, key) group holds at most
    ``max_bucket_docs`` resident (id, fingerprint) pairs — ONE long per
    resident, the cheapest state in the family — and arriving documents
    verify against residents by EXACT popcount hamming distance
    (precision 1, recall 1 up to the bucket cap / ttl bounds). Pairs
    agreeing on several blocks emit once per block; consumers
    ``dropDuplicates(["id_a", "id_b"])`` like the MinHash stream.

    SATURATION: each block's key is only ``bits // (max_hamming + 1)``
    wide, so a block has ``2^width`` buckets and its resident capacity
    per TTL window is ``2^width * max_bucket_docs``. At the 32-bit /
    max_hamming=6 defaults that is 16-32 buckets -> a few hundred
    residents per block: beyond that, pairs the batch join would find
    are silently dropped. For high-rate streams use ``bits=63`` (or
    raise ``max_bucket_docs``); a warning is logged whenever the
    narrowest block key is under 8 bits."""
    if not 0 < bits <= 63:
        # row_simhash_fingerprint builds at most 63 bits (bit 63 would
        # flip the bigint's sign); the generic core below handles full
        # 64-bit fingerprints for the image stream
        raise ValueError(f"bits ({bits}) must be in 1..63")
    fp = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(ts_col).alias("event_ts"),
        row_simhash_fingerprint(F.col(text_col), bits).alias("fp"),
    ).filter(F.col("fp").isNotNull())
    return _stream_fp_neardup(
        fp, max_hamming, bits, ttl, max_bucket_docs,
        caller="stream_simhash_neardup",
    )


def stream_image_neardup(
    stream: DataFrame,
    max_hamming: int = 6,
    ttl: str = "1 hour",
    max_bucket_docs: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Streaming IMAGE near-duplicate pairs — the multimodal member of
    the streaming dedup family, the stateless twin of
    ``llm.multimodal.image_neardup_pairs``: each arriving binary
    payload dHash-fingerprints per row (``llm.multimodal.dhash_bytes``
    — the single definition the batch pairs and the CorpusStore image
    index share, so all three bucket identically), explodes into the
    same ``max_hamming + 1`` pigeonhole block keys, and verifies
    against the per-(block, key) resident set by exact popcount.
    Re-encoded/rescaled copies of an image arriving in different
    micro-batches pair up; NULL and EMPTY payloads are dropped (no
    image, no comparison — the convention shared with
    ``image_neardup_pairs`` and the CorpusStore index, so all three
    produce the same pair set over the same rows). State per resident
    is one long; the saturation caveat of the SimHash stream applies,
    though at 64 fingerprint bits each block key is ~9 bits wide, so
    blocks saturate far later than the 32-bit text default."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from weatherdb_spark.llm.multimodal import dhash_bytes

    @pandas_udf(T.LongType())
    def _row_dhash(payloads):
        return payloads.map(
            lambda b: None if b is None or len(b) == 0
            else dhash_bytes(bytes(b)))

    fp = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(ts_col).alias("event_ts"),
        _row_dhash(F.col(payload_col)).alias("fp"),
    ).filter(F.col("fp").isNotNull())
    return _stream_fp_neardup(
        fp, max_hamming, 64, ttl, max_bucket_docs,
        caller="stream_image_neardup",
    )


def _stream_fp_neardup(
    fp: DataFrame,
    max_hamming: int,
    bits: int,
    ttl: str,
    max_bucket_docs: int,
    caller: str,
) -> DataFrame:
    """The shared stateful core of the fingerprint streams: ``fp`` is a
    streaming (doc_id long, event_ts, fp long) frame; block keys
    extract sign-safely (unsigned shift + mask — bit-identical to the
    old arithmetic form for the non-negative simhash fingerprints,
    required for the image stream's full-64-bit dHashes), residents
    verify by popcount over the xor masked to ``bits``."""
    import pandas as pd

    from weatherdb_spark.llm.dedup import (
        banded_fingerprint_keys,
        simhash_blocks,
    )
    from weatherdb_spark.operators.timeline import _interval_seconds

    ttl_ms = _interval_seconds(ttl) * 1000
    blocks = simhash_blocks(bits, max_hamming)
    min_width = min(width for _, _, width in blocks)
    if min_width < 8:
        logger.warning(
            "%s: narrowest pigeonhole block key is "
            "%d bits (%d buckets), so each block saturates at ~%d "
            "residents per TTL window and further pairs the batch join "
            "would find are dropped. For high-rate streams pass more "
            "fingerprint bits or a larger max_bucket_docs.",
            caller, min_width, 2 ** min_width,
            (2 ** min_width) * max_bucket_docs,
        )
    pop_mask = (1 << bits) - 1

    # THE shared block-key builder (llm.dedup) — the stream's buckets
    # cannot drift from the batch join's or the corpus index's
    banded = banded_fingerprint_keys(
        fp, "fp", max_hamming, bits, "doc_id", extra_cols=("event_ts",)
    )

    def fn(key, pdf_iter, state) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        block = int(key[0])
        if state.exists:
            doc_ids, fps = state.get
            doc_ids = list(doc_ids)
            fps = list(fps)
        else:
            doc_ids, fps = [], []
        chunks = [pdf for pdf in pdf_iter]
        pdf = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1
            else chunks[0] if chunks else pd.DataFrame(
                columns=["doc_id", "event_ts", "fp"]
            )
        )
        pdf = pdf.sort_values(["event_ts", "doc_id"])
        out = []
        for doc_id, doc_fp in zip(pdf["doc_id"], pdf["fp"]):
            doc_id = int(doc_id)
            if doc_id in doc_ids:
                continue  # micro-batch replay of a known resident
            doc_fp = int(doc_fp)
            for i, resident in enumerate(doc_ids):
                ham = bin((fps[i] ^ doc_fp) & pop_mask).count("1")
                if ham <= max_hamming:
                    out.append((resident, doc_id, block, ham))
            if len(doc_ids) < max_bucket_docs:
                doc_ids.append(doc_id)
                fps.append(doc_fp)
        state.update((doc_ids, fps))
        last_ms = (
            int(pd.Timestamp(pdf["event_ts"].max()).value // 1_000_000)
            if len(pdf) else 0
        )
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs() + 1000, last_ms + ttl_ms)
        )
        if out:
            yield pd.DataFrame({
                "id_a": [r[0] for r in out],
                "id_b": [r[1] for r in out],
                "block": [r[2] for r in out],
                "hamming": [r[3] for r in out],
            })

    return (
        banded.withWatermark("event_ts", ttl)
        .groupBy("block", "key")
        .applyInPandasWithState(
            fn,
            outputStructType=_SH_OUT_SCHEMA,
            stateStructType=_SH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def stream_decontaminate(
    stream: DataFrame,
    reference: DataFrame,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Decontamination AT INGEST: every arriving document checks against
    a STATIC reference corpus (an eval set) — the streaming twin of
    ``llm.dedup.minhash_contamination``, emitting append-mode
    (doc_id, ref_id, jaccard) matches with jaccard >= threshold.

    Fully STATELESS, unlike the self-join near-dup streams: the
    reference side is a static DataFrame (Spark re-plans the
    stream-static join per micro-batch, broadcasting an eval-set-sized
    reference), and the stream side computes signatures and shingles as
    pure per-row expressions (:func:`row_minhash_signature`,
    ``shingles_expr`` — bit-identical to batch by the shared constants).
    Cross-band dedup is MAP-SIDE: both sides carry their full band-key
    array and a pair survives only in the FIRST band whose keys agree
    (the cosine-LSH first-match trick), so no watermark, no
    dropDuplicates state, no ``applyInPandasWithState`` — a restart
    replays cleanly from the source offsets. Exact-Jaccard verify makes
    precision 1; recall is the banding's (~1 at 0.8+ with 8x4).
    """
    from weatherdb_spark.llm.dedup import (
        _banded_keys,
        minhash_signatures,
        shingles_expr,
        word_shingles,
    )

    rows = num_perm // bands

    from weatherdb_spark.llm.dedup import band_key_exprs

    def keys_from_sig(sig: Column) -> Column:
        # the shared encoding — byte-identical to _banded_keys' join key
        return F.array(*band_key_exprs(sig, bands, rows))

    # static reference: banded keys + full key array + shingles ride on
    # every (band, key) row — duplicated x bands, fine at eval-set size
    ref_sig = minhash_signatures(reference, num_perm, n, id_col, text_col)
    ref_keyed = ref_sig.select(
        F.col(id_col).alias("ref_id"),
        keys_from_sig(F.col("signature")).alias("_rkeys"),
    )
    ref_side = (
        _banded_keys(ref_sig, bands, rows, id_col)
        .select(F.col(id_col).alias("ref_id"), "band", "key")
        .join(ref_keyed, "ref_id")
        .join(
            word_shingles(reference, text_col, n).select(
                F.col(id_col).alias("ref_id"),
                F.col("shingles").alias("_sr"),
            ),
            "ref_id",
        )
    )

    sig = row_minhash_signature(F.col(text_col), num_perm, n)
    s = stream.select(
        F.col(id_col).alias("doc_id"),
        shingles_expr(F.col(text_col), n).alias("_sc"),
        keys_from_sig(sig).alias("_keys"),
    ).select(
        "doc_id", "_sc", "_keys",
        F.posexplode("_keys").alias("band", "key"),
    )
    first_match = F.array_position(
        F.zip_with(F.col("_keys"), F.col("_rkeys"), lambda a, b: a == b),
        True,
    )
    jaccard = F.round(
        F.size(F.array_intersect("_sc", "_sr"))
        / F.size(F.array_union("_sc", "_sr")),
        6,
    )
    return (
        s.join(ref_side, ["band", "key"])
        .filter(first_match == F.col("band") + 1)
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "ref_id", "jaccard")
    )


def stream_ngram_decontaminate(
    stream: DataFrame,
    reference: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    est_ref_ngrams: int | None = None,
) -> DataFrame:
    """N-gram collision decontamination AT INGEST — the streaming twin
    of ``llm.dedup.ngram_contamination`` and the third member of the
    stream-side family (exact / MinHash / n-gram): every arriving
    document's distinct word ``n``-grams check against the STATIC
    reference's n-gram hash set via a stream-static join.

    Emits one append-mode (doc_id, gram_hash) COLLISION EVENT per
    distinct colliding n-gram instead of the batch twin's per-doc
    count: a per-doc aggregate would need watermark + state, while the
    event stream is fully STATELESS (pure per-row shingle expressions
    shared with batch, reference side broadcast at eval-set size) and
    idempotent under replay; ``count_collision_events`` folds events to
    the batch operator's exact (doc_id, n_collisions) rows.

    The broadcast is size-gated like the batch twin's
    (``llm.dedup.NGRAM_REF_BROADCAST_MAX``): the reference is STATIC,
    so its distinct-hash count runs once at plan-build time (or comes
    from ``est_ref_ngrams``); a multi-benchmark reference above the
    gate joins un-hinted instead of forcing a driver-sized broadcast.
    """
    from weatherdb_spark.llm.dedup import NGRAM_REF_BROADCAST_MAX, shingles_expr
    from weatherdb_spark.llm.hashing import md5_int64

    if n < 1:
        raise ValueError(f"n must be positive, got {n}")
    ref_sh = (
        reference.select(
            F.explode(shingles_expr(F.col(text_col), n)).alias("_s")
        )
        .select(md5_int64(F.col("_s")).alias("gram_hash"))
        .distinct()
    )
    if est_ref_ngrams is None:
        # persist like the batch twin: the count's pass over the
        # reference populates the cache the stream-static join reuses
        # every micro-batch (without it the explode+distinct re-runs
        # for the gate AND per batch). scoped_persist degrades to a
        # plain persist outside a cache_scope — right for a long-lived
        # stream whose static side IS meant to stay resident.
        from weatherdb_spark.functions.caching import scoped_persist

        ref_sh = scoped_persist(ref_sh)
        est_ref_ngrams = ref_sh.count()
    if est_ref_ngrams <= NGRAM_REF_BROADCAST_MAX:
        ref_sh = F.broadcast(ref_sh)
    events = (
        stream.select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingles_expr(F.col(text_col), n)).alias("_s"),
        )
        .select("doc_id", md5_int64(F.col("_s")).alias("gram_hash"))
        .join(ref_sh, "gram_hash")
    )
    return events.select("doc_id", "gram_hash")


def count_collision_events(events: DataFrame) -> DataFrame:
    """Batch fold of :func:`stream_ngram_decontaminate`'s event stream
    into the batch operator's exact output: (doc_id, n_collisions)."""
    return events.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_collisions")
    )
