"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this container, so
the decode step is a deterministic fake behind the real Spark plumbing:
binary column -> mapInPandas with an explicit output schema -> typed
feature columns. The batch shape, schema handling and partitioning are
production-real; swap `_fake_decode` for PIL/librosa/ffmpeg at deploy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from weatherdb_spark.functions.partitioning import spread

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_byte", T.DoubleType()),
])


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive an opaque binary column (utf-8 payload) + media metadata —
    stands in for reading image/audio bytes from object storage."""
    return spread(df, "doc_id").select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image decoder.

    Real deployment replaces this with e.g. PIL.Image.open(BytesIO(b)).
    A missing payload (NULL binary column) decodes like an empty one —
    a None must not fail the whole Spark task.
    """
    n = len(payload) if payload is not None else 0
    width = n % 640
    height = (n * 7) % 480
    mean_byte = (sum(payload) / n) if n else 0.0
    return n, width, height, mean_byte


def decode_images(df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched, one pass, explicit schema.
    Input: (doc_id, payload binary); output: DECODED_SCHEMA."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "mean_byte": [round(d[3], 6) for d in decoded],
                }
            )

    return df.mapInPandas(_decode, DECODED_SCHEMA)


FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])

RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction plumbing: binary payload -> fixed-dim float
    embedding via mapInPandas. The featurizer is a deterministic fake
    (byte-value histogram, L2-normalized); real deployments swap in a
    model forward pass — batch shape and Arrow transfer are identical."""
    import numpy as np

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b or b""), dtype=np.uint8)
                hist = np.histogram(arr, bins=dim, range=(0, 256))[0].astype("float64")
                norm = float(np.linalg.norm(hist)) or 1.0
                # normalize in float64, quantize to float32 once at the end:
                # the output is then the correctly-rounded f32 of the f64
                # math (bit-reproducible by any engine's double->float cast)
                embs.append((hist / norm).astype("float32").tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "embedding": embs})

    return df.mapInPandas(_feat, FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize plumbing: payload -> fixed-size payload via mapInPandas. The
    resampler is a deterministic fake (byte subsample/pad to width*height);
    real deployments swap in PIL/cv2 — schema and batching are real."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                raw = bytes(b or b"")
                step = max(1, len(raw) // n)
                resized = raw[::step][:n].ljust(n, b"\x00")
                out.append(resized)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": width, "height": height, "payload": out,
            })

    return df.mapInPandas(_resize, RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: split a binary payload into fixed-size
    chunks with (doc_id, frame_no) keys — the explode pattern a video
    pipeline uses per keyframe. Stub: chunk boundaries only, no decode."""
    n = F.length("payload")
    # empty/NULL payloads yield ZERO frames: sequence(0, -1) would count
    # DOWN and emit spurious frame_no 0 and -1 rows
    frames = F.when(
        n > 0, F.sequence(F.lit(0), F.floor((n - 1) / every_n_bytes).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select("doc_id", "payload", F.explode(frames).alias("frame_no"))
    return exploded.select(
        "doc_id",
        "frame_no",
        F.expr(f"substring(payload, frame_no * {every_n_bytes} + 1, {every_n_bytes})")
        .alias("frame_bytes"),
    )


DHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("dhash", T.LongType()),
])

#: dHash grid: 8 rows x 9 columns of "pixels", 8 adjacent-pixel
#: comparisons per row -> a 64-bit fingerprint (the standard dHash
#: shape; Krawetz, "Kind of Like That", hackerfactor 2013).
_DHASH_ROWS = 8
_DHASH_COLS = 9


def dhash_grid(grid) -> int:
    """Hash a row-major 9x8 luminance grid (72 values, any ordered
    numeric sequence) to the signed-int64 dHash: bit r*8+c is 1 iff
    grid[r][c] < grid[r][c+1]. The gradient-compare half of the
    algorithm, factored out so EVERY decoder — the byte-subsample fake
    (:func:`dhash_bytes`) and a real grayscale-resize
    (:func:`pil_grayscale_grid`) — produces fingerprints through one
    definition (Krawetz 2013)."""
    h = 0
    bit = 0
    for r in range(_DHASH_ROWS):
        base = r * _DHASH_COLS
        for c in range(_DHASH_COLS - 1):
            if grid[base + c] < grid[base + c + 1]:
                h |= 1 << bit
            bit += 1
    if h >= 2 ** 63:          # wrap to signed int64
        h -= 2 ** 64
    return h


def dhash_bytes(raw: "bytes | None") -> int:
    """The DEFAULT dHash definition (bytes -> signed int64) shared by
    the batch :func:`dhash_images`, the streaming
    ``streaming.neardup.stream_image_neardup`` fingerprints, the
    CorpusStore image index, and any driver-side oracle — so all of
    them bucket identically. The 'decode' is the deterministic byte
    subsample (no image libraries in this container); the gradient
    hash itself is :func:`dhash_grid`. NULL/empty input hashes the
    zero grid (0)."""
    n = _DHASH_ROWS * _DHASH_COLS
    raw = bytes(raw or b"")
    step = max(1, len(raw) // n)
    g = raw[::step][:n].ljust(n, b"\x00")
    return dhash_grid(g)


def pil_grayscale_grid():
    """REAL image decoder for the ``decode=`` seam of
    :func:`dhash_images`: returns a ``bytes -> 72-value luminance
    grid`` callable backed by PIL (grayscale convert + 9x8 resize —
    the published dHash preprocessing), or raises ImportError where
    PIL is not installed (this container ships no image libraries; the
    byte-subsample default stays the deterministic fake). Undecodable
    payloads map to the zero grid rather than failing the Spark task —
    the same total-function convention as :func:`dhash_bytes`."""
    import io

    from PIL import Image  # gated: raises where PIL is absent

    zero = [0] * (_DHASH_ROWS * _DHASH_COLS)

    def decode(raw: "bytes | None"):
        if not raw:
            return zero
        try:
            img = Image.open(io.BytesIO(bytes(raw)))
            img = img.convert("L").resize(
                (_DHASH_COLS, _DHASH_ROWS), Image.BILINEAR
            )
        except Exception:
            return zero
        return list(img.getdata())  # row-major, 72 values

    return decode


def dhash_images(df: DataFrame, id_col: str = "doc_id",
                 decode=None) -> DataFrame:
    """Perceptual difference-hash fingerprint per image payload — the
    image twin of :func:`~weatherdb_spark.llm.dedup.simhash`: a 64-bit
    gradient signature that is STABLE under re-encoding, scaling, and
    mild edits, so near-duplicate images land within a small hamming
    distance. Arrow mapInPandas over the same fake-decode path as the
    other multimodal operators (the grid resampler is the
    :func:`resize_images` byte subsample; a real deployment swaps in
    PIL grayscale-resize to 9x8 — the hashing, batching, and schema
    stay identical).

    Bit r*8+c of the hash is 1 iff grid[r][c] < grid[r][c+1]; all 64
    bits are used, so the int64 may be NEGATIVE (bit 63) — downstream
    consumers must extract block keys unsigned
    (:func:`~weatherdb_spark.llm.dedup.hamming_pairs_exact` does).
    NULL/empty payloads hash the zero grid (hash 0) rather than failing
    the task, mirroring :func:`_fake_decode`. The hash itself is
    :func:`dhash_bytes` — the single definition the streaming twin and
    the corpus index share.

    ``decode`` swaps the fake byte-subsample decode for a REAL one: a
    ``bytes -> 72-value row-major luminance grid`` callable
    (:func:`pil_grayscale_grid` is the PIL-backed instance), hashed
    through the SAME :func:`dhash_grid` gradient compare — the
    declared swap-in point, now a parameter instead of a code edit.
    The callable ships in the mapInPandas closure (a task-binary
    constant, like the tokenizer vocabs). Default None keeps every
    fingerprint byte-identical to the stored indexes; mixing decoders
    against one persisted index would bucket two hash spaces together
    — rebuild the index when switching."""

    def _dh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode is None:
                hashes = [dhash_bytes(b) for b in pdf["payload"]]
            else:
                hashes = [dhash_grid(decode(b)) for b in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "dhash": hashes,
            })

    return df.mapInPandas(_dh, DHASH_SCHEMA)


def image_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    decode=None,
) -> DataFrame:
    """Near-duplicate image pairs: dHash fingerprints + the EXACT
    multi-index pigeonhole hamming join
    (:func:`~weatherdb_spark.llm.dedup.hamming_pairs_exact` — the same
    machinery the text SimHash family rides). Returns (id_a, id_b,
    hamming) for every pair within ``max_hamming`` differing bits —
    recall 1 by pigeonhole, no cross join at any corpus size: the
    fingerprint stream explodes into ``max_hamming + 1`` block keys and
    every shuffle is keyed. The standard image-dedup shape for a
    training pipeline: re-encoded/resized copies of one image share
    most gradient bits and surface here while text dedup sees only
    opaque bytes.

    NULL and EMPTY payloads participate in NO pairs (no image, no
    comparison) — the same convention as the CorpusStore image index
    and the streaming twin, so all three produce the same pair set
    over the same rows; :func:`dhash_images` itself stays total
    (hashes the zero grid) for callers that want raw fingerprints.
    ``decode`` passes through to :func:`dhash_images` — with a real
    decoder (:func:`pil_grayscale_grid`) a JPEG and its re-encode land
    within the radius through this same join."""
    from weatherdb_spark.llm.dedup import hamming_pairs_exact

    fp = dhash_images(
        df.filter(F.col("payload").isNotNull() & (F.length("payload") > 0))
        .select(F.col(id_col).alias("doc_id"), "payload"),
        decode=decode,
    )
    return hamming_pairs_exact(fp, "dhash", max_hamming, bits=64,
                               id_col="doc_id")
