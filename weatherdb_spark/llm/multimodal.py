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
    """
    n = len(payload)
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


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: split a binary payload into fixed-size
    chunks with (doc_id, frame_no) keys — the explode pattern a video
    pipeline uses per keyframe. Stub: chunk boundaries only, no decode."""
    n = F.length("payload")
    frames = F.sequence(F.lit(0), F.floor((n - 1) / every_n_bytes).cast("int"))
    exploded = df.select("doc_id", "payload", F.explode(frames).alias("frame_no"))
    return exploded.select(
        "doc_id",
        "frame_no",
        F.expr(f"substring(payload, frame_no * {every_n_bytes} + 1, {every_n_bytes})")
        .alias("frame_bytes"),
    )
