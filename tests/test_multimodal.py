"""Multimodal plumbing unit tests: decode / feature-extract / resize /
frame-sample over opaque binary payloads (stubbed decoders, real Spark
schema/batch plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.llm.multimodal import (
    attach_binary_payload,
    decode_images,
    extract_features,
    frame_sample,
    resize_images,
)


@pytest.fixture()
def payloads(spark):
    docs = spark.createDataFrame(
        [(1, "short text"), (2, "a much longer text " * 20), (3, "x")],
        "doc_id long, text string",
    )
    return attach_binary_payload(docs)


def test_decode_schema_and_determinism(payloads):
    out = decode_images(payloads)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_bytes"] == len("short text")
    assert rows[1]["width"] == rows[1]["n_bytes"] % 640
    # deterministic: re-run gives identical values
    again = {r["doc_id"]: r for r in decode_images(payloads).collect()}
    assert rows[2]["mean_byte"] == again[2]["mean_byte"]


def test_extract_features_normalized(payloads):
    out = extract_features(payloads, dim=8)
    rows = {r["doc_id"]: r["embedding"] for r in out.collect()}
    assert all(len(v) == 8 for v in rows.values())
    norm = sum(x * x for x in rows[2]) ** 0.5
    assert abs(norm - 1.0) < 1e-5


def test_resize_fixed_size(payloads):
    out = resize_images(payloads, width=8, height=4)
    for r in out.collect():
        assert r["width"] == 8 and r["height"] == 4
        assert len(r["payload"]) == 32


def test_frame_sample_chunks(payloads):
    frames = frame_sample(payloads, every_n_bytes=16)
    n2 = frames.filter(F.col("doc_id") == 2).count()
    total = len("a much longer text " * 20)
    assert n2 == (total + 15) // 16
    # all but the last frame are full-size
    sizes = [
        r["len"] for r in frames.filter(F.col("doc_id") == 2)
        .select(F.length("frame_bytes").alias("len"), "frame_no")
        .orderBy("frame_no").collect()
    ]
    assert all(s == 16 for s in sizes[:-1]) and 0 < sizes[-1] <= 16
