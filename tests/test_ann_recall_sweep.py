"""ANN recall gates across corpus SHAPES, not just the driver fixture.

``ann_ivf_recall``/``ann_lsh_recall`` gate at one (planes, tables,
cells, probe) setting on the driver's uniform-random embeddings — the
worst case for cosine LSH but also only ONE distribution, so a tuning
change could overfit it. This sweep pins mean recall@5 on three corpus
shapes a real embedding table actually takes:

- ``uniform``: i.i.d. gaussian — tiny similarity margins, the hard case
  (measured: IVF 0.90, LSH 0.60 with the deterministic planes/quantizer).
- ``clustered``: 8 well-separated centers + noise — what trained
  embeddings look like (measured: both 1.0).
- ``duplicated``: 12 base vectors repeated with tiny jitter — the
  near-dup-heavy corpus dedup pipelines see (measured: both 1.0).

Every stage is deterministic (numpy seed, id-ordered k-means training,
hash-literal hyperplanes), so the measured values are exact across
environments; the gates sit below them with margin only for future
parameter retuning, which must keep ALL THREE shapes above water.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from weatherdb_spark.llm.similarity import (
    brute_topk,
    ivf_topk,
    lsh_bucket_topk,
    recall_vs_brute,
)

N, DIM, K, SEED = 300, 64, 5, 7


def _corpus(spark, shape: str):
    rng = np.random.RandomState(SEED)
    if shape == "uniform":
        m = rng.randn(N, DIM)
    elif shape == "clustered":
        centers = rng.randn(8, DIM) * 3.0
        m = centers[rng.randint(0, 8, N)] + rng.randn(N, DIM) * 0.3
    else:  # duplicated
        base = rng.randn(12, DIM)
        m = base[rng.randint(0, 12, N)] + rng.randn(N, DIM) * 0.01
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(m)],
        "vec_id long, embedding array<float>",
    )


# (shape, ivf_gate, lsh_gate) — measured 0.90/0.60 uniform, 1.0/1.0
# clustered and duplicated; gates leave retuning margin
SHAPES = [
    ("uniform", 0.6, 0.35),
    ("clustered", 0.9, 0.9),
    ("duplicated", 0.9, 0.9),
]


@pytest.mark.parametrize("shape,ivf_gate,lsh_gate", SHAPES)
def test_ann_recall_holds_across_corpus_shapes(spark, shape, ivf_gate, lsh_gate):
    emb = _corpus(spark, shape)
    q = emb.filter(F.col("vec_id") < 8)
    brute = brute_topk(emb, q, k=K)

    ivf = ivf_topk(emb, q, k=K, n_probe=7)
    ivf_recall = (
        recall_vs_brute(ivf, brute, q, k=K).agg(F.avg("recall")).first()[0]
    )
    assert ivf_recall >= ivf_gate, (
        f"IVF mean recall@{K} on {shape} corpus collapsed to "
        f"{ivf_recall:.2f} (gate {ivf_gate})"
    )

    lsh = lsh_bucket_topk(emb, q, k=K, planes=5, n_tables=16)
    lsh_recall = (
        recall_vs_brute(lsh, brute, q, k=K).agg(F.avg("recall")).first()[0]
    )
    assert lsh_recall >= lsh_gate, (
        f"LSH mean recall@{K} on {shape} corpus collapsed to "
        f"{lsh_recall:.2f} (gate {lsh_gate})"
    )
