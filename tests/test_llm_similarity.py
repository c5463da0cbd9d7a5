"""Quality gates for the LSH cosine-pairs scale path.

The official registry row (embedding_cosine_pairs_lsh) value-matches a
DuckDB oracle that mirrors the identical plane/bucket/verify pipeline —
which proves determinism and cross-engine parity, but would also pass if
the bucketing collapsed recall (both sides would agree on a too-small
pair set). This gate pins the approximation quality against the brute
all-pairs ground truth (EXTRA embedding_cosine_pairs)."""

from __future__ import annotations

from tests.conftest import SF_DIR

from weatherdb_spark.llm.similarity import cosine_pairs, cosine_pairs_lsh
from weatherdb_spark.sources.testdata import load


def test_lsh_pairs_precision_one_recall_gated(spark):
    emb = load(spark, SF_DIR, "embeddings")
    brute = {
        (r.id_a, r.id_b)
        for r in cosine_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in cosine_pairs_lsh(emb, threshold=0.4).collect()
    }
    assert brute, "degenerate fixture: no brute pairs at threshold 0.4"
    # exact-verify construction: every emitted pair is a true pair
    assert lsh <= brute, f"false positives: {sorted(lsh - brute)[:5]}"
    recall = len(lsh & brute) / len(brute)
    # measured 0.88-0.93 at sf0.001/0.01 with the deterministic planes
    assert recall >= 0.7, f"LSH recall collapsed to {recall:.2f}"


def test_bucket_signature_matches_per_plane_form(spark):
    """The shared sign-matrix signature builder must produce exactly the
    per-plane _hyperplane_sign buckets — the streaming twin
    (streaming/neardup.py) and the mirrored DuckDB oracles both assume
    this equality bit-for-bit."""
    from pyspark.sql import functions as F

    from weatherdb_spark.llm.similarity import (
        _hyperplane_sign,
        _with_bucket_signature,
    )

    planes, n_tables, dim = 3, 16, 64
    emb = load(spark, SF_DIR, "embeddings").limit(50).select(
        "vec_id", F.col("embedding").alias("_v")
    )
    per_plane = F.array(*[
        sum(
            [_hyperplane_sign(F.col("_v"), t * planes + p, dim) * (2 ** p)
             for p in range(planes)],
            F.lit(0),
        )
        for t in range(n_tables)
    ])
    got = (
        _with_bucket_signature(emb, "_v", planes, n_tables, dim)
        .withColumn("_ref", per_plane)
        .select("vec_id", "_sig", "_ref")
        .collect()
    )
    assert got
    for r in got:
        assert r["_sig"] == r["_ref"], f"vec {r['vec_id']} diverged"


def test_ivf_index_build_probe_matches_adhoc(spark, tmp_path):
    """The persisted IVF index (build once, probe many) must return the
    SAME rows as the ad-hoc ivf_topk at identical (corpus, seed) — the
    quantizer is a pure function, the inverted file stores the same cell
    assignment, and the probe runs the same exact-cosine rank. The
    inverted-file scan must carry a static cell predicate so partition
    pruning keeps the probe at ~n_probe/n_cells of the data."""
    from pyspark.sql import functions as F

    from weatherdb_spark.llm.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
    )

    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=16, seed=42)

    adhoc = {tuple(r) for r in ivf_topk(emb, q, k=5, n_probe=7, seed=42).collect()}
    indexed_df = ivf_topk_indexed(spark, idx, q, k=5, n_probe=7)
    indexed = {tuple(r) for r in indexed_df.collect()}
    assert indexed == adhoc and indexed

    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    # the probed cells appear as a static partition filter on the scan
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1
    )[1][:200]

    # a rebuilt index on the same inputs is byte-stable in content:
    # same centroids, same assignment
    cent = spark.read.parquet(idx + "/centroids")
    assert cent.count() == 16
    inv = spark.read.parquet(idx + "/inverted")
    assert inv.count() == emb.count()
    assert inv.select("cell").distinct().count() <= 16


def test_semantic_dedup_keeps_one_representative_per_group(spark):
    import numpy as np

    from weatherdb_spark.llm.similarity import semantic_dedup

    rng = np.random.RandomState(7)
    base = rng.randn(4, 64)
    rows = []
    vid = 0
    for b in base:
        for _ in range(3):  # three near-copies of each base vector
            v = b + rng.randn(64) * 0.01
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, threshold=0.9, planes=2, n_tables=24).collect()
    by_comp: dict[int, list] = {}
    for r in out:
        by_comp.setdefault(r.component_id, []).append(r)
    # every group elects exactly its smallest id, sizes agree
    for comp, members in by_comp.items():
        kept = [r.vec_id for r in members if r.is_kept]
        assert kept == [comp] == [min(r.vec_id for r in members)]
        assert all(r.group_size == len(members) for r in members)
    # the four 3-copy clusters are found as four groups of three
    assert sorted(len(m) for m in by_comp.values()) == [3, 3, 3, 3]
