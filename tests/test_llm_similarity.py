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


def test_ivf_index_incremental_append_matches_fresh_build(spark, tmp_path):
    """append_to_ivf_index grows a serving index in O(batch): new
    vectors are assigned with the STORED centroids and appended
    partition-wise. Probes after two appends must be row-identical to
    a fresh build over the union AT THE SAME CENTROID SET, and the
    untouched cells' files must not be rewritten."""
    import os

    from pyspark.sql import functions as F

    from weatherdb_spark.llm.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_topk_indexed,
    )

    emb = load(spark, SF_DIR, "embeddings")
    part1 = emb.filter(F.col("vec_id") % 3 == 0)
    part2 = emb.filter(F.col("vec_id") % 3 == 1)
    part3 = emb.filter(F.col("vec_id") % 3 == 2)
    q = emb.filter(F.col("vec_id") < 8)

    grown = str(tmp_path / "grown")
    build_ivf_index(part1, grown, n_cells=16, seed=42)
    pre_files = {
        os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
        for r, _d, fs in os.walk(os.path.join(grown, "inverted"))
        for f in fs if f.endswith(".parquet")
    }
    append_to_ivf_index(spark, grown, part2)
    append_to_ivf_index(spark, grown, part3)
    # O(batch): every pre-existing inverted file still present, unmoved
    for p, mtime in pre_files.items():
        assert os.path.exists(p) and os.path.getmtime(p) == mtime, \
            f"append rewrote {p}"

    # fresh build over the union pinned to the STORED centroid set
    import numpy as np
    stored = np.array([
        list(r.centroid) for r in
        spark.read.parquet(os.path.join(grown, "centroids"))
        .sort("cell").collect()
    ])
    fresh = str(tmp_path / "fresh")
    build_ivf_index(emb, fresh, n_cells=16, centroids=stored)

    got = {tuple(r) for r in
           ivf_topk_indexed(spark, grown, q, k=5, n_probe=7).collect()}
    want = {tuple(r) for r in
            ivf_topk_indexed(spark, fresh, q, k=5, n_probe=7).collect()}
    assert got == want and got
    # the grown inverted file holds exactly the union
    assert spark.read.parquet(os.path.join(grown, "inverted")).count() \
        == emb.count()


def test_ivf_cell_stats_reports_every_cell_and_append_growth(spark, tmp_path):
    """The serving-index observability companion: one row per centroid
    (zero-filled for empty cells), shares summing to 1, and append
    growth visible — the signal that says rebuild when frozen centroids
    drift from the ingest distribution."""
    from pyspark.sql import functions as F

    from weatherdb_spark.llm.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_cell_stats,
    )

    emb = load(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), idx, n_cells=16)
    before = {r.cell: r.n_vectors for r in ivf_cell_stats(spark, idx).collect()}
    assert set(before) == set(range(16))          # every cell, zero-filled
    n_half = emb.filter(F.col("vec_id") % 2 == 0).count()
    assert sum(before.values()) == n_half

    append_to_ivf_index(spark, idx, emb.filter(F.col("vec_id") % 2 == 1))
    stats = ivf_cell_stats(spark, idx).collect()
    after = {r.cell: r.n_vectors for r in stats}
    assert sum(after.values()) == emb.count()
    assert all(after[c] >= before[c] for c in before)
    assert abs(sum(r.share for r in stats) - 1.0) < 1e-6


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


def test_semantic_dedup_quality_aware_keeper(spark):
    """keep_by elects the highest-ranked group member (SemDeDup-style
    'keep the best of the clump'), ties and all-NULL groups falling
    back to smallest id; the default path stays the smallest id."""
    import numpy as np

    from weatherdb_spark.llm.similarity import semantic_dedup

    rng = np.random.RandomState(11)
    base = rng.randn(3, 64)
    rows = []
    # group 0 (ids 0-2): designated best is id 2 (quality 0.9)
    # group 1 (ids 3-5): quality tie 0.5 between ids 3 and 5 -> keep 3
    # group 2 (ids 6-8): all-NULL quality -> keep smallest id 6
    quality = {0: 0.1, 1: 0.2, 2: 0.9,
               3: 0.5, 4: 0.4, 5: 0.5,
               6: None, 7: None, 8: None}
    vid = 0
    for b in base:
        for _ in range(3):
            v = b + rng.randn(64) * 0.01
            rows.append((vid, [float(x) for x in v], quality[vid]))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, quality double"
    )
    out = semantic_dedup(df, threshold=0.9, planes=2, n_tables=24,
                         keep_by="quality").collect()
    kept = {r.component_id: r.vec_id for r in out if r.is_kept}
    assert kept == {0: 2, 3: 3, 6: 6}
    # exactly one keeper per group; group sizes unchanged by the ranking
    by_comp: dict[int, list] = {}
    for r in out:
        by_comp.setdefault(r.component_id, []).append(r)
    for comp, members in by_comp.items():
        assert sum(r.is_kept for r in members) == 1
        assert all(r.group_size == 3 for r in members)
    # default path unchanged: smallest id kept
    default = semantic_dedup(df, threshold=0.9, planes=2, n_tables=24)
    assert {r.component_id: r.vec_id for r in default.collect()
            if r.is_kept} == {0: 0, 3: 3, 6: 6}
