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
    # same centroids, same assignment (read through the MVCC manifest)
    from weatherdb_spark.llm.similarity import _ivf_frames

    cent, inv = _ivf_frames(spark, idx)
    assert cent.count() == 16
    assert inv.count() == emb.count()
    assert inv.select("cell").distinct().count() <= 16


def test_ivf_index_incremental_append_matches_fresh_build(spark, tmp_path):
    """append_to_ivf_index grows a serving index in O(batch): new
    vectors are assigned with the STORED centroids and merged as a new
    MVCC snapshot in which every pre-existing file HARD-LINKS from the
    previous one (inode equality — no data pass). Probes after two
    appends must be row-identical to a fresh build over the union AT
    THE SAME CENTROID SET."""
    import os

    from pyspark.sql import functions as F

    from weatherdb_spark.broker import Broker
    from weatherdb_spark.llm.similarity import (
        IVF_INVERTED_TABLE,
        _ivf_frames,
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
    b = Broker(spark, grown)

    def _inodes():
        root = b.data_path(IVF_INVERTED_TABLE)
        return {
            os.path.relpath(os.path.join(r, f), root):
                os.stat(os.path.join(r, f)).st_ino
            for r, _d, fs in os.walk(root)
            for f in fs if f.endswith(".parquet")
        }

    pre = _inodes()
    append_to_ivf_index(spark, grown, part2)
    mid = _inodes()
    # O(batch): every pre-existing file enters the new snapshot as the
    # SAME inode (hard link), plus the batch's new files
    assert set(pre) <= set(mid)
    assert all(mid[p] == ino for p, ino in pre.items()), \
        "append rewrote an existing inverted file"
    assert len(mid) > len(pre)
    append_to_ivf_index(spark, grown, part3)

    # fresh build over the union pinned to the STORED centroid set
    import numpy as np
    cent_grown, inv_grown = _ivf_frames(spark, grown)
    stored = np.array([
        list(r.centroid) for r in cent_grown.sort("cell").collect()
    ])
    fresh = str(tmp_path / "fresh")
    build_ivf_index(emb, fresh, n_cells=16, centroids=stored)

    got = {tuple(r) for r in
           ivf_topk_indexed(spark, grown, q, k=5, n_probe=7).collect()}
    want = {tuple(r) for r in
            ivf_topk_indexed(spark, fresh, q, k=5, n_probe=7).collect()}
    assert got == want and got
    # the grown inverted file holds exactly the union
    assert inv_grown.count() == emb.count()


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


def test_ivf_append_crash_window_never_visible_to_probes(spark, tmp_path):
    """A crash mid-append (before the manifest flip) must leave the old
    snapshot authoritative: probes return exactly the pre-append rows —
    never a half-written bag — and the retried append converges with no
    duplication (the torn version dir is swept)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from weatherdb_spark.broker import Broker
    from weatherdb_spark.llm.similarity import (
        IVF_INVERTED_TABLE,
        _ivf_frames,
        append_to_ivf_index,
        build_ivf_index,
        ivf_topk_indexed,
    )

    emb = load(spark, SF_DIR, "embeddings")
    part1 = emb.filter(F.col("vec_id") % 2 == 0)
    part2 = emb.filter(F.col("vec_id") % 2 == 1)
    q = emb.filter(F.col("vec_id") < 8)
    idx = str(tmp_path / "ivf")
    build_ivf_index(part1, idx, n_cells=16, seed=42)
    before = {tuple(r) for r in
              ivf_topk_indexed(spark, idx, q, k=5, n_probe=7).collect()}
    n_before = _ivf_frames(spark, idx)[1].count()

    real_flip = Broker._flip_manifest

    def torn_flip(self, table, version, **kw):
        if table == IVF_INVERTED_TABLE:
            raise RuntimeError("simulated crash before the flip")
        return real_flip(self, table, version, **kw)

    Broker._flip_manifest = torn_flip
    try:
        with _pytest.raises(RuntimeError, match="simulated crash"):
            append_to_ivf_index(spark, idx, part2)
    finally:
        Broker._flip_manifest = real_flip

    # the torn append is INVISIBLE: same rows, same probe results
    assert _ivf_frames(spark, idx)[1].count() == n_before
    assert {tuple(r) for r in
            ivf_topk_indexed(spark, idx, q, k=5, n_probe=7).collect()} \
        == before

    # the retry sweeps the torn version dir and lands exactly once
    append_to_ivf_index(spark, idx, part2)
    assert _ivf_frames(spark, idx)[1].count() == emb.count()


def test_ivf_compaction_folds_small_files_probe_identical(spark, tmp_path):
    """Appends accumulate files per touched cell; compact_ivf_index
    folds them to one file per leaf with row-identical probes — the
    small-file counter-move (the corpus compact_epochs twin)."""
    import os

    from pyspark.sql import functions as F

    from weatherdb_spark.broker import Broker
    from weatherdb_spark.llm.similarity import (
        IVF_INVERTED_TABLE,
        _ivf_frames,
        append_to_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        ivf_topk_indexed,
    )

    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") % 4 == 0), idx,
                    n_cells=8, seed=42)
    for m in (1, 2, 3):
        append_to_ivf_index(spark, idx, emb.filter(F.col("vec_id") % 4 == m))
    b = Broker(spark, idx)

    def _max_per_leaf():
        return b._max_files_per_leaf(IVF_INVERTED_TABLE)

    assert _max_per_leaf() > 2, "fixture failed to fragment the index"
    before = {tuple(r) for r in
              ivf_topk_indexed(spark, idx, q, k=5, n_probe=5).collect()}
    res = compact_ivf_index(spark, idx)
    assert IVF_INVERTED_TABLE in res
    f_before, f_after = res[IVF_INVERTED_TABLE]
    assert f_after < f_before
    assert _max_per_leaf() == 1
    # partition layout preserved (probes stay pruned) + rows identical
    root = b.data_path(IVF_INVERTED_TABLE)
    assert any(e.startswith("cell=") for e in os.listdir(root))
    assert {tuple(r) for r in
            ivf_topk_indexed(spark, idx, q, k=5, n_probe=5).collect()} \
        == before
    assert _ivf_frames(spark, idx)[1].count() == emb.count()


def test_ivf_legacy_raw_layout_reads_and_migrates_on_append(spark, tmp_path):
    """A pre-r8 index (raw centroids/ + inverted/ parquet, no manifest)
    stays readable, and the first append migrates it into the broker
    layout once — identical probe rows, raw dirs retired."""
    import os

    from pyspark.sql import functions as F

    from weatherdb_spark.llm.similarity import (
        IVF_INVERTED_TABLE,
        _ivf_frames,
        append_to_ivf_index,
        build_ivf_index,
        ivf_topk_indexed,
    )

    emb = load(spark, SF_DIR, "embeddings")
    part1 = emb.filter(F.col("vec_id") % 2 == 0)
    q = emb.filter(F.col("vec_id") < 8)
    src = str(tmp_path / "src")
    build_ivf_index(part1, src, n_cells=16, seed=42)
    cent, inv = _ivf_frames(spark, src)

    legacy = str(tmp_path / "legacy")
    cent.write.parquet(os.path.join(legacy, "centroids"))
    inv.write.partitionBy("cell").parquet(os.path.join(legacy, "inverted"))

    before = {tuple(r) for r in
              ivf_topk_indexed(spark, legacy, q, k=5, n_probe=7).collect()}
    assert before  # raw-layout fallback read works

    # empty append: pure migration, zero new rows
    append_to_ivf_index(spark, legacy, part1.limit(0))
    assert not os.path.isdir(os.path.join(legacy, "inverted"))
    assert {tuple(r) for r in
            ivf_topk_indexed(spark, legacy, q, k=5, n_probe=7).collect()} \
        == before
    assert _ivf_frames(spark, legacy)[1].count() == part1.count()

    # and a real append lands on the migrated layout
    part2 = emb.filter(F.col("vec_id") % 2 == 1)
    append_to_ivf_index(spark, legacy, part2)
    assert _ivf_frames(spark, legacy)[1].count() == emb.count()


def test_check_ivf_index_flags_drifted_append(spark, tmp_path, capsys):
    """The rebuild policy: a balanced index passes; a skewed append
    (frozen centroids, drifted ingest) pushes one cell's share over the
    threshold and flips rebuild_recommended. CLI prints the same JSON."""
    from pyspark.sql import functions as F

    from weatherdb_spark.cli import main
    from weatherdb_spark.llm.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        check_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=8, seed=42)
    calm = check_ivf_index(spark, idx, max_top_share=0.8)
    assert calm["rebuild_recommended"] is False
    assert calm["n_cells"] == 8 and calm["n_vectors"] == emb.count()

    # drifted ingest: thousands of copies of ONE vector pile into one
    # cell (assignment is frozen at the stored centroids)
    one = emb.limit(1).collect()[0]
    skew = spark.createDataFrame(
        [(100000 + i, one.embedding) for i in range(4 * emb.count())],
        "vec_id long, embedding array<float>",
    )
    append_to_ivf_index(spark, idx, skew)
    drifted = check_ivf_index(spark, idx, max_top_share=0.8)
    assert drifted["rebuild_recommended"] is True
    assert drifted["top_share"] > 0.8

    # explicit-threshold validation + default threshold shape
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_top_share"):
        check_ivf_index(spark, idx, max_top_share=1.5)
    dflt = check_ivf_index(spark, idx)
    assert dflt["max_top_share"] == 0.5  # 4 / 8 cells

    # CLI hook prints the decision as one JSON line
    import json as _json
    assert main(["check-ivf-index", "--index-path", idx,
                 "--max-top-share", "0.8"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert _json.loads(out)["rebuild_recommended"] is True
    assert main(["compact-ivf-index", "--index-path", idx]) == 0


def test_ivf_rebuild_torn_window_never_mixes_tables(spark, tmp_path,
                                                    monkeypatch):
    """A rebuild (build_ivf_index over a live index) flips TWO tables;
    probes resolve the index-level pair manifest in one read, so a probe
    at any point during the rebuild sees either the full old index or
    the full new one — never the new centroids with the old inverted
    file — and a crash between the table flips, or after both but
    before the pair flip, leaves the old index authoritative. The retry
    converges on the fresh-build result."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from weatherdb_spark.broker import Broker
    from weatherdb_spark.llm import similarity as sim

    emb = load(spark, SF_DIR, "embeddings")
    part1 = emb.filter(F.col("vec_id") % 2 == 0)
    q = emb.filter(F.col("vec_id") < 8)
    idx = str(tmp_path / "ivf")

    def probe():
        return {tuple(r) for r in
                sim.ivf_topk_indexed(spark, idx, q, k=5, n_probe=7).collect()}

    sim.build_ivf_index(part1, idx, n_cells=16, seed=42)
    before = probe()

    # the rebuild moves BOTH tables: full corpus, new seed (new centroids)
    real_flip = Broker._flip_manifest
    mid_window: list[set] = []

    def torn_flip(self, table, version, **kw):
        if table == sim.IVF_INVERTED_TABLE and not mid_window:
            # the exact torn window: the centroids table manifest
            # already points at the NEW centroids, the inverted table
            # (and the pair manifest) still at the old index
            mid_window.append(probe())
            raise RuntimeError("simulated crash between the table flips")
        return real_flip(self, table, version, **kw)

    monkeypatch.setattr(Broker, "_flip_manifest", torn_flip)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        sim.build_ivf_index(emb, idx, n_cells=16, seed=7)
    monkeypatch.setattr(Broker, "_flip_manifest", real_flip)

    assert mid_window[0] == before, \
        "probe during the rebuild mixed new centroids with the old inverted"
    assert probe() == before, "crashed rebuild leaked a partial index"

    # second crash shape: BOTH table snapshots flipped, pair flip lost —
    # the pair manifest is the sole commit point, so probes still see
    # the full old index (and the pinned old snapshots survive cleanup)
    def no_pair_flip(broker, index_path):
        raise RuntimeError("simulated crash before the pair flip")

    monkeypatch.setattr(sim, "_flip_ivf_manifest", no_pair_flip)
    with _pytest.raises(RuntimeError, match="pair flip"):
        sim.build_ivf_index(emb, idx, n_cells=16, seed=7)
    monkeypatch.undo()
    assert probe() == before, \
        "probe saw an unpublished rebuild (pair flip is the commit point)"

    # the retry publishes: identical to a fresh build at the same params
    sim.build_ivf_index(emb, idx, n_cells=16, seed=7)
    fresh = str(tmp_path / "fresh")
    sim.build_ivf_index(emb, fresh, n_cells=16, seed=7)
    expect = {tuple(r) for r in
              sim.ivf_topk_indexed(spark, fresh, q, k=5, n_probe=7).collect()}
    assert probe() == expect
    assert probe() != before  # the rebuild genuinely changed the index


def test_compact_on_missing_index_leaves_no_ghost_pair_manifest(
        spark, tmp_path):
    """compact_ivf_index against a path with no index must stay a no-op:
    the pair-manifest flip skips when there is nothing to pin (a null
    pair on disk would make every later probe take the manifest branch
    and die on the missing tables instead of the designed error), and a
    stale/foreign pair file next to no tables is likewise ignored."""
    import json as _json
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from weatherdb_spark.llm.similarity import (
        IVF_INDEX_MANIFEST,
        compact_ivf_index,
        ivf_topk_indexed,
    )

    q = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 3)
    empty = str(tmp_path / "nothing")
    assert compact_ivf_index(spark, empty) == {}
    assert not os.path.exists(os.path.join(empty, IVF_INDEX_MANIFEST))
    with _pytest.raises(ValueError, match="no IVF index"):
        ivf_topk_indexed(spark, empty, q, k=3)

    # a stale pair file with no tables behind it: same designed error
    stale = str(tmp_path / "stale")
    os.makedirs(stale)
    with open(os.path.join(stale, IVF_INDEX_MANIFEST), "w") as fh:
        _json.dump({"centroids_version": 1, "inverted_version": 1}, fh)
    with _pytest.raises(ValueError, match="no IVF index"):
        ivf_topk_indexed(spark, stale, q, k=3)

    # a CORRUPT pair file (truncated copy, disk-full) degrades to the
    # per-table-manifest fallback instead of JSONDecodeError-ing every
    # probe: a live index stays probeable, and the next write repairs
    # the manifest
    from weatherdb_spark.llm.similarity import (
        append_to_ivf_index,
        build_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings")
    live = str(tmp_path / "live")
    build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), live,
                    n_cells=8, seed=42)
    expect = {tuple(r) for r in
              ivf_topk_indexed(spark, live, q, k=3, n_probe=3).collect()}
    with open(os.path.join(live, IVF_INDEX_MANIFEST), "w") as fh:
        fh.write("{not json")
    got = {tuple(r) for r in
           ivf_topk_indexed(spark, live, q, k=3, n_probe=3).collect()}
    assert got == expect
    append_to_ivf_index(spark, live, emb.filter(F.col("vec_id") % 2 == 1))
    with open(os.path.join(live, IVF_INDEX_MANIFEST)) as fh:
        repaired = _json.load(fh)
    assert repaired["inverted_version"] is not None


def test_semantic_dedup_dim_passthrough(spark):
    """semantic_dedup(dim=) must reach the pair stage's hyperplane
    signatures. The projection is aggregate(zip_with(vec, signs)) and
    zip_with NULL-pads the shorter array, so hashing d-dim vectors
    against longer sign arrays NULLs every bucket key and recall
    silently collapses to zero (no error, no pairs) — exactly what the
    2M-vector stress lap measured for two rounds before r9 matched the
    dims. Pins both directions so neither can regress silently."""
    from pyspark.sql import functions as F

    from weatherdb_spark.llm.similarity import semantic_dedup

    dim = 16
    # 6 exact-duplicate twin pairs (floor(id/2) groups) covering all 12
    # ids, all unit-ish vectors
    emb = spark.range(12).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.floor(F.col("id") / 2) * 37 + i * 11) % 13
            / 13.0 + 0.1,
        ).alias("embedding"),
    )
    matched = semantic_dedup(
        emb, threshold=0.99, planes=4, n_tables=4, dim=dim
    ).collect()
    # every id shares its floor(id/2) twin: 6 groups of 2, all kept ids
    # are the even (smaller) member
    assert {(r.vec_id, r.component_id) for r in matched} == {
        (i, i - i % 2) for i in range(12)
    }
    # the footgun direction: a longer sign array (the default dim=64)
    # used to NULL-pad every projection -> zero pairs, zero rows, NO
    # error; since r10 _with_bucket_signature raises on the mismatch
    import pytest

    with pytest.raises(Exception, match="dim mismatch"):
        semantic_dedup(
            emb, threshold=0.99, planes=4, n_tables=4
        ).collect()
