"""CorpusStore end-to-end invariants: dedup-at-append (exact /
near / semantic / image), MVCC epoch layout (O(batch) hard-linked
appends, compaction, self-healing side tables, legacy migration), the
rejection audit log, and the streaming bridge. Split out of
test_llm_packing.py so partest's per-FILE sharding doesn't serialize
the whole LLM family behind one shard (round-8 verdict ask #8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _unit_vec(seed: int, dim: int = 64, jitter: float = 0.0):
    """Deterministic 64-dim unit vector; jitter rotates it slightly so
    two vectors at the same seed are near- (not exactly) identical."""
    import math
    import random

    rng = random.Random(seed)
    v = [rng.uniform(-1, 1) for _ in range(dim)]
    if jitter:
        v = [x + jitter * ((i % 2) * 2 - 1) for i, x in enumerate(v)]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]

def test_corpus_store_dedup_at_append_and_time_travel(spark, tmp_path):
    """CorpusStore: MVCC corpus snapshots with dedup AT APPEND — the
    incremental corpus-management shape (batch checks first, then the
    asymmetric archive checks; every drop logged with its reason)."""
    from weatherdb_spark.llm.corpus import CorpusStore

    # baseline the persisted-RDD set: earlier tests in the shared
    # session may hold scope-less persists or lingering localCheckpoint
    # RDDs (e.g. connected-components runs); the hygiene claim below is
    # about what THIS test's appends add, so assert on the delta
    spark.catalog.clearCache()
    _baseline = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    store = CorpusStore(spark, str(tmp_path / "wh"), near_threshold=0.8)
    base = "the quick brown fox jumps over the lazy dog by the river today"
    b1 = spark.createDataFrame(
        [(1, base, "s1"),
         (2, "totally different words entirely here now ok", "s1"),
         (3, base, "s2")],                      # exact dup of 1 in-batch
        "doc_id long, text string, source string")
    assert store.append(b1) == {"admitted": 2, "rejected": 1, "version": 1}

    b2 = spark.createDataFrame(
        [(10, base, "s3"),                      # exact vs archive
         (11, base + " extra", "s3"),           # ALSO near dup of 10 in-batch
         (12, "fresh unique content nothing like the others at all", "s3")],
        "doc_id long, text string, source string")
    assert store.append(b2) == {"admitted": 1, "rejected": 2, "version": 2}
    # time travel: the immediately previous snapshot is retained
    # (Broker MVCC contract; older ones are vacuum-reclaimed)
    assert store.read(version=1).count() == 2

    b3 = spark.createDataFrame(
        [(20, base + " extra2", "s4")],         # near dup vs archive ONLY
        "doc_id long, text string, source string")
    assert store.append(b3) == {"admitted": 0, "rejected": 1, "version": 3}

    assert store.read().count() == 3
    assert store.read(version=2).count() == 3
    # r9 retention: ALL recently superseded snapshots stay time-
    # travelable until the retention window passes (the write path used
    # to keep exactly current+previous; see
    # test_snapshot_retention_protects_slow_readers)
    assert store.versions() == [1, 2, 3]
    # cache hygiene: appends leave NOTHING persisted (scoped_persist +
    # cache_scope, not localCheckpoint — the latter lingered until GC).
    # unpersist is async (blocking=False), so poll briefly.
    import time as _time

    def _new_rdds():
        ids = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
        return ids - _baseline

    for _ in range(50):
        if not _new_rdds():
            break
        _time.sleep(0.1)
    assert not _new_rdds()
    reasons = {(r.doc_id, r.reason, r.blocked_by)
               for r in store.rejections().collect()}
    assert reasons == {
        (3, "batch_exact", 1),     # kept copy named in the audit trail
        (10, "archive_exact", 1),
        (11, "batch_near", 10),
        (20, "archive_near", 1),
    }


def test_stream_into_corpus_cross_batch_dedup(spark, tmp_path):
    """Documents arriving in different micro-batches dedup against each
    other through the CorpusStore archive — warehouse-backed, stateless,
    and idempotent under replay (a replayed doc is an exact dup of its
    own archived copy)."""
    import os

    import pandas as pd

    from weatherdb_spark.llm.corpus import CorpusStore, stream_into_corpus

    base = "the quick brown fox jumps over the lazy dog by the river today"
    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame({"doc_id": [1, 2],
                  "text": [base, "totally different words entirely here"]}
                 ).to_csv(src / "a.csv", index=False)
    pd.DataFrame({"doc_id": [3, 4],
                  "text": [base + " extra",  # near-dup of batch-1 doc
                           "fresh unique content nothing like the others"]}
                 ).to_csv(src / "b.csv", index=False)
    os.utime(src / "a.csv", (1_700_000_000, 1_700_000_000))
    os.utime(src / "b.csv", (1_700_000_100, 1_700_000_100))

    store = CorpusStore(spark, str(tmp_path / "wh"), near_threshold=0.8)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("header", "true").option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    stream_into_corpus(stream, store, str(tmp_path / "ck"))
    assert {r.doc_id for r in store.read().collect()} == {1, 2, 4}
    rej = {(r.doc_id, r.reason, r.blocked_by)
           for r in store.rejections().collect()}
    assert rej == {(3, "archive_near", 1)}   # caught ACROSS batches


def test_corpus_append_is_o_batch_with_hardlinked_epochs(spark, tmp_path):
    """The epoch-partitioned append contract: each append materializes
    ONLY its own ingest_epoch leaf; every archived epoch's files enter
    the new snapshot as HARD LINKS of the previous snapshot's —
    byte-identical with no data pass (inode equality, the tree-hash
    twin of the data-fix rung's untouched-table check)."""
    import hashlib
    import os

    from weatherdb_spark.llm.corpus import DOCS_TABLE, CorpusStore

    def _tree_hash(root):
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(f for f in filenames if f.endswith(".parquet")):
                p = os.path.join(dirpath, fn)
                h.update(os.path.relpath(p, root).encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
        return h.hexdigest()

    store = CorpusStore(spark, str(tmp_path / "wh"))
    b = store.broker
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    store.append(mk([(1, "one unique doc of words"),
                     (2, "another set of other words")]))
    v1_leaf = os.path.join(b.data_path(DOCS_TABLE, 1), "ingest_epoch=1")
    before = _tree_hash(v1_leaf)
    inodes = {f: os.stat(os.path.join(v1_leaf, f)).st_ino
              for f in os.listdir(v1_leaf) if f.endswith(".parquet")}

    store.append(mk([(3, "a third thing entirely fresh")]))
    v2 = b.data_path(DOCS_TABLE, 2)
    linked = os.path.join(v2, "ingest_epoch=1")
    # byte-identical AND the very same inodes: a hard link, not a copy
    assert _tree_hash(linked) == before
    for f, ino in inodes.items():
        assert os.stat(os.path.join(linked, f)).st_ino == ino, \
            f"epoch-1 file {f} was rewritten, not linked"
    assert os.path.isdir(os.path.join(v2, "ingest_epoch=2"))
    # reads see the union, epochs recoverable on demand
    assert store.read().count() == 3
    assert {r.ingest_epoch for r in
            store.read(with_epoch=True).collect()} == {1, 2}
    # misuse guard: an already-written epoch value must not be shadowed
    import pytest as _pytest
    with _pytest.raises(ValueError, match="fresh"):
        b.write_partition_append(DOCS_TABLE, mk([(9, "x")]),
                                 "ingest_epoch", 2)


def test_compact_epochs_folds_old_leaves_and_keeps_semantics(spark, tmp_path):
    """compact_epochs bounds leaf-count growth: after thousands of
    appends the folded tail becomes ONE leaf per table (docs + both
    signature side tables, same epoch set — the sync invariant holds),
    the kept recent epochs hard-link untouched, content and archive
    dedup are unchanged, and appending continues normally."""
    import os

    from pyspark.sql import functions as F

    from weatherdb_spark.llm.corpus import (
        BANDS_TABLE,
        DOCS_TABLE,
        HASH_TABLE,
        CorpusStore,
    )

    store = CorpusStore(spark, str(tmp_path / "wh"))
    for lo in (0, 100, 200, 300, 400):
        store.append(spark.range(lo, lo + 20).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("unique doc words "), F.col("id").cast("string"))
            .alias("text")))
    assert store._epoch_values(DOCS_TABLE) == {1, 2, 3, 4, 5}
    kept_leaf = os.path.join(store.broker.data_path(DOCS_TABLE),
                             "ingest_epoch=5")
    kept_ino = {f: os.stat(os.path.join(kept_leaf, f)).st_ino
                for f in os.listdir(kept_leaf) if f.endswith(".parquet")}

    out = store.compact_epochs(keep_last=2)
    assert out == {"folded": 3, "into_epoch": 3}
    for t in (DOCS_TABLE, HASH_TABLE, BANDS_TABLE):
        assert store._epoch_values(t) == {3, 4, 5}, t
    # content identical; kept epochs hard-linked, not rewritten
    assert store.read().count() == 100
    assert {r.ingest_epoch for r in store.read(with_epoch=True)
            .filter(F.col("doc_id") < 60).collect()} == {3}
    new_kept = os.path.join(store.broker.data_path(DOCS_TABLE),
                            "ingest_epoch=5")
    for f, ino in kept_ino.items():
        assert os.stat(os.path.join(new_kept, f)).st_ino == ino

    # archive dedup still sees the folded docs (index folded alongside)
    out2 = store.append(spark.createDataFrame(
        [(900, "unique doc words 0"),         # exact dup of folded doc 0
         (901, "entirely new final words")],
        "doc_id long, text string"))
    assert out2["admitted"] == 1
    assert (900, "archive_exact", 0) in {
        (r.doc_id, r.reason, r.blocked_by)
        for r in store.rejections().collect()}
    # nothing-to-do path
    fresh = CorpusStore(spark, str(tmp_path / "wh2"))
    fresh.append(spark.createDataFrame([(1, "only words")],
                                       "doc_id long, text string"))
    assert fresh.compact_epochs()["folded"] == 0


def test_compact_epochs_stops_at_unindexed_crash_gap(spark, tmp_path):
    """Folding must never rename away an epoch the signature index has
    not seen (a crash between the corpus flip and the side-table
    flips): if it did, the epoch sets would match and the sync diff
    could never backfill the missing signatures — silent dedup misses
    forever. compact_epochs stops at the gap; the next append heals it
    via sync, after which it folds normally."""
    from pyspark.sql import functions as F

    from weatherdb_spark.llm.corpus import DOCS_TABLE, HASH_TABLE, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    for lo in (0, 100):
        store.append(spark.range(lo, lo + 10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("words "), F.col("id").cast("string")).alias("text")))
    ghost = "an epoch the index never saw"
    store.broker.write_partition_append(   # the crash-window state
        DOCS_TABLE,
        spark.createDataFrame([(500, ghost)], "doc_id long, text string"),
        "ingest_epoch", 3,
    )
    # fold-everything must stop BEFORE the un-indexed epoch 3
    out = store.compact_epochs(keep_last=0)
    assert out == {"folded": 2, "into_epoch": 2}
    assert store._epoch_values(DOCS_TABLE) == {2, 3}
    assert store._epoch_values(HASH_TABLE) == {2}   # gap still visible
    # the next append self-heals epoch 3 and the dup is caught
    res = store.append(spark.createDataFrame(
        [(600, ghost)], "doc_id long, text string"))
    assert res["admitted"] == 0
    # healed: now the whole tail folds
    assert store.compact_epochs(keep_last=0)["folded"] >= 2
    assert store.read().count() == 21


def test_vacuum_compacts_per_epoch_and_keeps_the_layout(spark, tmp_path):
    """Vacuum on an epoch-partitioned corpus compacts each epoch LEAF to
    one file but keeps the epoch dirs — a flat rewrite would lose the
    pruning key and force the next append back through the legacy
    migration. Values, epochs, and the link-on-append contract survive."""
    import os

    from pyspark.sql import functions as F

    from weatherdb_spark.llm.corpus import DOCS_TABLE, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    for lo in (0, 100, 200):
        store.append(
            spark.range(lo, lo + 50).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("doc words "), F.col("id").cast("string"))
                .alias("text"),
            )
        )
    before = {r.doc_id: r.ingest_epoch
              for r in store.read(with_epoch=True).collect()}
    res = store.broker.vacuum(max_files_per_bucket=0)
    assert DOCS_TABLE in res
    root = store.broker.data_path(DOCS_TABLE)
    leaves = sorted(e for e in os.listdir(root) if e.startswith("ingest_epoch="))
    assert leaves == ["ingest_epoch=1", "ingest_epoch=2", "ingest_epoch=3"]
    for leaf in leaves:
        n = sum(f.endswith(".parquet")
                for f in os.listdir(os.path.join(root, leaf)))
        assert n == 1, f"{leaf} has {n} files after compaction"
    assert {r.doc_id: r.ingest_epoch
            for r in store.read(with_epoch=True).collect()} == before
    # the compacted layout still link-appends (no re-migration)
    assert store.broker._is_partitioned_by(DOCS_TABLE, "ingest_epoch")
    store.append(spark.createDataFrame(
        [(999, "a totally new final doc")], "doc_id long, text string"))
    assert store.read().count() == 151


def test_corpus_store_migrates_legacy_flat_layout_once(spark, tmp_path):
    """A corpus written by a pre-epoch engine (flat snapshot, no
    ingest_epoch dirs) migrates on its first append: the legacy rows
    land once under ingest_epoch=0, the batch under its own epoch, and
    the NEXT append hard-links both — O(batch) from then on."""
    import os

    from weatherdb_spark.llm.corpus import DOCS_TABLE, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    legacy = spark.createDataFrame(
        [(1, "the old corpus doc of words"), (2, "a second archived doc")],
        "doc_id long, text string",
    )
    store.broker.write(DOCS_TABLE, legacy)          # the pre-epoch layout
    assert not store.broker._is_partitioned_by(DOCS_TABLE, "ingest_epoch")

    out = store.append(spark.createDataFrame(
        [(3, "a brand new third document"),
         (1, "the old corpus doc of words")],      # exact dup vs archive
        "doc_id long, text string",
    ))
    assert out == {"admitted": 1, "rejected": 1, "version": 2}
    v2 = store.broker.data_path(DOCS_TABLE, 2)
    assert os.path.isdir(os.path.join(v2, "ingest_epoch=0"))
    assert os.path.isdir(os.path.join(v2, "ingest_epoch=2"))
    assert store.read().count() == 3
    assert {r.doc_id: r.ingest_epoch
            for r in store.read(with_epoch=True).collect()} \
        == {1: 0, 2: 0, 3: 2}
    # next append links the migrated epoch instead of rewriting it
    ino = {f: os.stat(os.path.join(v2, "ingest_epoch=0", f)).st_ino
           for f in os.listdir(os.path.join(v2, "ingest_epoch=0"))
           if f.endswith(".parquet")}
    store.append(spark.createDataFrame(
        [(4, "and a completely distinct fourth")],
        "doc_id long, text string"))
    v3 = store.broker.data_path(DOCS_TABLE, 3)
    for f, i in ino.items():
        assert os.stat(os.path.join(v3, "ingest_epoch=0", f)).st_ino == i
    assert store.read().count() == 4


def test_corpus_side_tables_track_epochs_and_self_heal(spark, tmp_path):
    """The persisted signature index (text md5 + MinHash band keys)
    makes archive checks O(batch): its epoch leaves mirror the corpus's,
    and a stale index — a crash between the corpus flip and the side
    flips, or a lost side table — is healed by the next append's sync,
    so duplicates of un-indexed documents are still caught."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from weatherdb_spark.llm.corpus import (
        BANDS_TABLE,
        DOCS_TABLE,
        HASH_TABLE,
        CorpusStore,
    )

    base = "the quick brown fox jumps over the lazy dog by the river today"
    store = CorpusStore(spark, str(tmp_path / "wh"), near_threshold=0.8)
    store.append(spark.createDataFrame(
        [(1, base), (2, "totally different words entirely here now ok")],
        "doc_id long, text string"))

    b = store.broker
    # index leaves mirror the corpus epoch; one hash row per doc, one
    # band row per (doc, band)
    assert store._epoch_values(HASH_TABLE) == {1}
    assert store._epoch_values(BANDS_TABLE) == {1}
    assert b.read(HASH_TABLE).count() == 2
    assert b.read(BANDS_TABLE).count() == 16   # 2 docs x 8 bands
    import hashlib
    md5s = {r.doc_id: r.text_md5 for r in b.read(HASH_TABLE).collect()}
    assert md5s[1] == hashlib.md5(base.encode()).hexdigest()

    # crash window: the corpus gains an epoch the index never saw
    # (exactly what a crash between the corpus flip and the side-table
    # flips leaves behind)
    ghost = "some entirely novel sentence that was never indexed at all"
    b.write_partition_append(
        DOCS_TABLE,
        spark.createDataFrame([(50, ghost)], "doc_id long, text string"),
        "ingest_epoch", 2,
    )
    assert store._epoch_values(DOCS_TABLE) == {1, 2}
    assert store._epoch_values(HASH_TABLE) == {1}  # stale

    # the next append self-heals the index AND catches dups of the
    # un-indexed doc through it — near first (batch checks would
    # otherwise collapse an exact+near pair within the batch)
    out = store.append(spark.createDataFrame(
        [(61, ghost + " extra"),            # near dup of the ghost
         (62, "fresh content sharing nothing with anything else")],
        "doc_id long, text string"))
    assert out["admitted"] == 1
    assert store._epoch_values(HASH_TABLE) == {1, 2, 3}
    out_exact = store.append(spark.createDataFrame(
        [(60, ghost)], "doc_id long, text string"))  # exact dup of ghost
    assert out_exact["admitted"] == 0
    reasons = {(r.doc_id, r.reason, r.blocked_by)
               for r in store.rejections().collect()}
    assert (60, "archive_exact", 50) in reasons
    assert (61, "archive_near", 50) in reasons

    # lost side table: full rebuild on the next append, dedup intact
    shutil.rmtree(os.path.join(str(tmp_path / "wh"), BANDS_TABLE))
    out2 = store.append(spark.createDataFrame(
        [(70, base + " extra2")],           # near dup vs epoch-1 doc 1
        "doc_id long, text string"))
    assert out2 == {"admitted": 0, "rejected": 1, "version": 5}
    # rebuilt index covers exactly the corpus content (empty epochs —
    # zero-admission appends — legitimately have no index leaf)
    assert store.broker.read(BANDS_TABLE).count() == 8 * store.read().count()
    assert (70, "archive_near", 1) in {
        (r.doc_id, r.reason, r.blocked_by)
        for r in store.rejections().collect()}


def test_corpus_append_rejects_schema_drift(spark, tmp_path):
    """The epoch-leaf write would silently accept a batch whose columns
    diverge from the archive (the pre-epoch unionByName write threw) —
    a mixed-schema table breaks reads long after the offending append,
    so the mismatch must fail loudly upfront."""
    from weatherdb_spark.llm.corpus import CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    store.append(spark.createDataFrame(
        [(1, "first words here")], "doc_id long, text string"))
    drifted = spark.createDataFrame(
        [(2, "second words", "s1")], "doc_id long, text string, source string")
    with pytest.raises(ValueError, match="schema mismatch"):
        store.append(drifted)
    narrowed = spark.createDataFrame([(3,)], "doc_id long")
    with pytest.raises(ValueError, match="schema mismatch"):
        store.append(narrowed)
    assert store.read().count() == 1  # nothing leaked into the corpus


def test_corpus_append_null_text_is_replay_idempotent(spark, tmp_path):
    """md5(NULL) is NULL: a plain equi-join would let NULL-text docs
    bypass every dedup layer, re-admitting them on each foreachBatch
    replay. The null-safe hash join keeps replays idempotent."""
    from weatherdb_spark.llm.corpus import CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    b = spark.createDataFrame(
        [(1, None, "s1"), (2, "real words in here now", "s1")],
        "doc_id long, text string, source string",
    )
    assert store.append(b)["admitted"] == 2
    replay = store.append(b)          # foreachBatch replay of the batch
    assert replay["admitted"] == 0 and replay["rejected"] == 2
    assert store.read().count() == 2  # the corpus did not grow


def test_corpus_read_epochs_prunes_partitions(spark, tmp_path):
    """read_epochs carries a STATIC ingest_epoch IN predicate, so the
    parquet scan lists only the asked epochs' leaves (PartitionFilters)
    — the mechanism that keeps append's exact-Jaccard verify
    O(candidate epochs), closing the last O(corpus) append leg."""
    import re

    from weatherdb_spark.llm.corpus import CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet white black gray",
    ]
    for i, t in enumerate(texts):
        store.append(spark.createDataFrame(
            [(i, t)], "doc_id long, text string"))
    assert sorted(store._epoch_values("corpus_documents")) == [1, 2, 3]

    df = store.read_epochs([2])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "ingest_epoch" in pf, plan
    assert [r.doc_id for r in df.collect()] == [1]
    # empty epoch list -> zero rows, documents' own schema
    assert store.read_epochs([]).count() == 0
    assert "ingest_epoch" not in store.read_epochs([]).columns


def test_corpus_read_epochs_raises_on_legacy_flat_layout(spark, tmp_path):
    import pytest as _pytest

    from weatherdb_spark.llm.corpus import DOCS_TABLE, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    # a pre-epoch engine wrote the corpus flat (no partition leaves)
    store.broker.write(DOCS_TABLE, spark.createDataFrame(
        [(1, "legacy words here")], "doc_id long, text string"))
    with _pytest.raises(ValueError, match="not epoch-partitioned"):
        store.read_epochs([0])


def test_corpus_near_verify_rejections_identical_across_epochs(spark, tmp_path):
    """The epoch-pruned candidate text read must not change WHAT gets
    rejected: near-dups of docs living in different (non-adjacent)
    epochs are still verified and blocked by the right resident. Five
    archive epochs so the EPOCH_PRUNE_MIN gate is OPEN and the pruned
    path actually runs (fewer epochs take the plain read)."""
    from weatherdb_spark.llm.corpus import EPOCH_PRUNE_MIN, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"), near_threshold=0.8)
    t1 = "the quick brown fox jumps over the lazy dog by the river today"
    t2 = "completely different content about mountains snow and winter air"
    fillers = [
        "unrelated third epoch filler words beyond any overlap",
        "fourth epoch padding sentence with its very own vocabulary",
        "fifth epoch content again sharing no shingles with anyone",
    ]
    store.append(spark.createDataFrame([(1, t1)], "doc_id long, text string"))
    store.append(spark.createDataFrame([(2, t2)], "doc_id long, text string"))
    for i, t in enumerate(fillers):
        store.append(spark.createDataFrame(
            [(3 + i, t)], "doc_id long, text string"))
    assert len(store._epoch_values("corpus_documents")) > EPOCH_PRUNE_MIN
    # one batch with near-dups of epoch-1 AND epoch-2 residents plus a
    # fresh doc: the verify must fetch texts from BOTH candidate epochs
    batch = spark.createDataFrame(
        [(10, t1 + " extra"), (11, t2 + " extra"),
         (12, "genuinely novel words nothing shares any shingle with")],
        "doc_id long, text string")
    res = store.append(batch)
    assert res == {"admitted": 1, "rejected": 2, "version": 6}
    reasons = {(r.doc_id, r.reason, r.blocked_by)
               for r in store.rejections().collect()
               if r.doc_id in (10, 11, 12)}
    assert reasons == {(10, "archive_near", 1), (11, "archive_near", 2)}


def test_corpus_semantic_dedup_at_append(spark, tmp_path):
    """The embedding_col= archive check: a paraphrase (different text,
    near-identical embedding) sails past exact AND MinHash text dedup
    but is rejected archive_semantic with the blocking resident named;
    distant embeddings and NULL embeddings are admitted."""
    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import EMB_TABLE, CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    store = CorpusStore(spark, str(tmp_path / "wh"),
                        semantic_threshold=0.98)
    base = spark.createDataFrame(
        [(1, "the original phrasing of a very particular idea",
          _unit_vec(7)),
         (2, "an unrelated second document about other matters",
          _unit_vec(99))],
        schema,
    )
    assert store.append(base, embedding_col="embedding") == {
        "admitted": 2, "rejected": 0, "version": 1}
    assert store.broker.exists(EMB_TABLE)

    b2 = spark.createDataFrame(
        [(10, "a completely rewritten paraphrase sharing no words",
          _unit_vec(7, jitter=0.001)),       # near-identical to doc 1
         (11, "fresh content with a genuinely new embedding",
          _unit_vec(1234)),                  # far from both
         (12, "a doc with no embedding at all skips the check", None)],
        schema,
    )
    res = store.append(b2, embedding_col="embedding")
    assert res == {"admitted": 2, "rejected": 1, "version": 2}
    rej = {(r.doc_id, r.reason, r.blocked_by)
           for r in store.rejections().collect()}
    assert rej == {(10, "archive_semantic", 1)}
    assert {r.doc_id for r in store.read().collect()} == {1, 2, 11, 12}

    # the opt-in is STICKY (a store property, not a per-append flag):
    # an append WITHOUT the argument still maintains the index and
    # runs the check against the recorded column
    b3 = spark.createDataFrame(
        [(20, "another paraphrase and nobody re-passed the flag",
          _unit_vec(7, jitter=0.002))], schema)
    res3 = store.append(b3)
    assert res3["admitted"] == 0 and res3["rejected"] == 1
    blocked = {r.blocked_by for r in store.rejections().collect()
               if r.doc_id == 20}
    assert blocked == {1}  # min archived id among the colliding refs
    # a genuinely new embedding is still admitted without the flag
    b4 = spark.createDataFrame(
        [(30, "fresh late arrival with its very own vector",
          _unit_vec(777))], schema)
    assert store.append(b4)["admitted"] == 1
    # a DIFFERENT column name later is refused: the stored bucket keys
    # are one vector space
    import pytest as _pytest
    with _pytest.raises(ValueError, match="semantic spaces"):
        store.append(b4, embedding_col="other")


def test_corpus_semantic_side_table_self_heals(spark, tmp_path):
    """A lost embedding-bucket side table rebuilds from the archived
    docs on the next embedding-carrying append — same self-healing
    contract as the text signature tables."""
    import shutil

    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import EMB_TABLE, CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    store = CorpusStore(spark, str(tmp_path / "wh"),
                        semantic_threshold=0.98)
    store.append(spark.createDataFrame(
        [(1, "first words here", _unit_vec(5))], schema),
        embedding_col="embedding")
    shutil.rmtree(store.broker.path(EMB_TABLE))
    assert not store.broker.exists(EMB_TABLE)

    dup = spark.createDataFrame(
        [(9, "no shared words at all", _unit_vec(5, jitter=0.001))], schema)
    res = store.append(dup, embedding_col="embedding")
    assert res == {"admitted": 0, "rejected": 1, "version": 2}
    assert store.broker.exists(EMB_TABLE)


def test_corpus_compact_epochs_folds_embedding_side_table(spark, tmp_path):
    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import EMB_TABLE, CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    store = CorpusStore(spark, str(tmp_path / "wh"))
    for i in range(4):
        store.append(spark.createDataFrame(
            [(i, f"unique doc number {i} of its own words",
              _unit_vec(i * 31 + 1))], schema),
            embedding_col="embedding")
    assert sorted(store._epoch_values(EMB_TABLE)) == [1, 2, 3, 4]
    res = store.compact_epochs(keep_last=1)
    assert res["folded"] == 3 and res["into_epoch"] == 3
    assert sorted(store._epoch_values(EMB_TABLE)) == [3, 4]
    # index content unchanged: a near-copy of the OLDEST doc (now in
    # the folded leaf) is still rejected semantically
    dup = spark.createDataFrame(
        [(50, "rephrased without shared vocabulary", _unit_vec(1, jitter=0.001))],
        schema)
    store2 = CorpusStore(spark, str(tmp_path / "wh"),
                         semantic_threshold=0.98)
    res2 = store2.append(dup, embedding_col="embedding")
    assert res2["admitted"] == 0 and res2["rejected"] == 1


def test_corpus_clean_append_skips_rejection_snapshot(spark, tmp_path):
    """A clean append (nothing rejected) skips the rejection-log write
    — an empty leaf carries no audit information and the snapshot flip
    is pure fixed overhead on the small-append floor. The FIRST append
    still creates the log (rejections() contract), and a rejecting
    append still snapshots it."""
    from weatherdb_spark.llm.corpus import REJ_TABLE, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    store.append(mk([(1, "first words of their own kind")]))
    assert store.broker.exists(REJ_TABLE)       # created by append 1
    v1 = store.broker.table_version(REJ_TABLE)
    assert store.rejections().count() == 0

    store.append(mk([(2, "second unrelated set of words")]))
    assert store.broker.table_version(REJ_TABLE) == v1  # clean: skipped

    res = store.append(mk([(3, "first words of their own kind")]))
    assert res["rejected"] == 1
    assert store.broker.table_version(REJ_TABLE) == v1 + 1
    assert {(r.doc_id, r.reason) for r in store.rejections().collect()} \
        == {(3, "archive_exact")}


def test_corpus_image_dedup_at_append(spark, tmp_path):
    """The image_col= archive check: a re-encoded image (same gradient
    structure, different bytes AND different caption text) sails past
    every text layer but is rejected archive_image; a genuinely
    different image and a NULL payload are admitted. The opt-in is
    sticky like the semantic one."""
    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import IMG_TABLE, CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("image", T.BinaryType()),
    ])
    base = bytes(range(72))                      # rising gradient grid
    reenc = bytes(v + 50 for v in range(72))     # same comparisons
    other = bytes(reversed(range(72)))           # inverted gradient
    store = CorpusStore(spark, str(tmp_path / "wh"))
    store.append(spark.createDataFrame(
        [(1, "original caption words here", bytearray(base))], schema),
        image_col="image")
    assert store.broker.exists(IMG_TABLE)

    b2 = spark.createDataFrame(
        [(10, "totally different caption no shared words",
          bytearray(reenc)),
         (11, "another caption for a different picture",
          bytearray(other)),
         (12, "a doc with no image at all", None)],
        schema,
    )
    res = store.append(b2)   # sticky: no flag re-passed
    assert res == {"admitted": 2, "rejected": 1, "version": 2}
    rej = {(r.doc_id, r.reason, r.blocked_by)
           for r in store.rejections().collect()}
    assert rej == {(10, "archive_image", 1)}
    # renaming the image column later is refused
    import pytest as _pytest
    with _pytest.raises(ValueError, match="image"):
        store.append(b2, image_col="text")


def test_corpus_image_decode_seam_reaches_the_archive_check(
        spark, tmp_path):
    """CorpusStore(image_decode=...) threads the dhash_images decode
    seam into the stored index and the append-time checks — the place a
    REAL decoder matters most: two byte-DIFFERENT payloads that the
    injected decoder maps to the same luminance grid must collide
    archive_image, while the default byte-subsample decoder admits
    both (their raw bytes differ everywhere)."""
    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("image", T.BinaryType()),
    ])
    grid = [(i * 37) % 251 for i in range(72)]

    def const_decode(raw):
        # stand-in for a real decoder: every payload "decodes" to one
        # gradient image (a re-encode pair decodes alike by definition)
        return grid

    b1 = [(1, "first caption entirely its own words",
           bytearray(b"jpeg-bytes-one" * 20))]
    b2 = [(10, "second caption sharing zero vocabulary",
           bytearray(b"png-bytes-two!" * 23))]

    plain = CorpusStore(spark, str(tmp_path / "plain"))
    plain.append(spark.createDataFrame(b1, schema), image_col="image")
    assert plain.append(spark.createDataFrame(b2, schema)) == {
        "admitted": 1, "rejected": 0, "version": 2}

    real = CorpusStore(spark, str(tmp_path / "real"),
                       image_decode=const_decode)
    real.append(spark.createDataFrame(b1, schema), image_col="image")
    res = real.append(spark.createDataFrame(b2, schema))
    assert res == {"admitted": 0, "rejected": 1, "version": 2}
    assert {(r.doc_id, r.reason, r.blocked_by)
            for r in real.rejections().collect()} \
        == {(10, "archive_image", 1)}


def test_corpus_image_side_table_self_heals_and_folds(spark, tmp_path):
    import shutil

    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import IMG_TABLE, CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("image", T.BinaryType()),
    ])
    import random

    store = CorpusStore(spark, str(tmp_path / "wh"))
    # pseudo-random payloads: distinct gradient structures, so the
    # three fingerprints sit ~32 bits apart (a shared monotone gradient
    # would give every payload the same all-ones dHash)
    payloads = [random.Random(i).randbytes(72) for i in range(3)]
    for i in range(3):
        res_i = store.append(spark.createDataFrame(
            [(i, f"caption number {i} all its own",
              bytearray(payloads[i]))],
            schema), image_col="image")
        assert res_i["admitted"] == 1
    # lost side table rebuilds on the next append (sync diff)...
    shutil.rmtree(store.broker.path(IMG_TABLE))
    dup = spark.createDataFrame(
        [(9, "no words in common with anything",
          bytearray(payloads[0]))], schema)
    res = store.append(dup)
    assert res == {"admitted": 0, "rejected": 1, "version": 4}
    assert store.broker.exists(IMG_TABLE)
    # ... and compaction folds the image table with its siblings
    folded = store.compact_epochs(keep_last=1)
    assert folded["folded"] >= 2
    assert sorted(store._epoch_values(IMG_TABLE))[-1] == \
        max(store._epoch_values("corpus_documents"))


def test_corpus_collapse_batch_semantic_and_image(spark, tmp_path):
    """collapse_batch=True (r8 verdict ask #3): ONE batch carrying both
    members of a paraphrase pair (near-identical embeddings, no shared
    words) and an image + its re-encode admits exactly one member of
    each group, reasons batch_semantic / batch_image with the keeper
    named; default (flag off) admits both — existing admission
    semantics unchanged."""
    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("image", T.BinaryType()),
    ])
    grad = bytes(range(72))                   # rising gradient grid
    reenc = bytes(v + 50 for v in range(72))  # same comparisons, new bytes
    inv = bytes(reversed(range(72)))          # inverted gradient
    rows = [
        # paraphrase pair: no shared words, near-identical embeddings
        (1, "the original phrasing of one particular idea",
         _unit_vec(7), bytearray(grad)),
        (2, "a rewritten version sharing zero vocabulary",
         _unit_vec(7, jitter=0.001), bytearray(inv)),
        # image pair: doc 3's image is a re-encode of doc 1's
        (3, "caption for the re-encoded picture entirely new",
         _unit_vec(99), bytearray(reenc)),
        # clean doc: far embedding, no image
        (4, "fresh content with its very own vector", _unit_vec(1234),
         None),
    ]

    # flag OFF: everything admitted (within-batch semantic/image
    # collapse does not happen implicitly)
    off = CorpusStore(spark, str(tmp_path / "off"), semantic_threshold=0.98)
    res_off = off.append(spark.createDataFrame(rows, schema),
                         embedding_col="embedding", image_col="image")
    assert res_off == {"admitted": 4, "rejected": 0, "version": 1}

    # flag ON: doc 2 drops batch_semantic (blocked by 1), doc 3 drops
    # batch_image (blocked by 1)
    on = CorpusStore(spark, str(tmp_path / "on"), semantic_threshold=0.98)
    res_on = on.append(spark.createDataFrame(rows, schema),
                       embedding_col="embedding", image_col="image",
                       collapse_batch=True)
    assert res_on == {"admitted": 2, "rejected": 2, "version": 1}
    rej = {(r.doc_id, r.reason, r.blocked_by)
           for r in on.rejections().collect()}
    assert rej == {(2, "batch_semantic", 1), (3, "batch_image", 1)}
    assert {r.doc_id for r in on.read().collect()} == {1, 4}

    # a SECOND collapse_batch append still dedups against the archive
    # too (the within-batch stages run before, not instead of, the
    # archive joins)
    b2 = spark.createDataFrame(
        [(10, "later paraphrase of the first idea once more",
          _unit_vec(7, jitter=0.002), None),
         (11, "genuinely new content and vector again here",
          _unit_vec(555), None)],
        schema,
    )
    res2 = on.append(b2, collapse_batch=True)
    assert res2["admitted"] == 1 and res2["rejected"] == 1
    assert {(r.doc_id, r.reason) for r in on.rejections().collect()
            if r.doc_id == 10} == {(10, "archive_semantic")}


def test_corpus_collapse_batch_honors_hot_bucket_cap(spark, tmp_path):
    """The within-batch semantic/image self-joins honor the store's
    ``max_bucket_docs`` like every other leg: a degenerate batch (one
    embedding bucket, one dHash value) collapses through the CAPPED
    join to the same single survivor the uncapped plan picks — the
    keepers are the smallest ids, which are residents by the cap's own
    selection rule, so the rejection set is unchanged while the
    per-bucket pair count drops from quadratic to linear."""
    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("image", T.BinaryType()),
    ])
    words = ["alpha bravo charlie", "delta echo foxtrot", "golf hotel india",
             "juliet kilo lima", "mike november oscar", "papa quebec romeo"]
    grad = bytes(range(72))
    rows = [
        # disjoint vocab (no text-leg collapse), near-identical
        # embeddings (one semantic bucket), same image bytes (one
        # dHash) — both degenerate buckets at once
        (i, words[i], _unit_vec(7, jitter=0.0005 * i), bytearray(grad))
        for i in range(len(words))
    ]
    batch = spark.createDataFrame(rows, schema)

    capped = CorpusStore(spark, str(tmp_path / "cap"),
                         semantic_threshold=0.98, max_bucket_docs=2)
    res = capped.append(batch, embedding_col="embedding",
                        image_col="image", collapse_batch=True)
    assert res == {"admitted": 1, "rejected": 5, "version": 1}
    rej = {(r.doc_id, r.reason, r.blocked_by)
           for r in capped.rejections().collect()}
    # doc 0 survives; 1-5 all blocked by the smallest resident — the
    # semantic stage runs first so it names every drop
    assert rej == {(i, "batch_semantic", 0) for i in range(1, 6)}

    uncapped = CorpusStore(spark, str(tmp_path / "nocap"),
                           semantic_threshold=0.98)
    res_u = uncapped.append(batch, embedding_col="embedding",
                            image_col="image", collapse_batch=True)
    assert res_u == res
    assert {(r.doc_id, r.reason, r.blocked_by)
            for r in uncapped.rejections().collect()} == rej
