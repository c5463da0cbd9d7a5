"""Versioned training-corpus warehouse: MVCC snapshots + dedup AT
APPEND — the corpus-management story for a 100 TB training pipeline.

``CorpusStore`` composes the Broker's snapshot machinery (versioned
``_vNNNNN`` dirs + atomic manifest flip + warehouse mutex + time
travel — `broker.py`) with the dedup/decontamination operators: every
append lands as a NEW corpus snapshot (in-flight readers keep theirs),
and arriving documents are admitted only after

1. within-batch exact + MinHash near-dup collapse (smallest id per
   group survives), then
2. exact + MinHash checks AGAINST THE ARCHIVE — the asymmetric
   contamination joins, so the cost is O(batch x archive band keys),
   never a full-corpus re-dedup per append.

Rejections are themselves recorded in a versioned ``rejections`` table
with the reason and the blocking document — the "no silent drops" rule
applied to corpus curation. EVERY append cost is incremental:

- The snapshot WRITE is O(batch): the corpus is partitioned by INGEST
  EPOCH (one ``ingest_epoch=N`` leaf per append, N = the snapshot
  number it landed in) and each append writes only its own epoch leaf
  while every earlier epoch hard-links byte-identically from the
  previous snapshot (``Broker.write_partition_append``, the dim-table
  twin of the fact tables' partial-year writes). The rejection log
  appends the same way, partitioned by ``corpus_version``.
- The archive-side dedup COMPUTE is O(batch) too: the archive's text
  md5s and MinHash band keys are PERSISTED side tables
  (``corpus_text_hashes`` / ``corpus_minhash_bands``, epoch-appended
  alongside the corpus), so an append joins the batch's keys against
  stored keys instead of re-shingling and re-signing the whole archive
  per append — the 10M-doc stress (`tools/corpus_stress.py`) caught a
  50k-doc append costing the same as a 500k-doc one before this. The
  exact-Jaccard verify reads archive TEXT only for the band-collision
  CANDIDATES, and only from THEIR ingest-epoch leaves (the band index
  carries each resident's epoch; the candidates' distinct epochs
  become a static partition-pruning predicate on the text read via
  :meth:`CorpusStore.read_epochs`) — candidate-bounded in rows AND in
  bytes scanned, not archive-bounded.

Side tables self-heal: each append first reconciles their epoch leaves
against the corpus's (a directory diff — free on the happy path) and
backfills any missing epoch from a partition-pruned read, so a crash
between the corpus flip and the side-table flips converges instead of
letting duplicates slip past a stale index. A corpus written by a
pre-epoch engine migrates on its first append (one full rewrite into
``ingest_epoch=0`` + one side-table build pass, never again). Time
travel, the MVCC manifest flip, and the dedup/rejection semantics are
unchanged.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import SparkSession

DOCS_TABLE = "corpus_documents"
REJ_TABLE = "corpus_rejections"
HASH_TABLE = "corpus_text_hashes"
BANDS_TABLE = "corpus_minhash_bands"
EMB_TABLE = "corpus_embedding_buckets"

#: MinHash parameters of the persisted band index — fixed per store
#: (they define the stored keys; the within-batch check and the stored
#: archive side must agree). Identical to the dedup-module defaults.
NUM_PERM = 32
N_BANDS = 8
SHINGLE_N = 3

#: Random-hyperplane LSH parameters of the persisted embedding-bucket
#: index (the optional ``embedding_col=`` semantic check) — fixed per
#: store for the same stored-keys reason, and identical to the
#: ``cosine_pairs_lsh`` defaults so an ad-hoc whole-corpus pass buckets
#: the same way the archive index does.
SEM_PLANES = 3
SEM_N_TABLES = 16
SEM_DIM = 64

#: Broker settings key recording the store's embedding column: semantic
#: indexing is a property of the STORE, not of one append — the first
#: ``embedding_col=`` append records the name, and every later append
#: maintains the index and runs the check automatically (otherwise
#: embedding-less appends would leave permanent index gaps that stall
#: ``compact_epochs`` and let paraphrases through).
EMB_COL_SETTING = "corpus_embedding_col"

#: The image twin: dHash fingerprints of the store's binary payload
#: column (``corpus_image_dhash`` side table), same sticky opt-in.
IMG_TABLE = "corpus_image_dhash"
IMG_COL_SETTING = "corpus_image_col"

#: Hamming radius of the archive image check — two payloads whose
#: 64-bit dHashes differ in at most this many gradient bits are
#: near-duplicate images (the standard dHash working radius).
IMG_MAX_HAMMING = 6

#: Epoch-pruned verify reads engage only when the corpus has MORE
#: epoch leaves than this: deriving the colliding-epoch set costs one
#: extra band-index scan per append (~1-2 s at a 10M-doc archive), and
#: with few epochs the "pruned" read touches them all anyway — pure
#: overhead. The count comes from a directory listing (free).
EPOCH_PRUNE_MIN = 4

#: A/B seam for the append plan cut (tools/ab_append_cut.py toggles it
#: in one process to measure both arms). The cut — a parquet scratch
#: roundtrip of the batch after the within-batch dedup stages — is
#: load-bearing with collapse_batch=True (the analyzed plan grows
#: 2^stages and OOMs the driver) and A/B-measured faster on the
#: default path too; leave it True outside the A/B harness.
_APPEND_PLAN_CUT = True


class CorpusStore:
    """See module docstring. ``warehouse_dir`` may be shared with a
    weather Broker warehouse or stand alone; only the generic snapshot
    tables above are touched."""

    def __init__(self, spark: "SparkSession", warehouse_dir: str,
                 near_threshold: float = 0.8,
                 max_bucket_docs: int | None = None,
                 semantic_threshold: float = 0.9,
                 image_decode=None):
        from weatherdb_spark.broker import Broker

        self.broker = Broker(spark, warehouse_dir)
        self.spark = spark
        self.near_threshold = near_threshold
        self.max_bucket_docs = max_bucket_docs
        self.semantic_threshold = semantic_threshold
        #: the ``decode=`` seam of ``llm.multimodal.dhash_images``,
        #: threaded through the stored image index and the append-time
        #: checks — so a store built with a REAL decoder (e.g.
        #: ``pil_grayscale_grid()``) rejects a re-encode whose BYTES
        #: differ. Like the thresholds it is a construction-time
        #: property, not persisted (callables don't serialize): supply
        #: the SAME decoder on every construction against a warehouse —
        #: mixing decoders buckets two hash spaces in one index; after
        #: switching, drop the ``corpus_image_dhash`` table so the next
        #: append rebuilds it through self-healing.
        self.image_decode = image_decode

    # ------------------------------------------------------------ read
    def read(self, version: int | None = None,
             with_epoch: bool = False) -> DataFrame:
        """The corpus at its current (or a pinned) snapshot.
        ``with_epoch=True`` keeps the ``ingest_epoch`` partition column
        (which epoch/append each document arrived in — also the
        pruning key for epoch-sliced reads); default drops it so the
        schema is the documents' own."""
        df = self.broker.read(DOCS_TABLE, version=version)
        if not with_epoch and "ingest_epoch" in df.columns:
            df = df.drop("ingest_epoch")
        return df

    def read_epochs(self, epochs) -> DataFrame:
        """Partition-pruned read of ONLY the given ingest epochs'
        leaves (``ingest_epoch`` dropped — the documents' own schema).
        The epoch list is a STATIC ``IN`` predicate, so the parquet
        scan lists just those ``ingest_epoch=N`` directories
        (PartitionFilters — plan-pinned by test), never the corpus:
        this is what keeps :meth:`append`'s exact-Jaccard verify
        O(candidate epochs) instead of O(corpus). Raises on a legacy
        flat corpus (no epoch leaves to prune — callers fall back to
        :meth:`read`)."""
        if not self.broker._is_partitioned_by(DOCS_TABLE, "ingest_epoch"):
            raise ValueError(
                f"{DOCS_TABLE} is not epoch-partitioned (legacy flat "
                "layout) — read() the whole corpus instead; the first "
                "append migrates it"
            )
        epochs = [int(e) for e in epochs]
        if not epochs:
            return self.read(with_epoch=True).limit(0).drop("ingest_epoch")
        return (
            self.read(with_epoch=True)
            .filter(F.col("ingest_epoch").isin(epochs))
            .drop("ingest_epoch")
        )

    def rejections(self) -> DataFrame:
        if not self.broker.exists(REJ_TABLE):
            raise ValueError(
                "no rejection log yet: nothing has been appended to this "
                "corpus (the log is created by the first append, even "
                "when it rejects nothing)"
            )
        # corpus_version is the partition key (discovery restores it)
        return self.broker.read(REJ_TABLE)

    def versions(self) -> list[int]:
        return self.broker.table_versions(DOCS_TABLE)

    # ---------------------------------------- persisted signature index
    def _hash_frame(self, docs: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
        return docs.select(
            F.col(id_col), F.md5(F.col(text_col)).alias("text_md5")
        )

    def _bands_from_shingles(self, sh: DataFrame,
                             id_col: str) -> DataFrame:
        """(id, band, key) MinHash band keys from an (id, shingles)
        frame — the exact pipeline ``minhash_lsh_pairs`` runs, via the
        same helpers, so the stored index, the within-batch check, and
        an ad-hoc archive pass cannot disagree. NULL/short texts have
        no shingles and produce no band rows (they are the exact
        layer's responsibility)."""
        from weatherdb_spark.llm.dedup import (
            _banded_keys,
            _signatures_from_exploded,
        )

        exploded = (
            sh.select(F.col(id_col), F.explode_outer("shingles").alias("_s"))
            .filter(F.col("_s").isNotNull())
        )
        sig = _signatures_from_exploded(exploded, NUM_PERM, id_col)
        return _banded_keys(sig, N_BANDS, NUM_PERM // N_BANDS, id_col)

    def _bands_frame(self, docs: DataFrame, id_col: str,
                     text_col: str) -> DataFrame:
        from weatherdb_spark.functions.partitioning import spread
        from weatherdb_spark.llm.dedup import word_shingles

        sh = word_shingles(spread(docs, id_col), text_col, SHINGLE_N) \
            .select(F.col(id_col), "shingles")
        return self._bands_from_shingles(sh, id_col)

    def _img_hash_frame(self, docs: DataFrame, id_col: str,
                        payload_col: str) -> DataFrame:
        """(id, dhash) perceptual fingerprints of the binary payload
        column — the exact hashes ``llm.multimodal.dhash_images``
        computes, so the stored index and an ad-hoc whole-corpus
        ``image_neardup_pairs`` cannot disagree. NULL and EMPTY
        payloads are SKIPPED (no image -> no image check — hashing the
        zero grid would make every imageless doc a hamming-0
        'duplicate' of the first, whether the pipeline encodes
        'no image' as NULL or as ``b""``). A genuinely degenerate
        image whose gradients are all non-rising also hashes 0 — an
        inherent dHash collision class, not an imageless doc; dHash is
        a NEAR-dup signal, not an identity."""
        from weatherdb_spark.functions.partitioning import spread
        from weatherdb_spark.llm.multimodal import dhash_images

        with_img = spread(
            docs.filter(F.col(payload_col).isNotNull()
                        & (F.length(payload_col) > 0)), id_col
        ).select(
            F.col(id_col).alias("doc_id"),
            F.col(payload_col).alias("payload"),
        )
        return dhash_images(
            with_img, decode=self.image_decode
        ).withColumnRenamed("doc_id", id_col)

    def _emb_buckets_frame(self, docs: DataFrame, id_col: str,
                           embedding_col: str) -> DataFrame:
        """(id, table, bucket) random-hyperplane LSH keys of the
        embedding column — the exact bucket stream ``cosine_pairs_lsh``
        builds, via the same signature helper at the store's pinned
        :data:`SEM_PLANES`/:data:`SEM_N_TABLES`/:data:`SEM_DIM`, so the
        stored index and an ad-hoc whole-corpus pass cannot disagree.
        NULL embeddings produce no bucket rows (no semantic check for
        them — mirroring NULL texts' no-shingle behavior)."""
        from weatherdb_spark.functions.partitioning import spread
        from weatherdb_spark.llm.similarity import _with_bucket_signature

        b = spread(docs, id_col).select(
            F.col(id_col), F.col(embedding_col).alias("_v")
        )
        return _with_bucket_signature(
            b, "_v", SEM_PLANES, SEM_N_TABLES, SEM_DIM
        ).select(
            F.col(id_col),
            F.posexplode(F.col("_sig")).alias("table", "bucket"),
        )

    def _epoch_values(self, table: str) -> "set[int] | None":
        """Epoch leaf values of the table's current snapshot, or None
        for a legacy/flat layout."""
        import os

        b = self.broker
        if not b._is_partitioned_by(table, "ingest_epoch"):
            return None
        root = b.data_path(table)
        return {
            int(e.split("=", 1)[1]) for e in os.listdir(root)
            if e.startswith("ingest_epoch=")
            and os.path.isdir(os.path.join(root, e))
        }

    def _sync_side_tables(self, id_col: str, text_col: str,
                          embedding_col: str | None = None,
                          image_col: str | None = None) -> None:
        """Reconcile the signature side tables with the corpus — a
        directory diff on the happy path, a partition-pruned backfill
        per missing epoch otherwise, a one-time full build for a legacy
        corpus or a lost side table. Runs before every append's archive
        checks, so a crash between the corpus flip and the side-table
        flips self-heals instead of leaking duplicates past a stale
        index. The embedding-bucket side table syncs whenever the store
        has a recorded embedding column (``embedding_col`` here is the
        STICKY resolution :meth:`append` performs against
        :data:`EMB_COL_SETTING`) — the docs schema is drift-guarded, so
        the column is always there to read, and a gap epoch (crash
        window) backfills on the very next append rather than waiting
        for an embedding-carrying one."""
        b = self.broker
        if not b.exists(DOCS_TABLE):
            return
        docs_epochs = self._epoch_values(DOCS_TABLE)
        builders = {
            HASH_TABLE: self._hash_frame,
            BANDS_TABLE: self._bands_frame,
        }
        if embedding_col is not None:
            builders[EMB_TABLE] = (
                lambda docs, i, _t: self._emb_buckets_frame(
                    docs, i, embedding_col)
            )
        if image_col is not None:
            builders[IMG_TABLE] = (
                lambda docs, i, _t: self._img_hash_frame(
                    docs, i, image_col)
            )
        for table, build in builders.items():
            side_epochs = (
                self._epoch_values(table) if b.exists(table) else None
            )
            if docs_epochs is None or side_epochs is None \
                    or (side_epochs - docs_epochs):
                # full (re)build — legacy flat corpus (its rows become
                # epoch 0 on this append's write, matching the lit(0)
                # here), missing side table, or stale ghost epochs
                arch = self.read(with_epoch=True)
                if "ingest_epoch" not in arch.columns:
                    arch = arch.withColumn("ingest_epoch", F.lit(0))
                frame = build(arch, id_col, text_col).join(
                    arch.select(F.col(id_col), "ingest_epoch"), id_col
                )
                b.write(table, frame, partition_cols=("ingest_epoch",))
                continue
            for e in sorted(docs_epochs - side_epochs):
                docs_e = self.read(with_epoch=True).filter(
                    F.col("ingest_epoch") == e
                ).drop("ingest_epoch")
                b.write_partition_append(
                    table, build(docs_e, id_col, text_col),
                    "ingest_epoch", e,
                )

    # ----------------------------------------------------- maintenance
    def compact_epochs(self, keep_last: int = 8) -> dict:
        """Fold all but the newest ``keep_last`` epoch leaves of the
        corpus AND its signature side tables into ONE consolidated leaf
        per table (valued at the newest folded epoch, so epoch order
        stays monotone and future appends — keyed by snapshot numbers
        above the current version — can never collide with it).

        Why: every append adds one leaf per table; after thousands of
        appends the directory listing / partition-discovery cost grows
        with append COUNT, not data size. Folding is the maintenance
        counter-move (call it at vacuum cadence): cost is O(folded
        epochs' data) — the untouched recent epochs hard-link
        byte-identically — and content, dedup semantics, and the side-
        table sync invariant are unchanged (all three tables fold the
        same epoch set). The rejection log deliberately keeps its
        per-append ``corpus_version`` leaves: they ARE the audit
        trail's key, and :meth:`~weatherdb_spark.broker.Broker.vacuum`
        already compacts its files per leaf.

        Returns ``{"folded": n_epochs, "into_epoch": e}`` (``folded``
        0 when there was nothing to do)."""
        if keep_last < 0:
            raise ValueError(f"keep_last must be >= 0, got {keep_last}")
        with self.broker.activate():
            epochs = sorted(self._epoch_values(DOCS_TABLE) or ())
            fold = epochs[:len(epochs) - keep_last] if keep_last \
                else list(epochs)
            # fold only the PREFIX every signature side table also has:
            # a crash between the corpus flip and the side flips leaves
            # the newest docs epoch un-indexed, and folding it would
            # rename the gap away — the epoch sets would then match and
            # _sync_side_tables' directory diff could never backfill the
            # missing signatures (silent dedup misses forever). Stopping
            # at the first side-missing epoch keeps the gap visible; the
            # next append heals it, after which it folds normally.
            # the embedding-bucket / image-hash tables participate only
            # when the store uses those indexes (absent = never
            # created, which must not veto folding the text side
            # tables)
            sides = [HASH_TABLE, BANDS_TABLE]
            for opt in (EMB_TABLE, IMG_TABLE):
                if self.broker.exists(opt):
                    sides.append(opt)
            for side in sides:
                if not self.broker.exists(side):
                    fold = []
                    break
                have = self._epoch_values(side) or set()
                covered = []
                for e in fold:
                    if e not in have:
                        break
                    covered.append(e)
                fold = covered
            if len(fold) < 2:
                return {"folded": 0, "into_epoch": None}
            target = fold[-1]
            for table in (DOCS_TABLE, HASH_TABLE, BANDS_TABLE,
                          EMB_TABLE, IMG_TABLE):
                if not (self.broker.exists(table)
                        and self.broker._is_partitioned_by(table,
                                                           "ingest_epoch")):
                    continue
                df = self.broker.read(table)
                part = df.filter(
                    F.col("ingest_epoch").isin(fold)  # partition-pruned
                ).drop("ingest_epoch")
                self.broker.write_partition_append(
                    table, part, "ingest_epoch", target,
                    replace_values=fold,
                )
            return {"folded": len(fold), "into_epoch": target}

    # ---------------------------------------------------------- append
    def append(self, new_docs: DataFrame,
               id_col: str = "doc_id", text_col: str = "text",
               embedding_col: str | None = None,
               image_col: str | None = None,
               collapse_batch: bool = False) -> dict:
        """Admit ``new_docs`` into the corpus; returns
        ``{"admitted": n, "rejected": n, "version": v}``.

        ``embedding_col`` opts the STORE into the SEMANTIC archive
        check: the batch's random-hyperplane LSH bucket keys (the
        ``cosine_pairs_lsh`` stream, same helpers) join the persisted
        :data:`EMB_TABLE` index, exact cosine verifies the candidates
        against their epoch-pruned archived vectors, and a batch doc
        within ``semantic_threshold`` of ANY archived doc is rejected
        with reason ``archive_semantic`` — catching paraphrases and
        re-encodes that text dedup (exact md5 / MinHash shingles)
        misses. The index is a per-epoch side table like the text
        signatures: self-healing by the same directory diff, folded by
        the same :meth:`compact_epochs`. The opt-in is STICKY: the
        first embedding-carrying append records the column name
        (:data:`EMB_COL_SETTING`), and every later append maintains
        the index and runs the check without re-passing the argument —
        otherwise embedding-less appends would leave permanent index
        gaps that stall epoch compaction and admit paraphrases
        silently. Passing a DIFFERENT column name later raises (the
        stored keys would mix two vector spaces).

        ``collapse_batch=True`` ALSO collapses semantic/image near-dup
        groups WITHIN the batch (reasons ``batch_semantic`` /
        ``batch_image``), before the archive joins — one batch
        carrying both members of a paraphrase pair (or an image and
        its re-encode) then admits only the smaller id, mirroring the
        text layers' ``batch_exact``/``batch_near`` pairwise semantics
        (the larger id of each colliding pair is blocked by the
        smallest colliding smaller id). The pair generation reuses
        the SAME bucket-key / fingerprint frames the archive checks
        compute — a batch-sized self-join, no extra signature pass.
        Default off: the checks engage only for stores already opted
        into their columns, and existing admission counts are
        unchanged unless the flag is passed.

        ``image_col`` is the multimodal twin: the batch's binary
        payloads dHash-fingerprint (``llm.multimodal.dhash_images``)
        and join the persisted :data:`IMG_TABLE` index via the
        pigeonhole block keys
        (``llm.dedup.banded_fingerprint_keys``); a batch image within
        :data:`IMG_MAX_HAMMING` gradient bits of ANY archived image is
        rejected ``archive_image`` — re-encoded/rescaled copies that
        byte-level text dedup cannot see. Same sticky opt-in
        (:data:`IMG_COL_SETTING`), same self-healing epoch side table,
        same :meth:`compact_epochs` fold; NULL and empty payloads skip
        the check. Unlike the text/semantic verifies, no second archive
        read is needed — the stored fingerprints themselves decide
        (exact popcount). Like the semantic check, within-batch image
        collapse is ``collapse_batch``-gated (see above).

        Runs under the warehouse mutex like every Broker stage: the
        write is a snapshot flip, so readers planned against the old
        corpus finish cleanly.
        """
        from weatherdb_spark.functions.caching import cache_scope, scoped_persist
        from weatherdb_spark.functions.partitioning import spread
        from weatherdb_spark.llm.bucketing import cap_bucket_residents
        from weatherdb_spark.llm.dedup import (
            verified_pairs_from_banded,
            word_shingles,
        )

        # cache_scope: the dedup operators scoped_persist their shingle
        # intermediates; a long-lived session appending repeatedly must
        # not accumulate dead blocks (the engine-wide cache-hygiene
        # invariant)
        def _sticky(setting: str, given: str | None, what: str):
            """Resolve a sticky store-level column opt-in against its
            recorded setting; raise on a conflicting rename."""
            stored = self.broker.get_setting(setting)
            if given is None:
                return stored, stored
            if stored is not None and stored != given:
                raise ValueError(
                    f"this store's {what} index is keyed on {stored!r}; "
                    f"appending with {given!r} would mix two {what} "
                    "spaces in one index table — rebuild the corpus to "
                    "change the column"
                )
            return given, stored

        embedding_col, stored_emb = _sticky(
            EMB_COL_SETTING, embedding_col, "semantic")
        image_col, stored_img = _sticky(
            IMG_COL_SETTING, image_col, "image")
        for what, col in (("embedding_col", embedding_col),
                          ("image_col", image_col)):
            if col is not None and col not in new_docs.columns:
                raise ValueError(
                    f"{what} {col!r} is not a column of the batch "
                    f"(columns: {new_docs.columns})"
                )
            if col is not None and self.broker.exists(DOCS_TABLE):
                # the index backfill reads the ARCHIVE's column; a
                # corpus without it would fail deep inside the sync
                # build with a raw unresolved-column error — the
                # schema-drift guard below would name the problem, but
                # only after the sync, so name it first
                arch_cols = self.read().columns
                if col not in arch_cols:
                    raise ValueError(
                        f"{what} {col!r} is not a column of the "
                        f"archived corpus (columns: {arch_cols}); the "
                        "index needs the column in every epoch"
                    )
        with self.broker.activate(), cache_scope():
            # first opting-in append: record the store's column (under
            # the mutex, like every setting)
            if embedding_col is not None and stored_emb is None:
                self.broker.set_setting(EMB_COL_SETTING, embedding_col)
            if image_col is not None and stored_img is None:
                self.broker.set_setting(IMG_COL_SETTING, image_col)
            self._sync_side_tables(id_col, text_col, embedding_col,
                                   image_col)
            if self.broker.exists(DOCS_TABLE):
                # the epoch-leaf write would silently accept a batch
                # whose columns (or their TYPES — a string doc_id next
                # to bigint leaves breaks the parquet scan) diverge from
                # the archive's; the pre-epoch unionByName write threw
                # (or coerced in a full rewrite, which a leaf write
                # cannot). A mixed-schema table breaks reads long after
                # the append that caused it, so enforce the contract
                # upfront — cast the batch first if a type differs.
                archive_types = dict(self.read().dtypes)
                batch_types = dict(new_docs.dtypes)
                if archive_types != batch_types:
                    drift = sorted(
                        set(archive_types.items()) ^ set(batch_types.items())
                    )
                    raise ValueError(
                        "append schema mismatch vs the archived corpus "
                        f"(column, type) drift: {drift}"
                    )
            batch = new_docs
            rej = []

            def _reject(ids: DataFrame, reason: str) -> DataFrame:
                # ids: (id_col, blocked_by) — the curator's audit trail
                # names WHICH resident blocked each drop. Each frame is
                # scoped_persist-ed (rejection-sized, tiny): BOTH its
                # consumers — the batch anti-join chain and the
                # rejection-log union — reuse one materialized result
                # instead of re-executing the dedup join that produced
                # it, and the surrounding cache_scope releases the
                # blocks on exit (a localCheckpoint would leave its
                # checkpoint RDDs cached until a later GC — measured 6
                # lingering RDDs after two appends).
                ids = scoped_persist(ids)
                rej.append(ids.withColumn("reason", F.lit(reason)))
                return ids

            # batch-side key frames, computed ONCE EACH: the md5 frame
            # drives the within-batch AND archive exact checks, the
            # shingle/band frames drive the within-batch AND archive
            # near checks, and the admitted slices land in the side
            # tables at the end — no document is shingled or hashed
            # twice in one append
            batch_hash = scoped_persist(
                self._hash_frame(batch, id_col, text_col)
            )

            # 1) within-batch exact collapse (smallest id per md5 group
            # survives; NULL md5s — NULL texts — group together, the
            # eqNullSafe semantics replay idempotency depends on)
            keeper = batch_hash.groupBy("text_md5").agg(
                F.min(id_col).alias("blocked_by")
            ).withColumnRenamed("text_md5", "_kh")
            dup = (
                batch_hash
                .join(keeper, F.col("text_md5").eqNullSafe(F.col("_kh")))
                .filter(F.col("blocked_by") < F.col(id_col))
                .select(id_col, "blocked_by")
            )
            dup = _reject(dup, "batch_exact")
            batch = batch.join(dup.select(id_col), id_col, "left_anti")

            # shingles + band keys of the exact-survivors (the smaller
            # frame; every later consumer — near checks, side tables —
            # works on subsets of it)
            batch_sh = scoped_persist(
                word_shingles(spread(batch, id_col), text_col, SHINGLE_N)
                .select(F.col(id_col), "shingles")
            )
            batch_bands = scoped_persist(
                self._bands_from_shingles(batch_sh, id_col)
            )
            # embedding bucket keys of the exact-survivors (archive
            # semantic check + the admitted slice's index write)
            batch_emb = (
                scoped_persist(
                    self._emb_buckets_frame(batch, id_col, embedding_col))
                if embedding_col is not None else None
            )
            # dHash fingerprints likewise (archive image check + write)
            batch_img = (
                scoped_persist(
                    self._img_hash_frame(batch, id_col, image_col))
                if image_col is not None else None
            )

            # 2) within-batch near-dup collapse (larger id of a pair),
            # from the SAME band/shingle frames
            near = (
                verified_pairs_from_banded(
                    batch_bands, batch_sh, self.near_threshold,
                    id_col=id_col, max_bucket_docs=self.max_bucket_docs,
                )
                .groupBy(F.col("id_b").alias(id_col))
                .agg(F.min("id_a").alias("blocked_by"))
            )
            near = _reject(near, "batch_near")
            batch = batch.join(near.select(id_col), id_col, "left_anti")

            # 2b) within-batch SEMANTIC collapse (collapse_batch +
            # embedding opt-in): pairs from the SAME bucket-key frame
            # the archive check uses — batch-sized self-join on
            # (table, bucket), exact-cosine verify, larger id of each
            # verified pair blocked by its smallest partner (the
            # batch_near pairwise semantics). The store's hot-bucket
            # cap bounds the self-join's per-bucket quadratic like
            # every other leg (smaller-id residents, the
            # verified_pairs_from_banded convention)
            if collapse_batch and batch_emb is not None:
                from weatherdb_spark.llm.similarity import cosine

                live = batch_emb.join(batch.select(id_col), id_col)
                lhs = cap_bucket_residents(
                    live.select(F.col(id_col).alias("_ia"),
                                "table", "bucket"),
                    ["table", "bucket"], "_ia", self.max_bucket_docs,
                )
                rhs = live.select(F.col(id_col).alias("_ib"),
                                  "table", "bucket")
                epairs = (
                    lhs.join(rhs, ["table", "bucket"])
                    .filter(F.col("_ia") < F.col("_ib"))
                    .select("_ia", "_ib").distinct()
                )
                vecs = batch.select(F.col(id_col),
                                    F.col(embedding_col).alias("_v"))
                semdup = (
                    epairs
                    .join(vecs.select(F.col(id_col).alias("_ia"),
                                      F.col("_v").alias("_va")), "_ia")
                    .join(vecs.select(F.col(id_col).alias("_ib"),
                                      F.col("_v").alias("_vb")), "_ib")
                    .filter(F.round(cosine(F.col("_va"), F.col("_vb")), 6)
                            >= self.semantic_threshold)
                    .groupBy(F.col("_ib").alias(id_col))
                    .agg(F.min("_ia").alias("blocked_by"))
                )
                semdup = _reject(semdup, "batch_semantic")
                batch = batch.join(semdup.select(id_col), id_col,
                                   "left_anti")

            # 2c) within-batch IMAGE collapse: exact pigeonhole hamming
            # pairs over the SAME dHash frame the archive check uses;
            # the store's hot-bucket cap passes through (bounds a
            # degenerate same-fingerprint batch, like the archive leg)
            if collapse_batch and batch_img is not None:
                from weatherdb_spark.llm.dedup import hamming_pairs_exact

                live_img = batch_img.join(batch.select(id_col), id_col)
                imgdup = (
                    hamming_pairs_exact(
                        live_img, "dhash", IMG_MAX_HAMMING, bits=64,
                        id_col=id_col,
                        max_bucket_docs=self.max_bucket_docs,
                    )
                    .groupBy(F.col("id_b").alias(id_col))
                    .agg(F.min("id_a").alias("blocked_by"))
                )
                imgdup = _reject(imgdup, "batch_image")
                batch = batch.join(imgdup.select(id_col), id_col,
                                   "left_anti")

            # cut the anti-join spine here: each batch stage above
            # references `batch` twice (the collision frame + the
            # anti-join), so the LOGICAL plan doubles per stage, and
            # the archive legs below double it again — Catalyst's
            # analyzed tree grows 2^stages, and with the two collapse
            # stages the r9 suite OOMed the driver mid-plan (even the
            # plan's diagnostic string rendering is exponential in the
            # spine). persist() does NOT truncate the analyzed lineage
            # of derived frames, so the cut is a parquet scratch
            # roundtrip: downstream plans re-root on a plain scan. (A
            # localCheckpoint would also cut, but pins its RDD in the
            # cache past the scope — see _reject's hygiene note.) The
            # scratch lives under the warehouse's _tmp_ namespace —
            # vacuum and the table walk ignore it — and is removed
            # before return; a crashed append's leftover is swept by
            # the next append, under the same mutex. The extra
            # batch-linear write+read is a net WIN even on the default
            # (no-collapse) path — the archive legs stop re-analyzing
            # and re-executing the spine per consumer job (interleaved
            # A/B: tools/ab_append_cut.py, record in the README) —
            # so the cut is unconditional; _APPEND_PLAN_CUT is the
            # A/B seam, not a supported config (disabling it with
            # collapse_batch=True re-opens the OOM).
            import os as _os
            import shutil as _shutil
            import uuid as _uuid

            scratch = None
            if _APPEND_PLAN_CUT:
                for stale in _os.listdir(self.broker.dir):
                    if stale.startswith("_tmp_append_cut_"):
                        _shutil.rmtree(
                            _os.path.join(self.broker.dir, stale),
                            ignore_errors=True)
                scratch = _os.path.join(
                    self.broker.dir,
                    f"_tmp_append_cut_{_uuid.uuid4().hex}")
                batch_schema = batch.schema
                batch.write.parquet(scratch)
                batch = self.broker.spark.read.schema(
                    batch_schema).parquet(scratch)

            if self.broker.exists(DOCS_TABLE):
                # 3) exact vs archive: batch md5 against the STORED hash
                # index. The index is SEMI-JOINED to the batch's distinct
                # md5 set BEFORE the min-ref aggregate, so the shuffle is
                # bounded by matching hashes, never the whole index (AQE
                # broadcasts the batch-sized key set at the usual append
                # cadence; a giant batch degrades to a proportionate
                # shuffle). eqNullSafe so NULL-text docs dedup too —
                # replay idempotency depends on it.
                arch_h = self.broker.read(HASH_TABLE)
                if "ingest_epoch" in arch_h.columns:
                    arch_h = arch_h.drop("ingest_epoch")
                # persisted: feeds the index semi-join AND the hit join —
                # unpersisted it would re-run the anti-join chain (and
                # the new_docs scan under it) once per consumer
                cur_hash = scoped_persist(
                    batch_hash.join(batch.select(id_col), id_col)
                )
                bkeys = cur_hash.select(
                    F.col("text_md5").alias("_bk")).distinct()
                rh = (
                    arch_h.join(
                        bkeys, F.col("text_md5").eqNullSafe(F.col("_bk")),
                        "left_semi",
                    )
                    .groupBy("text_md5").agg(F.min(id_col).alias("ref_id"))
                    .withColumnRenamed("text_md5", "_rh")
                )
                hit = (
                    cur_hash
                    .join(rh, F.col("text_md5").eqNullSafe(F.col("_rh")))
                    .select(id_col, F.col("ref_id").alias("blocked_by"))
                )
                hit = _reject(hit, "archive_exact")
                batch = batch.join(hit.select(id_col), id_col, "left_anti")

                # 4) near vs archive: batch band keys against the STORED
                # band index (the archive is never re-shingled). Whole
                # non-matching buckets are semi-joined away BEFORE the
                # resident-cap window — dropping entire buckets leaves
                # per-bucket ranks unchanged, so the cap semantics are
                # identical while its shuffle+sort is bounded by the
                # batch's buckets, not the index. Exact-Jaccard verify
                # reads archive text only for the CANDIDATES.
                arch_b = self.broker.read(BANDS_TABLE)
                band_epoch = "ingest_epoch" in arch_b.columns
                # persisted for the same two-consumer reason as cur_hash
                # (bucket semi-join + candidate join)
                cur_bands = scoped_persist(
                    batch_bands.join(batch.select(id_col), id_col)
                )
                docs_epochs = (
                    self._epoch_values(DOCS_TABLE)
                    if self.broker._is_partitioned_by(
                        DOCS_TABLE, "ingest_epoch")
                    else None
                ) or set()
                if band_epoch and len(docs_epochs) > EPOCH_PRUNE_MIN:
                    # the exact-Jaccard verify below reads archive text
                    # only from the COLLIDING EPOCHS' leaves — the last
                    # O(corpus) leg of an append without it. The epoch
                    # set comes from the band index BEFORE the candidate
                    # join: one projected scan of (band, key, epoch)
                    # with the batch's key set broadcast-semi-joined, a
                    # dim-sized distinct, one driver collect. A strict
                    # superset of the final candidates' epochs (pruning
                    # stays correct, marginally coarser) — deriving it
                    # from the candidate frame instead forced an EAGER
                    # persist of the full band-join chain, which A/B
                    # measured at +9 s on a 50k append vs this form's
                    # ~1 s scan (the lazy chain then fuses into the
                    # verify job exactly as before).
                    coll_epochs = sorted(
                        r[0] for r in arch_b.join(
                            cur_bands.select("band", "key").distinct(),
                            ["band", "key"], "left_semi",
                        ).select("ingest_epoch").distinct().collect()
                    )
                    arch_text = self.read_epochs(coll_epochs)
                else:
                    # legacy flat corpus (nothing to prune yet —
                    # migrates on this append's write) or a few-epoch
                    # corpus below the EPOCH_PRUNE_MIN gate (the extra
                    # epoch-set job would cost more than it saves)
                    arch_text = self.read()
                if band_epoch:
                    arch_b = arch_b.drop("ingest_epoch")
                arch_b = arch_b.join(
                    cur_bands.select("band", "key").distinct(),
                    ["band", "key"], "left_semi",
                )
                arch_b = cap_bucket_residents(
                    arch_b.withColumnRenamed(id_col, "ref_id"),
                    ["band", "key"], "ref_id", self.max_bucket_docs,
                )
                cand = (
                    cur_bands
                    .join(arch_b, ["band", "key"])
                    .select(id_col, "ref_id")
                    .distinct()
                )
                ref_docs = arch_text.join(
                    cand.select(F.col("ref_id").alias(id_col)).distinct(),
                    id_col,
                )
                ref_sh = word_shingles(
                    spread(ref_docs, id_col), text_col, SHINGLE_N
                ).select(F.col(id_col).alias("ref_id"),
                         F.col("shingles").alias("_sr"))
                nearhit = (
                    cand
                    .join(batch_sh.select(
                        F.col(id_col), F.col("shingles").alias("_sc")),
                        id_col)
                    .join(ref_sh, "ref_id")
                    .withColumn(
                        "jaccard",
                        F.round(
                            F.size(F.array_intersect("_sc", "_sr"))
                            / F.size(F.array_union("_sc", "_sr")),
                            6,
                        ),
                    )
                    .filter(F.col("jaccard") >= self.near_threshold)
                    .groupBy(id_col)
                    .agg(F.min("ref_id").alias("blocked_by"))
                )
                nearhit = _reject(nearhit, "archive_near")
                batch = batch.join(nearhit.select(id_col), id_col, "left_anti")

                # 5) semantic vs archive (opt-in): batch bucket keys
                # against the STORED embedding index — same asymmetric
                # shape as the band check (bucket semi-join, resident
                # cap, epoch-pruned exact verify), cosine instead of
                # Jaccard
                if batch_emb is not None and self.broker.exists(EMB_TABLE):
                    from weatherdb_spark.llm.similarity import cosine

                    arch_e = self.broker.read(EMB_TABLE)
                    e_epoch = "ingest_epoch" in arch_e.columns
                    cur_emb = scoped_persist(
                        batch_emb.join(batch.select(id_col), id_col)
                    )
                    # same epoch-pruned verify shape as the band check
                    # above: colliding epochs from the INDEX before the
                    # candidate join (superset, one projected scan),
                    # gated on epoch count — an eager persist of the
                    # candidate frame to carry epochs is the +9 s shape
                    # the A/B killed on the text path
                    if e_epoch and len(docs_epochs) > EPOCH_PRUNE_MIN:
                        e_epochs = sorted(
                            r[0] for r in arch_e.join(
                                cur_emb.select("table", "bucket")
                                .distinct(),
                                ["table", "bucket"], "left_semi",
                            ).select("ingest_epoch").distinct().collect()
                        )
                        arch_vec_src = self.read_epochs(e_epochs)
                    else:
                        arch_vec_src = self.read()
                    if e_epoch:
                        arch_e = arch_e.drop("ingest_epoch")
                    arch_e = arch_e.join(
                        cur_emb.select("table", "bucket").distinct(),
                        ["table", "bucket"], "left_semi",
                    )
                    arch_e = cap_bucket_residents(
                        arch_e.withColumnRenamed(id_col, "ref_id"),
                        ["table", "bucket"], "ref_id", self.max_bucket_docs,
                    )
                    ecand = (
                        cur_emb
                        .join(arch_e, ["table", "bucket"])
                        .select(id_col, "ref_id")
                        .distinct()
                    )
                    ref_vecs = arch_vec_src.join(
                        ecand.select(
                            F.col("ref_id").alias(id_col)).distinct(),
                        id_col,
                    ).select(
                        F.col(id_col).alias("ref_id"),
                        F.col(embedding_col).alias("_vr"),
                    )
                    semhit = (
                        ecand
                        .join(batch.select(
                            F.col(id_col),
                            F.col(embedding_col).alias("_vc")), id_col)
                        .join(ref_vecs, "ref_id")
                        .withColumn(
                            "cos",
                            F.round(cosine(F.col("_vc"), F.col("_vr")), 6),
                        )
                        .filter(F.col("cos") >= self.semantic_threshold)
                        .groupBy(id_col)
                        .agg(F.min("ref_id").alias("blocked_by"))
                    )
                    semhit = _reject(semhit, "archive_semantic")
                    batch = batch.join(
                        semhit.select(id_col), id_col, "left_anti")

                # 6) image vs archive (opt-in): batch dHash pigeonhole
                # block keys against the STORED fingerprint index —
                # same asymmetric shape (bucket semi-join + resident
                # cap), verified by exact popcount on the fingerprints
                # themselves: no second archive read at all
                if batch_img is not None and self.broker.exists(IMG_TABLE):
                    from weatherdb_spark.llm.dedup import (
                        banded_fingerprint_keys,
                    )

                    arch_i = self.broker.read(IMG_TABLE)
                    if "ingest_epoch" in arch_i.columns:
                        arch_i = arch_i.drop("ingest_epoch")
                    cur_img = scoped_persist(
                        batch_img.join(batch.select(id_col), id_col)
                    )
                    cur_keys = banded_fingerprint_keys(
                        cur_img, "dhash", IMG_MAX_HAMMING, 64, id_col
                    ).withColumnRenamed("dhash", "_fb")
                    arch_keys = banded_fingerprint_keys(
                        arch_i.withColumnRenamed(id_col, "ref_id"),
                        "dhash", IMG_MAX_HAMMING, 64, "ref_id",
                    ).withColumnRenamed("dhash", "_fr")
                    arch_keys = arch_keys.join(
                        cur_keys.select("block", "key").distinct(),
                        ["block", "key"], "left_semi",
                    )
                    arch_keys = cap_bucket_residents(
                        arch_keys, ["block", "key"], "ref_id",
                        self.max_bucket_docs,
                    )
                    imghit = (
                        cur_keys.join(arch_keys, ["block", "key"])
                        .withColumn(
                            "hamming",
                            F.bit_count(
                                F.col("_fb").bitwiseXOR(F.col("_fr"))),
                        )
                        .filter(F.col("hamming") <= IMG_MAX_HAMMING)
                        .groupBy(id_col)
                        .agg(F.min("ref_id").alias("blocked_by"))
                    )
                    imghit = _reject(imghit, "archive_image")
                    batch = batch.join(
                        imghit.select(id_col), id_col, "left_anti")

            # materialize the admitted batch ONCE (count populates the
            # cache; the epoch-leaf write reuses it; the scope releases
            # it): the dedup chain would otherwise re-execute for the
            # count AND the write (reading the archive's pinned
            # pre-flip snapshot — safe either way under the Broker MVCC
            # contract, just wasteful)
            batch = scoped_persist(batch)
            admitted = batch.count()

            def _sized(df: DataFrame, rows: int) -> DataFrame:
                # right-size the epoch leaf: a small batch written from
                # a 32-partition cached plan would land 32 near-empty
                # files — slower to write, and every LATER append
                # hard-links (and every probe lists) them forever
                return df.coalesce(max(1, min(32, int(rows) // 250_000 + 1)))

            # O(batch) write: ONLY the new epoch leaf is materialized
            # (epoch = the snapshot number this append lands in); every
            # archived epoch hard-links from the previous snapshot —
            # the corpus is never rewritten on append. The CORPUS flip
            # lands first (alone): a crash after it leaves side-table
            # gaps on the cheap heal path (docs epoch missing from a
            # side table -> partition-pruned backfill), never ghost
            # side epochs (the expensive full-rebuild direction).
            epoch = (self.broker.table_version(DOCS_TABLE) or 0) + 1
            self.broker.write_partition_append(
                DOCS_TABLE, _sized(batch, admitted), "ingest_epoch", epoch
            )
            # the admitted slice's keys extend the signature indexes —
            # same epoch, same O(batch) leaf-plus-links writes. The
            # remaining snapshot writes (+ the rejection count) target
            # DISJOINT tables, so they run as CONCURRENT Spark jobs:
            # serial they are per-job fixed overhead stacked four-to-
            # five deep — the dominant cost of a small append (profiled
            # 11.4 s of a 25 s 5k-doc append; the r8 verdict's ask #2).
            # Crash-ordering is unchanged: any subset of side flips
            # landing before a crash is healed by the next append's
            # _sync_side_tables directory diff.
            from concurrent.futures import ThreadPoolExecutor

            adm_ids = batch.select(id_col)
            side_writes = [
                (HASH_TABLE, batch_hash.join(adm_ids, id_col), admitted),
                (BANDS_TABLE, batch_bands.join(adm_ids, id_col),
                 admitted * N_BANDS),
            ]
            if batch_emb is not None:
                side_writes.append(
                    (EMB_TABLE, batch_emb.join(adm_ids, id_col),
                     admitted * SEM_N_TABLES))
            if batch_img is not None:
                side_writes.append(
                    (IMG_TABLE, batch_img.join(adm_ids, id_col), admitted))

            def _write_side(table: str, df: DataFrame, rows: int) -> None:
                self.broker.write_partition_append(
                    table, _sized(df, rows), "ingest_epoch", epoch)

            def _write_rejections() -> int:
                rejected = rej[0]
                for r in rej[1:]:
                    rejected = rejected.unionByName(r)
                n_rejected = rejected.count()
                # the rejection log appends the same way, keyed by the
                # corpus version the drops were decided against. A
                # CLEAN append skips the write (an empty leaf carries
                # no audit information and the snapshot flip is pure
                # fixed overhead); the FIRST append always writes so
                # rejections() exists from version 1, per its contract.
                if n_rejected or not self.broker.exists(REJ_TABLE):
                    self.broker.write_partition_append(
                        REJ_TABLE, _sized(rejected, n_rejected),
                        "corpus_version",
                        self.broker.table_version(DOCS_TABLE),
                    )
                return n_rejected

            with ThreadPoolExecutor(max_workers=len(side_writes) + 1) \
                    as pool:
                futures = [pool.submit(_write_side, *sw)
                           for sw in side_writes]
                rej_future = pool.submit(_write_rejections)
                for f in futures:
                    f.result()
                n_rejected = rej_future.result()
            # every job that read the scratch cut has completed
            if scratch is not None:
                _shutil.rmtree(scratch, ignore_errors=True)
            return {
                "admitted": admitted,
                "rejected": n_rejected,
                "version": self.broker.table_version(DOCS_TABLE),
            }


def stream_into_corpus(
    stream: DataFrame,
    store: CorpusStore,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    embedding_col: str | None = None,
    image_col: str | None = None,
    collapse_batch: bool = False,
    await_termination: bool = True,
):
    """Tail a document stream into the :class:`CorpusStore`: each
    micro-batch lands via :meth:`CorpusStore.append`, so documents
    arriving in DIFFERENT micro-batches dedup against each other
    through the archive checks — warehouse-backed exact/near dedup
    with no stream state at all, the durable complement to the bounded
    approximate ``streaming/neardup`` family (whose resident caps and
    TTLs can forget; the archive cannot).

    Replay note: ``foreachBatch`` may replay a batch after a failure.
    A replayed document is by definition an exact duplicate of its
    archived copy, so the archive_exact check rejects it — the append
    is idempotent by construction (the rejection log grows, the corpus
    does not).
    """
    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.append(batch_df, id_col=id_col, text_col=text_col,
                     embedding_col=embedding_col, image_col=image_col,
                     collapse_batch=collapse_batch)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
