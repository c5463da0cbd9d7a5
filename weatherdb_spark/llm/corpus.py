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
applied to corpus curation. BOTH costs are incremental: the N-th
append's dedup joins never re-dedup the archive against itself, and
the snapshot WRITE is O(batch) too — the corpus is partitioned by
INGEST EPOCH (one ``ingest_epoch=N`` leaf per append, N = the snapshot
number it landed in) and each append writes only its own epoch leaf
while every earlier epoch hard-links byte-identically from the
previous snapshot (``Broker.write_partition_append``, the dim-table
twin of the fact tables' partial-year writes). The rejection log
appends the same way, partitioned by ``corpus_version``. A corpus
written by a pre-epoch engine migrates on its first append (one full
rewrite into ``ingest_epoch=0``, never again). Time travel, the MVCC
manifest flip, and the dedup/rejection semantics are unchanged.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import SparkSession

DOCS_TABLE = "corpus_documents"
REJ_TABLE = "corpus_rejections"


class CorpusStore:
    """See module docstring. ``warehouse_dir`` may be shared with a
    weather Broker warehouse or stand alone; only the generic snapshot
    tables above are touched."""

    def __init__(self, spark: "SparkSession", warehouse_dir: str,
                 near_threshold: float = 0.8,
                 max_bucket_docs: int | None = None):
        from weatherdb_spark.broker import Broker

        self.broker = Broker(spark, warehouse_dir)
        self.spark = spark
        self.near_threshold = near_threshold
        self.max_bucket_docs = max_bucket_docs

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

    def rejections(self) -> DataFrame:
        # corpus_version is the partition key (discovery restores it)
        return self.broker.read(REJ_TABLE)

    def versions(self) -> list[int]:
        return self.broker.table_versions(DOCS_TABLE)

    # ---------------------------------------------------------- append
    def append(self, new_docs: DataFrame,
               id_col: str = "doc_id", text_col: str = "text") -> dict:
        """Admit ``new_docs`` into the corpus; returns
        ``{"admitted": n, "rejected": n, "version": v}``.

        Runs under the warehouse mutex like every Broker stage: the
        write is a snapshot flip, so readers planned against the old
        corpus finish cleanly.
        """
        from weatherdb_spark.functions.caching import cache_scope, scoped_persist
        from weatherdb_spark.llm.dedup import (
            exact_contamination,
            minhash_contamination,
            minhash_lsh_pairs,
        )

        # cache_scope: the dedup operators scoped_persist their shingle
        # intermediates (archive-sized on the contamination side); a
        # long-lived session appending repeatedly must not accumulate
        # dead blocks (the engine-wide cache-hygiene invariant)
        with self.broker.activate(), cache_scope():
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

            # 1) within-batch exact collapse (smallest id survives);
            # the batch self-contamination join yields each dup's keeper
            dup = (
                exact_contamination(batch, batch, id_col, text_col)
                .filter(F.col("ref_id") != F.col(id_col))
                .groupBy(id_col).agg(F.min("ref_id").alias("blocked_by"))
                .filter(F.col("blocked_by") < F.col(id_col))
            )
            dup = _reject(dup, "batch_exact")
            batch = batch.join(dup.select(id_col), id_col, "left_anti")

            # 2) within-batch near-dup collapse (larger id of a pair)
            near = (
                minhash_lsh_pairs(
                    batch, threshold=self.near_threshold,
                    id_col=id_col, text_col=text_col,
                    max_bucket_docs=self.max_bucket_docs,
                )
                .groupBy(F.col("id_b").alias(id_col))
                .agg(F.min("id_a").alias("blocked_by"))
            )
            near = _reject(near, "batch_near")
            batch = batch.join(near.select(id_col), id_col, "left_anti")

            if self.broker.exists(DOCS_TABLE):
                archive = self.read()
                # 3) exact vs archive
                hit = exact_contamination(
                    batch, archive, id_col, text_col
                ).select(id_col, F.col("ref_id").alias("blocked_by"))
                hit = _reject(hit, "archive_exact")
                batch = batch.join(hit.select(id_col), id_col, "left_anti")
                # 4) near vs archive (asymmetric band join: archive side
                # shuffles band keys once, batch side is the small probe)
                nearhit = (
                    minhash_contamination(
                        batch, archive, threshold=self.near_threshold,
                        id_col=id_col, text_col=text_col,
                        max_bucket_docs=self.max_bucket_docs,
                    )
                    .groupBy(id_col)
                    .agg(F.min("ref_id").alias("blocked_by"))
                )
                nearhit = _reject(nearhit, "archive_near")
                batch = batch.join(nearhit.select(id_col), id_col, "left_anti")

            # materialize the admitted batch ONCE (count populates the
            # cache; the epoch-leaf write reuses it; the scope releases
            # it): the dedup chain would otherwise re-execute for the
            # count AND the write (reading the archive's pinned
            # pre-flip snapshot — safe either way under the Broker MVCC
            # contract, just wasteful)
            batch = scoped_persist(batch)
            admitted = batch.count()
            # O(batch) write: ONLY the new epoch leaf is materialized
            # (epoch = the snapshot number this append lands in); every
            # archived epoch hard-links from the previous snapshot —
            # the corpus is never rewritten on append
            epoch = (self.broker.table_version(DOCS_TABLE) or 0) + 1
            self.broker.write_partition_append(
                DOCS_TABLE, batch, "ingest_epoch", epoch
            )

            rejected = rej[0]
            for r in rej[1:]:
                rejected = rejected.unionByName(r)
            n_rejected = rejected.count()
            # the rejection log appends the same way, keyed by the
            # corpus version the drops were decided against
            self.broker.write_partition_append(
                REJ_TABLE, rejected, "corpus_version",
                self.broker.table_version(DOCS_TABLE),
            )
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
        store.append(batch_df, id_col=id_col, text_col=text_col)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
