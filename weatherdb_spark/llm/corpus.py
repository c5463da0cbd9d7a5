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
applied to corpus curation. This is the incremental form of corpus
dedup: the N-th append does not re-pay the first N-1 batches.
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
    def read(self, version: int | None = None) -> DataFrame:
        return self.broker.read(DOCS_TABLE, version=version)

    def rejections(self) -> DataFrame:
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
        from weatherdb_spark.llm.dedup import (
            exact_contamination,
            exact_dedup,
            minhash_contamination,
            minhash_lsh_pairs,
        )

        with self.broker.activate():
            batch = new_docs
            rej = []

            # 1) within-batch exact collapse (smallest id survives)
            exact = exact_dedup(batch, id_col, text_col)
            dup_ids = exact.filter(~F.col("is_kept")).select(id_col)
            rej.append(dup_ids.withColumn("reason", F.lit("batch_exact")))
            batch = batch.join(dup_ids, id_col, "left_anti")

            # 2) within-batch near-dup collapse (larger id of a pair)
            near = minhash_lsh_pairs(
                batch, threshold=self.near_threshold,
                id_col=id_col, text_col=text_col,
                max_bucket_docs=self.max_bucket_docs,
            ).select(F.col("id_b").alias(id_col)).distinct()
            rej.append(near.withColumn("reason", F.lit("batch_near")))
            batch = batch.join(near, id_col, "left_anti")

            if self.broker.exists(DOCS_TABLE):
                archive = self.read()
                # 3) exact vs archive
                hit = exact_contamination(
                    batch, archive, id_col, text_col
                ).select(id_col)
                rej.append(hit.withColumn("reason", F.lit("archive_exact")))
                batch = batch.join(hit, id_col, "left_anti")
                # 4) near vs archive (asymmetric band join: archive side
                # shuffles band keys once, batch side is the small probe)
                nearhit = minhash_contamination(
                    batch, archive, threshold=self.near_threshold,
                    id_col=id_col, text_col=text_col,
                    max_bucket_docs=self.max_bucket_docs,
                ).select(id_col).distinct()
                rej.append(nearhit.withColumn("reason", F.lit("archive_near")))
                batch = batch.join(nearhit, id_col, "left_anti")
            else:
                archive = None

            # materialize the admitted batch ONCE: the dedup chain would
            # otherwise re-execute for the count AND the snapshot write
            # (reading the archive's pinned pre-flip snapshot — safe
            # either way under the Broker MVCC contract, just wasteful)
            batch = batch.localCheckpoint(eager=True)
            admitted = batch.count()
            merged = (archive.unionByName(batch) if archive is not None
                      else batch)
            self.broker.write(DOCS_TABLE, merged)

            rejected = rej[0]
            for r in rej[1:]:
                rejected = rejected.unionByName(r)
            rejected = rejected.withColumn(
                "corpus_version",
                F.lit(self.broker.table_version(DOCS_TABLE)),
            ).localCheckpoint(eager=True)
            n_rejected = rejected.count()
            prior = (
                self.broker.read(REJ_TABLE)
                if self.broker.exists(REJ_TABLE) else None
            )
            log = (prior.unionByName(rejected) if prior is not None
                   else rejected)
            self.broker.write(REJ_TABLE, log)
            return {
                "admitted": admitted,
                "rejected": n_rejected,
                "version": self.broker.table_version(DOCS_TABLE),
            }
