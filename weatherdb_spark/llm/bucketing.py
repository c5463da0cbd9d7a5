"""Per-bucket resident caps for the batch LSH candidate generators.

A bucketed candidate join is quadratic INSIDE each bucket: an
adversarial corpus (many near-identical embeddings or stop-word shingle
sets — exactly what a dedup corpus contains by definition) collapses
into one hot (table, bucket) group and the pair join inside it goes
O(B^2). The streaming near-dup twins already bound this with
``max_bucket_docs`` residents per bucket
(``streaming/neardup.py``); this module gives the batch paths the same
knob with matching semantics:

- Residents are the first ``cap`` documents per bucket in ascending id
  order (batch has no arrival order; id order is the deterministic
  proxy, and it makes the bound composable with the ``id_a < id_b``
  pair filter: a pair survives iff its SMALLER id is a resident).
- Non-residents still get compared — against residents — mirroring the
  stream, where a full bucket stops accumulating but every arrival is
  still checked against the resident set. Per-bucket candidate count
  drops from B*(B-1)/2 to cap*(B - (cap+1)/2): linear in B.
- NO SILENT CAPS: enabling a cap logs the setting, and
  :func:`bucket_overflow` reports exactly which buckets overflowed and
  how many resident slots were denied, so a pipeline can record the
  truncation instead of silently reading "covered everything". The
  bucketed streams are internal to the pipelines, so each exposes a
  ready-made companion that rebuilds the identical stream (the hashes
  are deterministic): ``llm.dedup.minhash_bucket_overflow`` and
  ``llm.similarity.cosine_bucket_overflow``.

Default everywhere is ``None`` (uncapped) — results and oracles are
unchanged unless a pipeline opts in.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

logger = logging.getLogger(__name__)


def cap_bucket_residents(
    bucketed: DataFrame,
    key_cols: list[str],
    id_col: str,
    cap: int | None,
) -> DataFrame:
    """Keep only the first ``cap`` rows per bucket in ascending
    ``id_col`` order; ``cap=None`` returns the input untouched (no extra
    shuffle in the default path).

    The rank is a per-bucket ``row_number`` — one shuffle+sort on the
    bucket key, the same exchange the candidate join needs anyway, and
    it replaces a potentially quadratic blow-up so the trade is strictly
    favorable on the corpora that need it.
    """
    if cap is None:
        return bucketed
    if cap < 1:
        raise ValueError(f"max_bucket_docs must be >= 1, got {cap}")
    logger.warning(
        "LSH bucket cap active: max %d residents per %s bucket "
        "(deterministic by ascending %s). Pairs whose smaller id is not "
        "a resident of the first colliding bucket are DROPPED; quantify "
        "with llm.dedup.minhash_bucket_overflow / "
        "llm.similarity.cosine_bucket_overflow at the same parameters.",
        cap, "x".join(key_cols), id_col,
    )
    w = W.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    return (
        bucketed.withColumn("_res_rk", F.row_number().over(w))
        .filter(F.col("_res_rk") <= cap)
        .drop("_res_rk")
    )


def bucket_overflow(
    bucketed: DataFrame,
    key_cols: list[str],
    cap: int,
) -> DataFrame:
    """Per-bucket overflow report for a resident cap: one row per bucket
    whose population exceeds ``cap`` with the population and the number
    of denied resident slots. Empty result == the cap never engaged and
    the capped pipeline's pairs are identical to the uncapped one's.
    """
    return (
        bucketed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > cap)
        .withColumn("n_denied", F.col("n_docs") - cap)
    )
