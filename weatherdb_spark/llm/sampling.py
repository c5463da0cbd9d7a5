"""Deterministic sampling for training-data mixing.

``df.sample`` draws from a per-partition RNG: the kept set changes with
the partition layout, executor count, and Spark version — useless for a
reproducible train/eval split or a pinned data mix. These samplers hash
the DOCUMENT ID (md5, the engine's cross-engine hash — see
``llm/hashing.py``), so membership is a pure function of
(id, salt, fraction):

- re-running the pipeline keeps the same documents;
- growing the corpus never flips an existing document's membership
  (only new ids join);
- disjoint salts give independent samples (train/val/test splits);
- a DuckDB oracle can verify the exact kept set.

Both samplers are pure filters — no shuffle, no state; at 100 TB they
ride the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from weatherdb_spark.llm.hashing import md5_int64

#: hash-space denominator: fractions quantize to 1/1e6 (an exact
#: integer threshold — no float boundary ambiguity between engines)
SAMPLE_MOD = 1_000_000


def _sample_slot(id_col: Column, salt: str) -> Column:
    """Uniform slot in [0, SAMPLE_MOD) as a pure function of (id, salt)."""
    return F.pmod(
        md5_int64(F.concat(id_col.cast("string"), F.lit(salt))),
        F.lit(SAMPLE_MOD),
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of
    (``id_col``, ``salt``). Distinct salts give independent samples."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(round(fraction * SAMPLE_MOD))
    return df.filter(_sample_slot(F.col(id_col), salt) < threshold)


def source_quota_cap(
    df: DataFrame,
    quota: int,
    strata_col: str = "source",
    salt: str = "",
    id_col: str = "doc_id",
    merge_buckets: int = 16,
) -> DataFrame:
    """Cap every stratum at EXACTLY ``min(quota, stratum size)`` kept
    documents — the over-represented-domain downsampler ("no single
    source exceeds N documents"), where the fractional
    :func:`stratified_mix` only approximates a target count.

    Kept = the ``quota`` smallest (hash slot, id) pairs per stratum, so
    membership is a deterministic function of (id, salt, quota) and
    raising the quota only ever ADDS documents (monotone, like the
    fractional sampler).

    Scale shape: exact per-group top-N without a per-stratum sort
    window — a giant stratum (half the corpus from one crawl domain)
    would make ``row_number`` sort fact-sized partitions. Instead a
    two-level hash aggregate: each (stratum, slot mod ``merge_buckets``)
    group keeps its ``quota`` head by ``collect_list + array_sort +
    slice`` (every list bounded by the group's rows, every survivor list
    by ``quota``), then the per-stratum merge re-ranks at most
    ``merge_buckets * quota`` rows. Map-side partial aggregation bounds
    memory; no partition ever holds a stratum's full row set in one
    sorter.
    """
    if quota <= 0:
        raise ValueError(f"quota must be positive, got {quota}")
    slot = _sample_slot(F.col(id_col), salt)
    ranked = df.select(
        F.col(strata_col), F.struct(slot.alias("slot"), F.col(id_col).alias("id")).alias("_k")
    )
    head = F.slice(F.array_sort(F.collect_list("_k")), 1, quota).alias("_head")
    merged = (
        ranked.groupBy(strata_col, F.pmod(F.col("_k.slot"), F.lit(merge_buckets)).alias("_mb"))
        .agg(head)
        .select(strata_col, F.explode("_head").alias("_k"))
        .groupBy(strata_col)
        .agg(head)
    )
    return merged.select(
        strata_col, F.posexplode("_head").alias("_pos", "_k")
    ).select(
        F.col("_k.id").alias(id_col),
        strata_col,
        (F.col("_pos") + 1).alias("keep_rank"),
    )


def stratified_mix(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing step of a
    training pipeline ("30% of source A, 80% of source B, drop the
    rest"). ``weights`` maps a stratum value to its keep fraction;
    strata not listed are DROPPED (an explicit ``{"other": 1.0}``-style
    entry cannot be silently forgotten — absence means exclusion, the
    safe default for a curated mix).

    The keep decision hashes only (id, salt), NOT the stratum, so
    re-weighting a stratum later keeps a superset/subset of the same
    documents (monotone in the weight) instead of resampling the world.
    """
    for k, v in weights.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"weight for stratum {k!r} must be in [0, 1], got {v}")
    if not weights:
        return df.filter(F.lit(False))
    # CASE stratum WHEN k THEN threshold_k ... ELSE NULL END — a NULL
    # threshold fails the < comparison, dropping unlisted strata
    thr = None
    for k, v in sorted(weights.items()):
        t = F.lit(int(round(v * SAMPLE_MOD)))
        cond = F.col(strata_col) == F.lit(k)
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    return df.filter(_sample_slot(F.col(id_col), salt) < thr)
