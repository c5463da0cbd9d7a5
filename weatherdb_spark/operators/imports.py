"""F7 — import-time deduplication (reference StationBases.py:1232-1243,
StationP.py:211-217).

DWD historical and recent files overlap; on duplicate timestamps the first
file (in listing order) wins, and duplicates *within* one source collapse
to the mean. Declarative Spark form: rank sources per key, keep the
minimum source rank, average the survivors — two keyed aggregations, no
window over the full facts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_imports(
    df: DataFrame,
    key_cols: Sequence[str],
    src_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Collapse duplicate keys: rows from the smallest ``src_col`` value
    win (first file in listing order); remaining same-source duplicates
    average per value column. Returns one row per key."""
    keys = list(key_cols)
    first_src = df.groupBy(*keys).agg(F.min(src_col).alias("_first_src"))
    survivors = df.join(first_src, keys).filter(
        F.col(src_col) == F.col("_first_src")
    )
    return survivors.groupBy(*keys).agg(
        *[F.avg(c).alias(c) for c in value_cols]
    )


def first_file_key(file_col: str):
    """The F7 winner ordering for DWD source files: file NAME first
    (zip-extracted members live in a staging dir whose path must not
    decide which duplicate wins against a plain file in the source dir),
    full path as the tie-break so two distinct files sharing a basename
    still yield exactly ONE winner per key."""
    return F.struct(
        F.substring_index(F.col(file_col), "/", -1).alias("name"),
        F.col(file_col).alias("path"),
    )


def first_file_rows(
    df: DataFrame, key_cols: Sequence[str], file_col: str
) -> DataFrame:
    """Rows of the first file (per :func:`first_file_key` order) for each
    key — the shared F7 building block of the P and daily ingest chains.
    Within-file duplicate keys survive here; callers collapse them to the
    mean (StationBases.py:1232-1243) in their own aggregation."""
    keys = list(key_cols)
    fk = first_file_key(file_col)
    first = df.groupBy(*keys).agg(F.min(fk).alias("_first_file"))
    return df.join(first, keys).filter(fk == F.col("_first_file")).drop(
        "_first_file"
    )
