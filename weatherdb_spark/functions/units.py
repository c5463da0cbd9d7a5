"""Scaled-integer unit conversion.

The reference stores measurements as value * decimals rounded to int
(StationBases.py:3127, 1080-1082) and divides on read (2638-2643). Kinds
``qn, filled_by, filled_share`` are exempt (StationBases.py:60). We store
physical doubles but expose the same conversions so ingest from reference
dumps and stage-wise integer rounding (SURVEY.md §7.4) reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UNSCALED_KINDS = {"qn", "filled_by", "filled_share"}


def to_db_units(col: Column, decimals: int, kind: str = "raw") -> Column:
    """value -> round(value * decimals) as int (ingest direction)."""
    if kind in UNSCALED_KINDS:
        return col
    return F.round(col * decimals).cast("int")


def from_db_units(col: Column, decimals: int, kind: str = "raw") -> Column:
    """scaled int -> physical double (read direction)."""
    if kind in UNSCALED_KINDS:
        return col
    return (col.cast("double") / decimals)


def round_stagewise(col: Column, decimals: int) -> Column:
    """Round to the parameter's storage precision — the reference rounds at
    every pipeline stage (``round(nb.qc ± coef)::int``,
    StationBases.py:1403,1422); we reproduce that so values match."""
    ndigits = len(str(decimals)) - 1  # 100 -> 2, 10 -> 1
    return F.round(col, ndigits)
