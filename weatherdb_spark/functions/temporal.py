"""Temporal scalar expressions (SURVEY.md §2.8) — all JVM-side built-ins.

Citations into /root/reference:
- winter months {1,2,3,10,11,12}: StationBases.py:1408-1412 and
  StationP.py:562-565 (defined twice there; once here).
- shifted day boundary casts ``(ts - INTERVAL '6h')::date`` /
  ``'5h 50min'``: StationP.py:109, 720-730.
- date_trunc resampling: StationBases.py:2570.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark date_trunc format per lattice entry (station/constants.py:4-19)
_TRUNC_FMT = {
    "10 min": None,  # handled specially: floor to 10-minute grid
    "hour": "hour",
    "day": "day",
    "month": "month",
    "year": "year",
    "decade": None,  # handled specially
}


def is_winter(ts: Column) -> Column:
    """True for hydrological winter months 1-3 and 10-12."""
    return F.month(ts).isin(1, 2, 3, 10, 11, 12)


def shifted_date(ts: Column, shift: str = "6 hours") -> Column:
    """Day key with a shifted boundary: ``(ts - interval)::date``.

    The reference uses '-6h' for the QC daily comparison (StationP.py:109)
    and '-5h 50min' for the daily fillup adjustment (StationP.py:720-730)
    because DWD daily precipitation is measured 05:50→05:50 UTC.
    """
    return F.to_date(ts - F.expr(f"INTERVAL {shift}"))


def trunc_expr(ts: Column, agg_to: str) -> Column:
    """``date_trunc`` generalized over the reference's aggregation lattice,
    including the non-standard '10 min' and 'decade' targets."""
    if agg_to == "10 min":
        return F.timestamp_seconds((F.unix_timestamp(ts) / 600).cast("long") * 600)
    if agg_to == "decade":
        return F.make_date((F.year(ts) / 10).cast("int") * 10, F.lit(1), F.lit(1)).cast("timestamp")
    fmt = _TRUNC_FMT.get(agg_to)
    if fmt is None:
        raise ValueError(f"agg_to {agg_to!r} not in the aggregation lattice")
    return F.date_trunc(fmt, ts)
