"""Scaled-integer storage mode (opt-in).

The reference database stores every value column as value x decimals
rounded to an integer (import path StationBases.py:1080-1082: ``*
self._decimals -> .round(0).astype("Int64")``) and divides on read
(``get_df(db_unit=False)``, StationBases.py:2638-2643). The engine's
default is double end-to-end with stage-wise rounding (the
SURVEY-sanctioned delta); these helpers give users who need
bit-identical database dumps the reference's storage form:

- :func:`to_db_unit` converts a double table to scaled-int storage;
- :func:`from_db_unit` converts back;
- ``api.get_df`` auto-divides integral kind columns on read unless
  called with ``db_unit=True`` (the reference's parameter of the same
  name), so a scaled-int table reads identically to a double table.

Kinds in ``KINDS_NOT_DECIMAL`` (qn, filled_by, filled_share —
StationBases.py:60) and ``*_na_share`` columns are exempt on both
directions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from weatherdb_spark.config import KINDS_NOT_DECIMAL, PARAMETERS


# ------------------------------------------------- column-level forms
# (used for ingest from reference database dumps and stage-wise rounding)

def to_db_units(col: Column, decimals: int, kind: str = "raw") -> Column:
    """value -> round(value * decimals) as long (ingest direction).

    Half-even (bround) and long, matching :func:`to_db_unit` and the
    reference's pandas ``.round(0).astype('Int64')`` — HALF_UP here would
    store 12.5 as 13 where the DataFrame form stores 12."""
    if kind in KINDS_NOT_DECIMAL:
        return col
    return F.bround(col * decimals, 0).cast("long")


def from_db_units(col: Column, decimals: int, kind: str = "raw") -> Column:
    """scaled int -> physical double (read direction)."""
    if kind in KINDS_NOT_DECIMAL:
        return col
    return col.cast("double") / decimals


def round_stagewise(col: Column, decimals: int) -> Column:
    """Round to the parameter's storage precision — the reference rounds at
    every pipeline stage (``round(nb.qc ± coef)::int``,
    StationBases.py:1403,1422); we reproduce that so values match."""
    ndigits = len(str(decimals)) - 1  # 100 -> 2, 10 -> 1
    return F.round(col, ndigits)


# ---------------------------------------------- DataFrame-level forms

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

_KEY_COLS = ("station_id", "timestamp", "station_bucket")


def _decimal_cols(df: DataFrame, value_cols: Sequence[str] | None) -> list[str]:
    if value_cols is not None:
        return list(value_cols)
    return [
        c for c in df.columns
        if c not in _KEY_COLS
        and c not in KINDS_NOT_DECIMAL
        and not c.endswith("_na_share")
    ]


def to_db_unit(
    df: DataFrame, parameter: str, value_cols: Sequence[str] | None = None
) -> DataFrame:
    """value x decimals, rounded half-even like the reference's pandas
    ``.round(0)``, stored as long (nullable Int64 twin)."""
    dec = PARAMETERS[parameter]["decimals"]
    for c in _decimal_cols(df, value_cols):
        df = df.withColumn(c, F.bround(F.col(c) * dec, 0).cast("long"))
    return df


def from_db_unit(
    df: DataFrame, parameter: str, value_cols: Sequence[str] | None = None
) -> DataFrame:
    """Divide integral value columns back to the physical unit. Columns
    already floating are passed through (mixed tables read safely)."""
    dec = PARAMETERS[parameter]["decimals"]
    for c in _decimal_cols(df, value_cols):
        if isinstance(df.schema[c].dataType, _INTEGRAL):
            df = df.withColumn(c, F.col(c).cast("double") / dec)
    return df
