"""S6 — timeline expansion.

The reference inserts missing timestamps with
``generate_series(min_date, bound, interval) LEFT JOIN`` per station table
(weatherdb/station/StationBases.py:486-522). Spark-first: per station emit
``explode(sequence(start, stop, interval))`` from the station's own bounds
(one row per station feeds the generator — no driver loop, no cross join of
a global calendar against all stations), then left-join facts back.

Scale note: the exploded timeline inherits the per-station row, so it is
already distributed; the join with the fact table is an equi join on
(station_id, ts) that AQE handles. Rows before ``min_date`` are dropped, as
the reference deletes them (StationBases.py:519-522).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weatherdb_spark.config import MIN_DATE


def expand_timeline(
    df: DataFrame,
    interval: str,
    ts_col: str = "timestamp",
    group_cols: Sequence[str] = ("station_id",),
    start: str | None = None,
    end: str | None = None,
    min_date: str | None = MIN_DATE,
) -> DataFrame:
    """Return ``df`` with missing grid timestamps inserted as NULL rows.

    ``interval`` is a Spark interval literal ('10 minutes', '1 day').
    ``start``/``end`` override the per-group observed bounds (the reference
    uses the global ``parameter_variables`` bounds, models.py:239-254).
    """
    bounds = df.groupBy(*group_cols).agg(
        F.min(ts_col).alias("_start"), F.max(ts_col).alias("_end")
    )
    start_c = F.lit(start).cast("timestamp") if start else F.col("_start")
    end_c = F.lit(end).cast("timestamp") if end else F.col("_end")
    if min_date:
        start_c = F.greatest(start_c, F.lit(min_date).cast("timestamp"))
    grid = bounds.select(
        *group_cols,
        F.explode(
            F.sequence(start_c, end_c, F.expr(f"INTERVAL {interval}"))
        ).alias(ts_col),
    )
    out = grid.join(df, on=[*group_cols, ts_col], how="left")
    if min_date:
        out = out.filter(F.col(ts_col) >= F.lit(min_date).cast("timestamp"))
    return out
