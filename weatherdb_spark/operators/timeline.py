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

_UNIT_SECONDS = {
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _interval_seconds(interval: str) -> int:
    """Fixed-duration interval literal -> seconds. Calendar units (month,
    year) have no fixed duration and are rejected — the engine's grids are
    10-minute and daily (station/constants.py:4-19)."""
    num, unit = interval.split()
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"interval {interval!r}: only fixed-duration units supported")
    return int(num) * _UNIT_SECONDS[unit]


def expand_timeline(
    df: DataFrame,
    interval: str,
    ts_col: str = "timestamp",
    group_cols: Sequence[str] = ("station_id",),
    start: str | None = None,
    end: str | None = None,
    min_date: str | None = "__config__",
) -> DataFrame:
    """Return ``df`` with missing grid timestamps inserted as NULL rows.

    ``interval`` is a Spark interval literal ('10 minutes', '1 day').
    ``start``/``end`` override the per-group observed bounds (the reference
    uses the global ``parameter_variables`` bounds, models.py:239-254).
    ``min_date`` defaults to the user-config [data] min_date (shipped
    default MIN_DATE); pass None for no cut.
    """
    if min_date == "__config__":
        from weatherdb_spark.userconfig import get_config

        min_date = get_config().get("data", "min_date", fallback=MIN_DATE)
    bounds = df.groupBy(*group_cols).agg(
        F.min(ts_col).alias("_start"), F.max(ts_col).alias("_end")
    )
    start_c = F.lit(start).cast("timestamp") if start else F.col("_start")
    end_c = F.lit(end).cast("timestamp") if end else F.col("_end")
    if min_date:
        start_c = F.greatest(start_c, F.lit(min_date).cast("timestamp"))
    # Two-level explode: one sequence() per station would materialize a
    # multi-decade 10-min grid (~1.3M timestamps) as a single in-row array —
    # a memory and skew hazard at scale. Chunk indices explode first (tiny
    # arrays), then each (station, chunk) row generates at most CHUNK grid
    # points — same phase-exact grid ``start + k * step``, bounded memory,
    # and the rows of one station spread over many tasks.
    step_s = _interval_seconds(interval)
    chunk = 50_000
    bounds = bounds.select(*group_cols, start_c.alias("_start"), end_c.alias("_end"))
    # a group whose whole archive predates min_date (or an explicit
    # end < start) has a NEGATIVE step count — Spark's sequence(0, n<0)
    # counts DOWN, exploding descending chunk ids into ~n^2/(2*chunk)
    # spurious rows plus a phantom k=0 grid row; such groups produce no
    # grid at all (their rows are all cut by the min_date filter anyway)
    bounds = bounds.filter(F.col("_end") >= F.col("_start"))
    n_steps = F.floor(
        (F.unix_timestamp("_end") - F.unix_timestamp("_start")) / step_s
    )  # k ranges 0..n_steps inclusive
    chunks = bounds.select(
        *group_cols,
        "_start",
        n_steps.alias("_n"),
        F.explode(F.sequence(F.lit(0), F.floor(n_steps / chunk))).alias("_c"),
    )
    k = F.explode(
        F.sequence(
            F.col("_c") * chunk,
            F.least(F.col("_c") * chunk + (chunk - 1), F.col("_n")),
        )
    ).alias("_k")
    ts_type = dict(df.dtypes)[ts_col]  # keep the caller's timestamp/date type
    grid = chunks.select(*group_cols, "_start", k).select(
        *group_cols,
        F.timestamp_seconds(F.unix_timestamp("_start") + F.col("_k") * step_s)
        .cast(ts_type)
        .alias(ts_col),
    )
    # deliberately unhinted: a shuffle-hash hint would make the fact
    # side the hash build side — |table|/shuffle_partitions rows in an
    # in-memory hash that cannot spill, an executor-OOM hazard on a
    # large archive. Sort-merge is spill-safe; AQE still picks the hash
    # strategy at runtime when a partition is genuinely small.
    out = grid.join(df, on=[*group_cols, ts_col], how="left")
    if min_date:
        out = out.filter(F.col(ts_col) >= F.lit(min_date).cast("timestamp"))
    return out
