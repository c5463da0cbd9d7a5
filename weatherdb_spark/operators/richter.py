"""Richter correction — precipitation undercatch correction (P only).

Reference: StationP.py:486-652, docs/source/Methode.md:132-154.
Spark-first shape: one join of the 10-min facts to a per-day correction
dim (computed by one daily aggregation + a broadcast join of the T series
and the 4-row Richter parameter table). Everything broadcastable except
the fact-side shuffle on (station_id, day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weatherdb_spark.config import RICHTER_CLASS_BINS, RICHTER_PARAMETERS

# Above this many (station, day) rows the correction dim stops being
# broadcastable (~50M rows x ~30 B ≈ 1.5 GB on every executor) and the
# join-back falls to sort-merge. See richter_correct.
BROADCAST_STATION_DAYS_MAX = 50_000_000


def richter_class(horizon_col) -> F.Column:
    """S9 — horizon angle -> exposure class via the reference's bins
    {[0,3) no, [3,7) little, [7,12) protected, [12,inf) heavy}
    (StationP.py:33-50,264-271,450-484)."""
    expr = F.lit(None).cast("string")
    for name, lo, hi in reversed(RICHTER_CLASS_BINS):
        cond = horizon_col >= lo if hi == float("inf") else (
            (horizon_col >= lo) & (horizon_col < hi)
        )
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return expr


def richter_class_scalar(horizon: float | None) -> str | None:
    """Driver-side twin of :func:`richter_class` over the same bins —
    one source of truth for both the stage recompute (Column form) and
    the per-station meta patch (Station.update_richter_class)."""
    if horizon is None:
        return None
    for name, lo, hi in RICHTER_CLASS_BINS:
        if lo <= horizon < hi:
            return name
    return None


def richter_parameters_df(spark: SparkSession) -> DataFrame:
    """The 4-row coefficient dim (db/fixtures/RichterParameters.json)."""
    rows = [
        (
            p["precipitation_typ"],
            p["e"],
            p["b_no-protection"],
            p["b_little-protection"],
            p["b_protected"],
            p["b_heavy-protection"],
        )
        for p in RICHTER_PARAMETERS
    ]
    return spark.createDataFrame(
        rows,
        "precipitation_typ string, e double, b_no double, b_little double, "
        "b_protected double, b_heavy double",
    )


def precipitation_type(temp_col, month_col) -> F.Column:
    """Daily precip type from filled temperature (StationP.py:571-587):
    >= 3 °C -> precip_summer/precip_winter by month; <= -0.7 °C -> snow;
    else mix."""
    summer = ~month_col.isin(1, 2, 3, 10, 11, 12)
    return (
        F.when(temp_col >= 3.0, F.when(summer, "precip_summer").otherwise("precip_winter"))
        .when(temp_col <= -0.7, F.lit("snow"))
        .otherwise(F.lit("mix"))
    )


def richter_correct(
    ts_p: DataFrame,
    ts_t: DataFrame,
    meta_p: DataFrame,
    richter_params: DataFrame,
    round_digits: int = 2,
    broadcast_correction: bool | None = None,
    est_station_days: int | None = None,
) -> DataFrame:
    """Full Richter correction over the tall 10-min table.

    1. daily sums of ``filled`` and wet-interval counts per station
       (A3, StationP.py:549-557);
    2. LEFT JOIN daily filled T (J6, StationP.py:572-587) -> precip type;
    3. broadcast-join the 4-row params on type (J7), pick the b column for
       the station's richter_class (StationP.py:590-602);
    4. delta = b * (daily_sum ** e), distributed equally over that day's
       wet 10-min intervals: corr = filled + delta/count_n where
       filled > 0 else filled (StationP.py:604-618).

    ``ts_t`` must provide (station_id, timestamp(date), filled).
    Returns ts_p + ``corr``.

    ``broadcast_correction``: the per-(station, day) correction dim is
    144x smaller than the 10-min fact table, and the daily aggregation's
    map-side combine means the only shuffle that moves is dim-sized —
    broadcasting the dim then joins corr back WITHOUT shuffling the fact
    table at all. That flips once stations x days outgrows executor
    memory, so the default (``None``) auto-selects by cardinality:
    callers that know the period (the Broker, from its stage watermark)
    pass ``est_station_days``, and the dim is broadcast iff that is at
    most BROADCAST_STATION_DAYS_MAX, else the join falls to sort-merge
    reusing the aggregation's partitioning. With no estimate the join is
    left unhinted for AQE to convert to broadcast at runtime from the
    dim's ACTUAL post-aggregation size — never a fact scan at plan-build
    time just to pick a strategy. Pass True/False to force a side.
    """
    day = F.to_date("timestamp")
    with_day = ts_p.withColumn("_day", day)
    daily = with_day.groupBy("station_id", "_day").agg(
        F.sum("filled").alias("_day_sum"),
        F.count(F.when(F.col("filled") > 0, 1)).alias("_count_n"),
    )
    t_daily = ts_t.select(
        "station_id", F.col("timestamp").cast("date").alias("_day"),
        F.col("filled").alias("_t_filled"),
    )
    classed = daily.join(t_daily, ["station_id", "_day"], "left").withColumn(
        "_ptype", precipitation_type(F.col("_t_filled"), F.month("_day"))
    )
    classed = classed.join(
        F.broadcast(meta_p.select("station_id", "richter_class")), "station_id", "left"
    ).join(
        F.broadcast(richter_params),
        F.col("_ptype") == F.col("precipitation_typ"),
        "left",
    )
    b = (
        F.when(F.col("richter_class") == "no-protection", F.col("b_no"))
        .when(F.col("richter_class") == "little-protection", F.col("b_little"))
        .when(F.col("richter_class") == "protected", F.col("b_protected"))
        .when(F.col("richter_class") == "heavy-protection", F.col("b_heavy"))
    )
    delta = F.when(
        F.col("_t_filled").isNotNull() & (F.col("_count_n") > 0) & (F.col("_day_sum") > 0),
        b * F.pow(F.col("_day_sum"), F.col("e")),
    )
    corr_dim = classed.select(
        "station_id", "_day", delta.alias("_delta"), "_count_n"
    )
    if broadcast_correction is None and est_station_days is not None:
        broadcast_correction = est_station_days <= BROADCAST_STATION_DAYS_MAX
    if broadcast_correction:
        corr_dim = F.broadcast(corr_dim)
    out = with_day.join(corr_dim, ["station_id", "_day"], "left")
    corr = F.when(
        (F.col("filled") > 0) & F.col("_delta").isNotNull(),
        F.round(F.col("filled") + F.col("_delta") / F.col("_count_n"), round_digits),
    ).otherwise(F.col("filled"))
    return out.withColumn("corr", corr).drop("_day", "_delta", "_count_n")
