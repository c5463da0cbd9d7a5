"""Quality-check operators (SURVEY.md §2.9: QC-P, QC-T, QC-ET).

The reference builds one SQL UPDATE per station per year-group inside
PostgreSQL (StationBases.py:2944-3074, StationP.py:83-187). Spark-first,
each QC is a single DataFrame pass over the tall fact table:

- QC-P: window lag/lead flags + a daily-comparison join — two shuffles
  (window by station, join on shifted date), no per-station loop;
- QC-T/QC-ET: broadcast the kNN dim, join the five neighbor series on
  (nb_station_id, date) — one shuffle keyed on the fact's own
  (station_id, date) — regionalize, exact median, rule predicate.

At 100 TB the neighbor join is the cost center: it is an equi join on
(station_id, timestamp) whose left side is 5x the fact table (one row per
neighbor slot). Partitioning both sides by date bucket keeps it a local
sort-merge join; the kNN and MA dims stay broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from weatherdb_spark.functions.partitioning import year_chunked
from weatherdb_spark.functions.temporal import is_winter, shifted_date


def qc_p(
    ts_p: DataFrame,
    ts_p_d: DataFrame,
    max_value: float = 50.0,
    peak_value: float = 5.0,
    consec_min: float = 0.1,
    daily_big: float = 10.0,
) -> DataFrame:
    """QC-P — 10-minute precipitation quality control
    (StationP.py:83-187, docs/source/Methode.md:63-90).

    NULLs ``raw`` into ``qc`` where any of:
    (a) day failed: 10-min daily sum = 0 while daily raw != 0, OR 10-min
        daily sum >= 10 mm and >= 2x daily raw (StationP.py:107-119);
    (b) timestamp failed: 3 consecutive equal values > 0.1 mm with qn != 3
        (StationP.py:145-166), or isolated peak > 5 mm with 0 before and
        after (StationP.py:133-142);
    (c) raw < 0 or raw >= 50 mm (StationP.py:176-178).
    Returns ts_p with a ``qc`` column.
    """
    day = shifted_date(F.col("timestamp"), "6 hours")

    # (a) daily comparison against the daily station table (J3/A3)
    daily10 = ts_p.groupBy("station_id", day.alias("date")).agg(
        F.sum("raw").alias("sum10")
    )
    failed_days = (
        daily10.join(
            ts_p_d.select(
                "station_id", F.col("timestamp").alias("date"), F.col("raw").alias("raw_d")
            ),
            ["station_id", "date"],
            "left",
        )
        .filter(
            ((F.col("sum10") == 0) & (F.col("raw_d") != 0))
            | ((F.col("sum10") >= daily_big) & (F.col("sum10") >= 2 * F.col("raw_d")))
        )
        .select("station_id", "date")
    )

    # (b) window flags (J1/J2/W1/W2). Skew guard: the lag/lead here only
    # reach 2 rows, so the window runs per (station, year) with 2-row
    # boundary context (functions.partitioning.year_chunked) instead of
    # putting a station's full multi-decade 10-min history in ONE task.
    win = W.partitionBy("station_id", "_chunk").orderBy("timestamp")
    union = year_chunked(ts_p, context_rows=2)
    # the reference joins the triple on strictly increasing timestamps with
    # qn != 3 evaluated on the run-HEAD row only, then UNIONs the three
    # shifted timestamp columns so every member is flagged
    # (StationP.py:145-166). Each membership disjunct therefore carries the
    # qn of its head: the row itself (head), lag 1 (middle), lag 2 (tail).
    run3 = (
        ((F.lag("qn", 2).over(win) != 3)
         & (F.col("raw") == F.col("_v1")) & (F.col("raw") == F.col("_v2")))
        | ((F.lag("qn", 1).over(win) != 3)
           & (F.col("raw") == F.col("_v1")) & (F.col("raw") == F.col("_vn")))
        | ((F.col("qn") != 3)
           & (F.col("raw") == F.col("_vn")) & (F.col("raw") == F.col("_vn2")))
    )
    flagged = (
        union.withColumn("_v1", F.lag("raw", 1).over(win))
        .withColumn("_v2", F.lag("raw", 2).over(win))
        .withColumn("_vn", F.lead("raw", 1).over(win))
        .withColumn("_vn2", F.lead("raw", 2).over(win))
        .withColumn(
            "_consec",
            (F.col("raw") > consec_min) & run3,
        )
        .withColumn(
            "_peak",
            (F.col("raw") > peak_value) & (F.col("_v1") == 0) & (F.col("_vn") == 0),
        )
        .filter(~F.col("_ctx"))
        .drop("_chunk", "_ctx")
    )

    out = flagged.withColumn("_day", day).join(
        failed_days.select(
            "station_id", F.col("date").alias("_day"), F.lit(True).alias("_failed_day")
        ),
        ["station_id", "_day"],
        "left",
    )
    qc = F.when(
        F.col("_failed_day").isNotNull()
        | F.col("_consec")
        | F.col("_peak")
        | (F.col("raw") < 0)
        | (F.col("raw") >= max_value),
        F.lit(None),
    ).otherwise(F.col("raw"))
    return out.withColumn("qc", qc).drop(
        "_v1", "_v2", "_vn", "_vn2", "_consec", "_peak", "_day", "_failed_day"
    )


def regionalized_neighbor_median(
    facts: DataFrame,
    knn: DataFrame,
    ma: DataFrame,
    coef_sign: str = "add",
    value_col: str = "raw",
    ts_col: str = "timestamp",
    round_digits: int | None = 1,
) -> DataFrame:
    """J5/A6 — per (station, timestamp) the exact median of the k nearest
    neighbors' values, each regionalized by the stations' multi-annual
    coefficient (get_coef, StationBases.py:2423-2461):

    - additive (T):  nb_value + (ma_self - ma_nb)
    - multiplicative (ET/P): nb_value * ma_self / ma_nb

    ``knn``: (station_id, nb_station_id, rank) dim (broadcast);
    ``ma``: (station_id, value) dim (broadcast).
    Returns (station_id, ts_col, med) where med is NULL when no neighbor
    has data. The reference rounds regionalized values stage-wise
    (StationBases.py:1403,1422) — pass round_digits to reproduce.
    """
    # Same (knn x MA) dim build and regionalization formula as fillup —
    # one source of truth so a rounding/coefficient change cannot drift
    # between the QC and fillup stages.
    from weatherdb_spark.operators.fillup import _build_pairs, _regionalize

    pairs = _build_pairs(knn, ma, seasonal_ma=False)
    # facts are the big side: stream them, broadcast the (knn x ma) dim.
    # Hint goes on the joined pairs df — hinting only `knn` lets Spark pick
    # the facts as the build side once the hint is buried under two joins,
    # which collects the whole fact table to the driver.
    nb_vals = facts.select(
        F.col("station_id").alias("nb_station_id"),
        F.col(ts_col),
        F.col(value_col).alias("_nb_val"),
    ).join(F.broadcast(pairs), "nb_station_id")
    reg = _regionalize(
        coef_sign, F.col("_nb_val"), F.col("_ma_self"), F.col("_ma_nb"),
        round_digits,
    )
    return (
        nb_vals.withColumn("_reg", reg)
        .groupBy("station_id", ts_col)
        .agg(F.percentile(F.col("_reg"), F.lit(0.5)).alias("med"))
    )


def qc_t(
    ts_t: DataFrame,
    knn: DataFrame,
    ma: DataFrame,
    meta: DataFrame,
    max_dev: float = 5.0,
    abs_bound: float = 50.0,
    inversion_elev: float = 800.0,
    donor_facts: DataFrame | None = None,
) -> DataFrame:
    """QC-T — daily temperature neighbor-median check
    (StationT.py:89-119, Methode.md:36-61).

    NULL own raw where |raw - med| > 5 °C — but for stations above 800 m in
    winter only the lower test applies (temperature inversion,
    StationT.py:90-105) — or |raw| > 50 °C.

    ``donor_facts``: neighbor-series pool override for per-station
    scoped runs (``Broker.quality_check(stids=...)``) — the checked
    rows narrow to ``ts_t`` while the median still draws on every
    station's series. Defaults to ``ts_t``.
    """
    med = regionalized_neighbor_median(
        donor_facts if donor_facts is not None else ts_t,
        knn, ma, coef_sign="add",
    )
    elev = meta.select("station_id", F.col("stationshoehe").alias("_elev"))
    joined = ts_t.join(med, ["station_id", "timestamp"], "left").join(
        F.broadcast(elev), "station_id", "left"
    )
    # coalesce: NULL elevation (station absent from meta) keeps the upper
    # test — `~NULL` would void the predicate for those stations
    winter_high = is_winter(F.col("timestamp")) & F.coalesce(
        F.col("_elev") > inversion_elev, F.lit(False)
    )
    upper_fail = (F.col("raw") - F.col("med") > max_dev) & ~winter_high
    lower_fail = F.col("med") - F.col("raw") > max_dev
    bound_fail = F.abs(F.col("raw")) > abs_bound
    qc = F.when(
        (F.col("med").isNotNull() & (upper_fail | lower_fail)) | bound_fail,
        F.lit(None),
    ).otherwise(F.col("raw"))
    return joined.withColumn("qc", qc).drop("med", "_elev")


def qc_et(
    ts_et: DataFrame,
    knn: DataFrame,
    ma: DataFrame,
    meta: DataFrame | None = None,
    upper_factor: float = 2.0,
    upper_min: float = 3.0,
    lower_factor: float = 4.0,
    lower_min: float = 2.0,
    max_value: float = 20.0,
    inversion_elev: float = 800.0,
    donor_facts: DataFrame | None = None,
) -> DataFrame:
    """QC-ET — daily evapotranspiration neighbor-median check
    (StationET.py:71-100).

    NULL own raw where: raw > 2*med and raw > 3 mm; or raw*4 < med and
    raw > 2 mm; or raw < 0 or raw > 20 mm. For stations above 800 m in
    winter only the lower test applies (temperature inversion makes high
    winter ET plausible, StationET.py:72-85) — pass ``meta`` with the
    ``stationshoehe`` column to enable the gate (no meta = gate off,
    matching the reference when elevation is unknown).

    ``donor_facts``: neighbor-series pool override for scoped runs —
    see :func:`qc_t`. Defaults to ``ts_et``.
    """
    med = regionalized_neighbor_median(
        donor_facts if donor_facts is not None else ts_et,
        knn, ma, coef_sign="mult",
    )
    joined = ts_et.join(med, ["station_id", "timestamp"], "left")
    upper_fail = (F.col("raw") > upper_factor * F.col("med")) & (F.col("raw") > upper_min)
    lower_fail = (F.col("raw") * lower_factor < F.col("med")) & (F.col("raw") > lower_min)
    drop_cols = ["med"]
    if meta is not None:
        elev = meta.select("station_id", F.col("stationshoehe").alias("_elev"))
        joined = joined.join(F.broadcast(elev), "station_id", "left")
        # coalesce: a station absent from meta (NULL elev) must keep the
        # upper test — `~NULL` would silently void the predicate
        winter_high = is_winter(F.col("timestamp")) & F.coalesce(
            F.col("_elev") > inversion_elev, F.lit(False)
        )
        upper_fail = upper_fail & ~winter_high
        drop_cols.append("_elev")
    bound_fail = (F.col("raw") < 0) | (F.col("raw") > max_value)
    qc = F.when(
        (F.col("med").isNotNull() & (upper_fail | lower_fail)) | bound_fail,
        F.lit(None),
    ).otherwise(F.col("raw"))
    return joined.withColumn("qc", qc).drop(*drop_cols)
