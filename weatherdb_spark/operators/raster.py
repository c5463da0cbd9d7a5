"""S7 — raster point/buffer sampling as a DataFrame op.

Reference: ``StationBase._get_raster_value`` (StationBases.py:2337-2421)
samples a GeoTIFF at the station point with rasterio; when the cell is
NoData the caller grows a buffer in 50 m steps up to 1000 m and takes the
``all_touched`` zonal mean (StationBases.py:848-913 update_ma_raster loop).

Spark-first: the raster is a tall gridded table (col, row, term, value)
plus an affine transform (x0, y0, res — north-up), so sampling is an
equi-join on the cell index and the buffer growth is a bounded explode of
candidate cell offsets with the exact point-to-cell-box distance computed
as column arithmetic:

- point sample  = join on (floor((x-x0)/res), floor((y0-y)/res));
- buffer growth = per station the smallest step (multiples of ``step_m``)
  whose touched cells have any data, then the mean over every non-null
  cell touched at that step — ``all_touched`` semantics: a cell is touched
  by buffer d iff dist(point, cell box) <= d.

All shuffles are keyed on the cell index; the offsets dim is a few dozen
rows (ceil(max_buffer/res) in each direction) and lives in the closure.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_raster(
    stations: DataFrame,
    raster: DataFrame,
    x0: float,
    y0: float,
    res: float,
    step_m: float = 50.0,
    max_buffer_m: float = 1000.0,
    x_col: str = "x_utm",
    y_col: str = "y_utm",
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("term",),
) -> DataFrame:
    """Sample ``raster`` at each station point with NoData buffer growth.

    ``stations``: (station_id, x_col, y_col); ``raster``: (col, row,
    *group_cols, value_col) — one row per cell per group (e.g. term).
    Returns (station_id, *group_cols, value, sample_dist_m) where
    ``sample_dist_m`` is 0 for a clean point sample and the buffer radius
    that produced the zonal mean otherwise; stations with no data within
    ``max_buffer_m`` are absent from the result (the reference stores NaN
    — recover them with a left join against the station dim if needed).
    """
    # candidate cell offsets around the station's own cell, with nothing
    # data-dependent: the exact box distance is computed per station
    # below. Two sequence-explodes, NOT a literal offsets array — the
    # offset count is (2*ceil(max_buffer/res)+3)^2, and baking it into
    # the plan as literal structs makes plan construction itself blow up
    # for fine rasters (res=1 m -> 4M expressions before the first task).
    r_cells = int(math.ceil(max_buffer_m / res)) + 1

    st = stations.select(
        "station_id",
        F.col(x_col).alias("_sx"),
        F.col(y_col).alias("_sy"),
        F.floor((F.col(x_col) - F.lit(x0)) / F.lit(res)).alias("_c0"),
        F.floor((F.lit(y0) - F.col(y_col)) / F.lit(res)).alias("_r0"),
    )
    span = F.sequence(F.lit(-r_cells), F.lit(r_cells))
    cand = (
        st.select("station_id", "_sx", "_sy", "_c0", "_r0",
                  F.explode(span).alias("_di"))
        .select("station_id", "_sx", "_sy", "_c0", "_r0", "_di",
                F.explode(span).alias("_dj"))
        .select(
            "station_id", "_sx", "_sy",
            (F.col("_c0") + F.col("_di")).alias("col"),
            (F.col("_r0") + F.col("_dj")).alias("row"),
            # the ONE half-open containing cell (floor convention) — a
            # station on a cell boundary has box distance 0 to its
            # neighbor too, so the point sample must not key on distance
            ((F.col("_di") == 0) & (F.col("_dj") == 0)).alias("_own"),
        )
    )

    # exact distance from the station point to the cell's box
    box_xmin = F.lit(x0) + F.col("col") * F.lit(res)
    box_ymax = F.lit(y0) - F.col("row") * F.lit(res)
    dx = F.greatest(
        box_xmin - F.col("_sx"), F.col("_sx") - (box_xmin + F.lit(res)), F.lit(0.0)
    )
    dy = F.greatest(
        (box_ymax - F.lit(res)) - F.col("_sy"), F.col("_sy") - box_ymax, F.lit(0.0)
    )
    dist = F.sqrt(dx * dx + dy * dy)
    # smallest 50 m-multiple buffer that touches the cell (0 = own cell)
    step = F.ceil(dist / F.lit(step_m)) * F.lit(step_m)
    cand = (
        cand.withColumn("_step", step.cast("double"))
        .filter(F.col("_step") <= F.lit(max_buffer_m))
    )

    joined = cand.join(
        raster.select("col", "row", *group_cols, F.col(value_col).alias("_v")),
        ["col", "row"],
    ).filter(F.col("_v").isNotNull())

    per_station = joined.groupBy("station_id", *group_cols).agg(
        F.min("_step").alias("_best_step"),
        # all_touched zonal mean at the chosen radius: Spark lacks a
        # conditional-on-aggregate form, so collect (step, v) pairs cheaply
        # via two passes over the same grouped rows: min step, then mean of
        # values whose step <= that min -- expressed with min_by arrays
        F.avg(F.when(F.col("_own"), F.col("_v"))).alias("_point_v"),
        F.collect_list(F.struct("_step", "_v")).alias("_cells"),
    )
    zonal = F.aggregate(
        F.filter("_cells", lambda c: c["_step"] <= F.col("_best_step")),
        F.struct(F.lit(0.0).alias("s"), F.lit(0).alias("n")),
        lambda acc, c: F.struct(
            (acc["s"] + c["_v"]).alias("s"), (acc["n"] + 1).alias("n")
        ),
        lambda acc: acc["s"] / acc["n"],
    )
    return per_station.select(
        "station_id",
        *group_cols,
        F.coalesce(F.col("_point_v"), zonal).alias("value"),
        F.when(F.col("_point_v").isNotNull(), F.lit(0.0))
        .otherwise(F.col("_best_step")).alias("sample_dist_m"),
    )
