"""J8/W3/W4 — k-nearest-neighbor station ranking.

The reference runs ``ORDER BY ST_DISTANCE(...) [* elevation weight] LIMIT n``
per station inside PostGIS (StationBases.py:2277-2288). Spark-first: the
station dimension is tiny relative to facts (thousands of rows even for the
full DWD network), so a broadcast self cross-join + window rank computes the
entire kNN table in one pass. At 100 TB of facts the meta table is still
~MBs — broadcast is always right here; the result is itself a small dim
to broadcast into fill joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from weatherdb_spark.config import ELEV_WEIGHT_P1, ELEV_WEIGHT_P2
from weatherdb_spark.functions.spatial import elevation_weighted_dist, euclid_dist


def knn_stations(
    meta: DataFrame,
    k: int | None = 5,
    max_dist_m: float | None = None,
    elevation_weighted: bool = False,
    id_col: str = "station_id",
    x_col: str = "x_utm",
    y_col: str = "y_utm",
    elev_col: str = "stationshoehe",
    p1: float = ELEV_WEIGHT_P1,
    p2: float = ELEV_WEIGHT_P2,
) -> DataFrame:
    """Return (station_id, nb_station_id, dist_m, rank) with rank <= k.

    ``k=None`` keeps ALL neighbors (within ``max_dist_m``), still ranked —
    the fillup candidate set: the reference's fillup loop iterates every
    station within max_fillup_distance in distance order until no holes
    remain (StationBases.py:1573-1638), not just the 5 nearest.

    ``elevation_weighted`` applies the LARSIM weight
    ``L*(1+(|dh|/P1)^P2)`` used for T/ET neighbor selection
    (StationBases.py:2196-2209, 2919-2942).
    """
    left = meta.select(
        F.col(id_col).alias("station_id"),
        F.col(x_col).alias("_x1"),
        F.col(y_col).alias("_y1"),
        F.col(elev_col).alias("_h1"),
    )
    right = meta.select(
        F.col(id_col).alias("nb_station_id"),
        F.col(x_col).alias("_x2"),
        F.col(y_col).alias("_y2"),
        F.col(elev_col).alias("_h2"),
    )
    pairs = left.join(F.broadcast(right), left.station_id != right.nb_station_id)
    dist = euclid_dist(F.col("_x1"), F.col("_y1"), F.col("_x2"), F.col("_y2"))
    if elevation_weighted:
        dist = elevation_weighted_dist(dist, F.col("_h1"), F.col("_h2"), p1, p2)
    pairs = pairs.withColumn("dist_m", dist)
    if max_dist_m is not None:
        pairs = pairs.filter(F.col("dist_m") <= max_dist_m)
    w = W.partitionBy("station_id").orderBy(F.col("dist_m").asc(), F.col("nb_station_id").asc())
    ranked = pairs.withColumn("rank", F.row_number().over(w))
    if k is not None:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked.select("station_id", "nb_station_id", "dist_m", "rank")


def yearly_knn(
    meta: DataFrame,
    eligible: DataFrame,
    k: int = 5,
    elevation_weighted: bool = True,
    id_col: str = "station_id",
) -> DataFrame:
    """W4 — per-year kNN among stations with sufficient coverage that year.

    The reference recomputes the 5 nearest neighbors per year, restricted
    to stations with at least half-period raw coverage
    (StationBases.py:2264-2274, 2972-3006), then merges consecutive years
    with identical neighbor sets into one SQL branch. The merge step is a
    SQL-generation artifact — here the per-(station, year) table is the
    result, and downstream joins key on (station, year) directly.

    ``eligible``: (year, station_id) rows of coverage-qualified donors.
    Returns (year, station_id, nb_station_id, dist_m, rank), rank <= k,
    neighbors drawn only from that year's eligible set.
    """
    nb_meta = meta.join(eligible, id_col).select(
        F.col("year"),
        F.col(id_col).alias("nb_station_id"),
        F.col("x_utm").alias("_x2"),
        F.col("y_utm").alias("_y2"),
        F.col("stationshoehe").alias("_h2"),
    )
    left = meta.select(
        F.col(id_col).alias("station_id"),
        F.col("x_utm").alias("_x1"),
        F.col("y_utm").alias("_y1"),
        F.col("stationshoehe").alias("_h1"),
    ).crossJoin(eligible.select("year").distinct())
    pairs = left.join(F.broadcast(nb_meta), "year").filter(
        F.col("station_id") != F.col("nb_station_id")
    )
    dist = euclid_dist(F.col("_x1"), F.col("_y1"), F.col("_x2"), F.col("_y2"))
    if elevation_weighted:
        dist = elevation_weighted_dist(dist, F.col("_h1"), F.col("_h2"))
    pairs = pairs.withColumn("dist_m", dist)
    w = W.partitionBy("year", "station_id").orderBy(
        F.col("dist_m").asc(), F.col("nb_station_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("year", "station_id", "nb_station_id", "dist_m", "rank")
    )
