"""Registry bindings completing the SURVEY.md §2 inventory: S4 merge
upsert, F7 import dedup, F9 dropped-station anti-join, J9 fill-source
distance join, A9 meta period rollups, W4 per-year kNN, S9 Richter class
lookup — each demonstrated on the driver's tables with a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weatherdb_spark.plans.pipeline_queries import _daily_df, _ma_df
from weatherdb_spark.plans.registry import (
    COORDS_SQL as _COORDS_SQL,
    _register,
    load,
    supplier_coords,
)


# --------------------------------------------------------------------------
# S4 — merge upsert with IS-DISTINCT-FROM change detection
# --------------------------------------------------------------------------

@_register(
    "s4_merge_upsert",
    oracle="""
    WITH upd AS (
        -- o_totalprice * 2 is exact in binary floating point (mantissa
        -- unchanged), so the oracle verifies the merge logic, not
        -- HALF_UP-vs-binary rounding trivia on exact halves.
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 20 = 0 THEN o_totalprice
                    ELSE o_totalprice * 2 END AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_totalprice
        FROM orders WHERE o_orderkey % 1000 = 0
    )
    SELECT coalesce(c.o_orderkey, u.o_orderkey) AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                ELSE c.o_totalprice END AS o_totalprice,
           CASE WHEN c.o_orderkey IS NULL THEN 'insert'
                WHEN u.o_orderkey IS NOT NULL
                     AND u.o_totalprice IS DISTINCT FROM c.o_totalprice
                     THEN 'update'
                ELSE 'keep' END AS merge_action
    FROM orders c FULL OUTER JOIN upd u ON c.o_orderkey = u.o_orderkey
    """,
    doc="S4 upsert sink semantics (StationBases.py:525-587): keyed merge "
        "of an updates set into orders with IS DISTINCT FROM change "
        "detection (StationBases.py:1310) — insert/update/keep per row.",
)
def s4_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.sinks.merge import merge_upsert

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 20 == 0, F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice") * 2)
        .alias("o_totalprice"),
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 1000 == 0).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            F.col("o_totalprice"),
        )
    )
    merged = merge_upsert(orders, updates, keys=["o_orderkey"],
                          value_cols=["o_totalprice"])
    return merged.select(
        "o_orderkey", "o_totalprice", F.col("_merge_action").alias("merge_action")
    )


# --------------------------------------------------------------------------
# F7 — import dedup: first file wins, residual duplicates -> mean
# --------------------------------------------------------------------------

_IMPORTS_SQL = """
    imp AS (
        SELECT user_id, ts, 1 AS src, value FROM events
        UNION ALL
        SELECT user_id, ts, 2, value + 5 FROM events WHERE event_id % 3 = 0
        UNION ALL
        SELECT user_id, ts, 1, value + 2 FROM events WHERE event_id % 5 = 0
    )
"""

@_register(
    "f7_import_dedup",
    oracle=f"""
    WITH {_IMPORTS_SQL},
    fs AS (SELECT user_id, ts, min(src) AS s FROM imp GROUP BY 1, 2)
    SELECT i.user_id, i.ts, round(avg(i.value), 6) AS value
    FROM imp i
    JOIN fs ON i.user_id = fs.user_id AND i.ts = fs.ts AND i.src = fs.s
    GROUP BY 1, 2
    """,
    doc="F7 import dedup (StationBases.py:1232-1243, StationP.py:211-217): "
        "overlapping hist/recent files — first file wins, same-file "
        "residual duplicates collapse to the mean.",
)
def f7_import_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.imports import dedup_imports

    ev = load(spark, sf_dir, "events")
    imp = (
        ev.select("user_id", "ts", F.lit(1).alias("src"), "value")
        .unionByName(
            ev.filter(F.col("event_id") % 3 == 0).select(
                "user_id", "ts", F.lit(2).alias("src"),
                (F.col("value") + 5).alias("value"),
            )
        )
        .unionByName(
            ev.filter(F.col("event_id") % 5 == 0).select(
                "user_id", "ts", F.lit(1).alias("src"),
                (F.col("value") + 2).alias("value"),
            )
        )
    )
    out = dedup_imports(imp, key_cols=["user_id", "ts"], src_col="src",
                        value_cols=["value"])
    return out.select("user_id", "ts", F.round("value", 6).alias("value"))


# --------------------------------------------------------------------------
# F9 — dropped-station anti-join
# --------------------------------------------------------------------------

@_register(
    "f9_dropped_anti",
    oracle="""
    SELECT s.s_suppkey AS station_id, s.s_name
    FROM supplier s
    WHERE s.s_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 13 = 0)
    """,
    doc="F9 dropped-station anti-filter (StationsBase.py:120-128): "
        "stations in the dropped list are never recreated — left-anti "
        "join against the dropped dim.",
)
def f9_dropped_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    dropped = sup.filter(F.col("s_suppkey") % 13 == 0).select("s_suppkey")
    return (
        sup.join(dropped, "s_suppkey", "left_anti")
        .select(F.col("s_suppkey").alias("station_id"), "s_name")
    )


# --------------------------------------------------------------------------
# J9 — fill-source distance join (get_dist / with_dist)
# --------------------------------------------------------------------------

@_register(
    "j9_fill_dist",
    oracle=f"""
    WITH coords AS ({_COORDS_SQL}),
    knn AS (
        SELECT * FROM (
            SELECT a.s_suppkey AS station_id,
                   b.s_suppkey AS nb_station_id,
                   sqrt(pow(a.x_utm - b.x_utm, 2) + pow(a.y_utm - b.y_utm, 2))
                     * (1 + pow(abs(a.elev - b.elev) / 250.0, 1.5)) AS dist_m,
                   row_number() OVER (
                       PARTITION BY a.s_suppkey
                       ORDER BY sqrt(pow(a.x_utm - b.x_utm, 2) + pow(a.y_utm - b.y_utm, 2))
                                * (1 + pow(abs(a.elev - b.elev) / 250.0, 1.5)) ASC,
                            b.s_suppkey ASC
                   ) AS rank
            FROM coords a JOIN coords b ON a.s_suppkey != b.s_suppkey
        ) WHERE rank <= 5
    ),
    daily AS (
        SELECT l_suppkey AS station_id, CAST(l_shipdate AS DATE) AS d,
               sum(l_quantity) AS qty
        FROM lineitem GROUP BY 1, 2
    ),
    ma AS (SELECT s_suppkey, CAST(s_suppkey % 20 + 40 AS DOUBLE) AS ma FROM supplier),
    bounds AS (SELECT station_id, min(d) AS mn, max(d) AS mx FROM daily GROUP BY 1),
    grid AS (
        SELECT station_id, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    ),
    base AS (
        SELECT g.station_id, g.d, f.qty
        FROM grid g LEFT JOIN daily f ON g.station_id = f.station_id AND g.d = f.d
    ),
    donors AS (
        SELECT k.station_id, f.d, k.rank, k.nb_station_id,
               f.qty * m1.ma / m2.ma AS reg_val
        FROM knn k
        JOIN ma m1 ON m1.s_suppkey = k.station_id
        JOIN ma m2 ON m2.s_suppkey = k.nb_station_id
        JOIN daily f ON f.station_id = k.nb_station_id
    ),
    best AS (
        SELECT station_id, d,
               arg_min(reg_val, rank) AS fill_val,
               arg_min(nb_station_id, rank) AS fill_by
        FROM donors GROUP BY 1, 2
    )
    SELECT b.station_id, b.d AS day, s.fill_by AS filled_by,
           round(k.dist_m, 4) AS dist_m
    FROM base b
    JOIN best s ON b.station_id = s.station_id AND b.d = s.d
    JOIN knn k ON k.station_id = b.station_id AND k.nb_station_id = s.fill_by
    WHERE b.qty IS NULL AND s.fill_val IS NOT NULL
    """,
    doc="J9 fill-source distance join (StationBases.py:2700-2761): for "
        "every filled row, the donor station's (elevation-weighted) "
        "distance — broadcast join of filled_by against the kNN dim.",
)
def j9_fill_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.fillup import rank_fill
    from weatherdb_spark.operators.neighbors import knn_stations
    from weatherdb_spark.operators.timeline import expand_timeline

    daily = _daily_df(spark, sf_dir)
    grid = expand_timeline(daily, interval="1 day", group_cols=("station_id",),
                           min_date=None)
    knn = knn_stations(supplier_coords(spark, sf_dir), k=5, elevation_weighted=True)
    filled = rank_fill(grid, knn, _ma_df(spark, sf_dir), coef_sign="mult",
                       base_col="qty", ts_col="timestamp", round_digits=None,
                       # known fixture regime — 78.6% holes at every SF,
                       # see fillup_rank_fill's binding
                       hole_semi=False)
    dist = knn.select(
        "station_id",
        F.col("nb_station_id").alias("filled_by"),
        F.round("dist_m", 4).alias("dist_m"),
    )
    return (
        filled.filter(F.col("qty").isNull() & F.col("filled").isNotNull())
        .withColumn("filled_by", F.col("filled_by").cast("int"))
        .join(F.broadcast(dist), ["station_id", "filled_by"])
        .select(
            F.col("station_id").cast("long").alias("station_id"),
            F.col("timestamp").alias("day"),
            F.col("filled_by").cast("long").alias("filled_by"),
            "dist_m",
        )
    )


# --------------------------------------------------------------------------
# A9 — meta period rollups
# --------------------------------------------------------------------------

@_register(
    "a9_meta_period_rollup",
    oracle="""
    WITH periods AS (
        SELECT l_suppkey, min(l_shipdate) AS raw_from, max(l_shipdate) AS raw_until
        FROM lineitem GROUP BY 1
    )
    SELECT s.s_nationkey AS nation_id,
           count(*) AS n_stations,
           min(p.raw_from) AS raw_from,
           max(p.raw_until) AS raw_until
    FROM periods p JOIN supplier s ON s.s_suppkey = p.l_suppkey
    GROUP BY 1
    """,
    doc="A9 meta period rollups (StationBases.py:2066-2070): per-station "
        "raw_from/raw_until periods rolled up across the station set "
        "(grouped by nation as the rollup key).",
)
def a9_meta_period_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    periods = li.groupBy("l_suppkey").agg(
        F.min("l_shipdate").alias("raw_from"), F.max("l_shipdate").alias("raw_until")
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        periods.join(F.broadcast(sup), periods.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nation_id"))
        .agg(
            F.count(F.lit(1)).alias("n_stations"),
            F.min("raw_from").alias("raw_from"),
            F.max("raw_until").alias("raw_until"),
        )
    )


# --------------------------------------------------------------------------
# W4 — per-year kNN among coverage-eligible stations
# --------------------------------------------------------------------------

@_register(
    "w4_yearly_knn",
    oracle=f"""
    WITH coords AS ({_COORDS_SQL}),
    elig AS (
        SELECT year(l_shipdate) AS year, l_suppkey AS station_id
        FROM lineitem GROUP BY 1, 2
        HAVING count(DISTINCT CAST(l_shipdate AS DATE)) >= 60
    ),
    years AS (SELECT DISTINCT year FROM elig),
    pairs AS (
        SELECT y.year, a.s_suppkey AS station_id, e.station_id AS nb_station_id,
               sqrt(pow(a.x_utm - bc.x_utm, 2) + pow(a.y_utm - bc.y_utm, 2))
                 * (1 + pow(abs(a.elev - bc.elev) / 250.0, 1.5)) AS dist_m
        FROM coords a
        CROSS JOIN years y
        JOIN elig e ON e.year = y.year AND e.station_id != a.s_suppkey
        JOIN coords bc ON bc.s_suppkey = e.station_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY year, station_id
            ORDER BY dist_m ASC, nb_station_id ASC
        ) AS rank
        FROM pairs
    )
    SELECT year, station_id, nb_station_id, round(dist_m, 4) AS dist_m, rank
    FROM ranked WHERE rank <= 3
    """,
    doc="W4 per-year neighbor recomputation (StationBases.py:2972-3006) "
        "restricted to half-period-coverage donors "
        "(StationBases.py:2264-2274): kNN per (year, station) among that "
        "year's eligible set.",
)
def w4_yearly_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.neighbors import yearly_knn

    li = load(spark, sf_dir, "lineitem")
    elig = (
        li.groupBy(
            F.year("l_shipdate").alias("year"),
            F.col("l_suppkey").cast("int").alias("station_id"),
        )
        .agg(F.countDistinct(F.to_date("l_shipdate")).alias("_days"))
        .filter(F.col("_days") >= 60)
        .select("year", "station_id")
    )
    out = yearly_knn(supplier_coords(spark, sf_dir), elig, k=3,
                     elevation_weighted=True)
    return out.select(
        "year",
        F.col("station_id").cast("long").alias("station_id"),
        F.col("nb_station_id").cast("long").alias("nb_station_id"),
        F.round("dist_m", 4).alias("dist_m"),
        F.col("rank").cast("long").alias("rank"),
    )


# --------------------------------------------------------------------------
# S9 — Richter exposure class from horizon angle
# --------------------------------------------------------------------------

@_register(
    "s9_richter_class",
    oracle="""
    SELECT s_suppkey AS station_id,
           CAST((s_suppkey * 13) % 160 AS DOUBLE) / 10 AS horizon,
           CASE WHEN CAST((s_suppkey * 13) % 160 AS DOUBLE) / 10 < 3 THEN 'no-protection'
                WHEN CAST((s_suppkey * 13) % 160 AS DOUBLE) / 10 < 7 THEN 'little-protection'
                WHEN CAST((s_suppkey * 13) % 160 AS DOUBLE) / 10 < 12 THEN 'protected'
                ELSE 'heavy-protection' END AS richter_class
    FROM supplier
    """,
    doc="S9 Richter class lookup (StationP.py:33-50, 450-484): horizon "
        "angle -> exposure class via the fixed bins "
        "{[0,3) [3,7) [7,12) [12,inf)}.",
)
def s9_richter_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.richter import richter_class

    sup = load(spark, sf_dir, "supplier")
    horizon = ((F.col("s_suppkey") * 13) % 160).cast("double") / 10
    return sup.select(
        F.col("s_suppkey").alias("station_id"),
        horizon.alias("horizon"),
        richter_class(horizon).alias("richter_class"),
    )


# --------------------------------------------------------------------------
# S7 — raster point/buffer sample
# --------------------------------------------------------------------------

@_register(
    "s7_raster_sample",
    oracle="""
    WITH st AS (
        SELECT s_suppkey AS station_id,
               CAST((s_suppkey * 7919) % 10000 AS DOUBLE) AS x_utm,
               CAST((s_suppkey * 104729) % 10000 AS DOUBLE) AS y_utm
        FROM supplier
    ),
    cells AS (
        SELECT p_partkey % 50 AS col, (p_partkey // 50) % 40 AS row,
               CASE WHEN p_partkey % 2 = 0 THEN 'year' ELSE 'wihy' END AS term,
               CASE WHEN p_partkey % 7 = 0 THEN NULL
                    ELSE round(p_retailprice, 2) END AS v
        FROM part
        WHERE p_partkey < 50 * 40 * 2
    ),
    cand AS (
        -- exact distance from the station point to the cell box
        -- (x0=0, y0=10000 north-up, res=250): all_touched at radius d
        -- iff dist <= d; step = smallest 50 m multiple touching the cell
        SELECT s.station_id, c.term, c.v,
               ceil(sqrt(
                   pow(greatest(c.col * 250 - s.x_utm,
                                s.x_utm - (c.col * 250 + 250), 0), 2)
                 + pow(greatest((10000 - c.row * 250 - 250) - s.y_utm,
                                s.y_utm - (10000 - c.row * 250), 0), 2)
               ) / 50) * 50 AS step
        FROM st s CROSS JOIN cells c
        WHERE c.v IS NOT NULL
    ),
    q AS (
        SELECT *, min(step) OVER (PARTITION BY station_id, term) AS best
        FROM cand WHERE step <= 1000
    )
    SELECT station_id, term,
           round(avg(v) FILTER (WHERE step <= best), 4) AS value,
           best AS sample_dist_m
    FROM q GROUP BY station_id, term, best
    """,
    doc="S7 raster point/buffer sample (StationBases.py:2337-2421, "
        "848-913): equi-join on the cell index for the point sample; "
        "when the cell is NoData, grow the buffer in 50 m steps <= 1000 m "
        "and take the all_touched zonal mean. Raster synthesized from "
        "part (50x40 grid, res 250 m, NULLs at p_partkey%7=0); stations "
        "from supplier coords.",
)
def s7_raster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.raster import sample_raster

    stations = supplier_coords(spark, sf_dir).select("station_id", "x_utm", "y_utm")
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 50 * 40 * 2)
    raster = part.select(
        (F.col("p_partkey") % 50).alias("col"),
        ((F.col("p_partkey") / 50).cast("long") % 40).alias("row"),
        F.when(F.col("p_partkey") % 2 == 0, "year").otherwise("wihy").alias("term"),
        F.when(F.col("p_partkey") % 7 == 0, F.lit(None))
        .otherwise(F.round("p_retailprice", 2)).alias("value"),
    )
    out = sample_raster(
        stations, raster, x0=0.0, y0=10000.0, res=250.0,
        step_m=50.0, max_buffer_m=1000.0,
    )
    return out.select(
        F.col("station_id").cast("long").alias("station_id"),
        "term",
        F.round("value", 4).alias("value"),
        F.col("sample_dist_m").cast("double").alias("sample_dist_m"),
    )


# --------------------------------------------------------------------------
# S8 — horizon-angle scan (analytic DEM)
# --------------------------------------------------------------------------

def _bowl_dem(xs, ys):
    """Analytic DEM shared by the Spark binding and (formula-inlined) the
    DuckDB oracle: a paraboloid bowl centered at (20000, 20000). Pure
    arithmetic — no libm surface beyond cos/sin/atan, which agree with
    DuckDB to <=1 ulp (invisible at the operator's 3-digit rounding)."""
    return ((xs - 20000.0) ** 2 + (ys - 20000.0) ** 2) * 1e-6


@_register(
    "s8_horizon_scan",
    oracle="""
    WITH st AS (
        SELECT s_suppkey AS station_id,
               CAST((s_suppkey * 7919) % 10000 AS DOUBLE) AS x_utm,
               CAST((s_suppkey * 104729) % 10000 AS DOUBLE) AS y_utm
        FROM supplier
    ),
    ang AS (SELECT 90.0 + 3.0 * i AS a FROM range(0, 61) t(i)),
    dist AS (SELECT 300.0 * (j + 1) AS d FROM range(0, 50) t2(j)),
    slope AS (
        SELECT s.station_id, ang.a,
               max(degrees(atan((
                   (pow(s.x_utm + cos(radians(ang.a)) * dist.d - 20000, 2)
                  + pow(s.y_utm + sin(radians(ang.a)) * dist.d - 20000, 2)) * 1e-6
                 - (pow(s.x_utm - 20000, 2) + pow(s.y_utm - 20000, 2)) * 1e-6
               ) / dist.d))) AS hab
        FROM st s CROSS JOIN ang CROSS JOIN dist
        GROUP BY 1, 2
    ),
    bands AS (
        SELECT station_id,
               0.15 * avg(hab) FILTER (WHERE a > 225 AND a <= 270)
             + 0.35 * avg(hab) FILTER (WHERE a >= 180 AND a <= 225)
             + 0.35 * avg(hab) FILTER (WHERE a >= 135 AND a < 180)
             + 0.15 * avg(hab) FILTER (WHERE a >= 90 AND a < 135) AS h
        FROM slope GROUP BY 1
    )
    SELECT station_id, round(greatest(h, 0), 3) AS horizon
    FROM bands
    """,
    doc="S8 horizon-angle scan (StationP.py:273-448): per station, polar "
        "rays 90..270 deg in 3-deg steps sample the DEM, max "
        "atan-slope per ray, Richter band weighting 0.15/0.35/0.35/0.15 "
        "clamped at 0. Spark: Arrow mapInPandas with a numpy "
        "(angles x samples) grid per station; oracle replays the grid in "
        "SQL over the same analytic DEM.",
)
def s8_horizon_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.horizon import horizon_angles

    meta = supplier_coords(spark, sf_dir).select(
        "station_id", "x_utm", "y_utm", "stationshoehe"
    )
    out = horizon_angles(
        meta, _bowl_dem, radius_m=15_000.0, step_deg=3.0, sample_step_m=300.0
    )
    return out.select(
        F.col("station_id").cast("long").alias("station_id"), "horizon"
    )
