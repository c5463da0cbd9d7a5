"""Registry bindings for the pipeline compound operators (QC-T, fillup,
Richter) and the remaining §2 aggregate/join inventory, demonstrated on the
driver's TPC-H-ish tables with key-derived station geometry.

Shared analog vocabulary:
- stations   := suppliers with coordinates derived from s_suppkey
  (see registry.supplier_coords)
- timeseries := daily l_quantity sums per supplier from lineitem
- MA values  := deterministic per-supplier constants derived from the key
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weatherdb_spark.functions.caching import scoped_persist

from weatherdb_spark.plans.registry import (
    COORDS_SQL as _COORDS_SQL,
    _register,
    _register_extra,
    load,
    supplier_coords,
)

# SQL fragment mirrored by _ma_df below
_MA_SQL = "SELECT s_suppkey, CAST(s_suppkey % 20 + 40 AS DOUBLE) AS ma FROM supplier"
_KNN_SQL = f"""
    coords AS ({_COORDS_SQL}),
    knn AS (
        SELECT * FROM (
            SELECT a.s_suppkey AS station_id,
                   b.s_suppkey AS nb_station_id,
                   row_number() OVER (
                       PARTITION BY a.s_suppkey
                       ORDER BY sqrt(pow(a.x_utm - b.x_utm, 2) + pow(a.y_utm - b.y_utm, 2))
                                * (1 + pow(abs(a.elev - b.elev) / 250.0, 1.5)) ASC,
                                b.s_suppkey ASC
                   ) AS rank
            FROM coords a JOIN coords b ON a.s_suppkey != b.s_suppkey
        ) WHERE rank <= 5
    )
"""
_DAILY_SQL = """
    daily AS (
        SELECT l_suppkey AS station_id,
               CAST(l_shipdate AS DATE) AS d,
               sum(l_quantity) AS qty
        FROM lineitem GROUP BY 1, 2
    )
"""


def _ma_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("int").alias("station_id"),
        (F.col("s_suppkey") % 20 + 40).cast("double").alias("value"),
    )


def _daily_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_suppkey").cast("int").alias("station_id"),
            F.to_date("l_shipdate").alias("timestamp"),
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )


# --------------------------------------------------------------------------
# QC-T analog — J5 regionalized neighbor median + rule predicate
# --------------------------------------------------------------------------

@_register(
    "qc_neighbor_median",
    oracle=f"""
    WITH {_KNN_SQL}, {_DAILY_SQL},
    ma AS ({_MA_SQL}),
    reg AS (
        SELECT k.station_id, f.d,
               round(f.qty + (m1.ma - m2.ma), 1) AS reg_val
        FROM knn k
        JOIN ma m1 ON m1.s_suppkey = k.station_id
        JOIN ma m2 ON m2.s_suppkey = k.nb_station_id
        JOIN daily f ON f.station_id = k.nb_station_id
    ),
    med AS (
        SELECT station_id, d, quantile_cont(reg_val, 0.5) AS med
        FROM reg GROUP BY 1, 2
    )
    SELECT f.station_id, f.d AS day, f.qty,
           round(m.med, 4) AS med,
           CASE WHEN m.med IS NOT NULL AND abs(f.qty - m.med) > 60 THEN NULL
                ELSE f.qty END AS qc
    FROM daily f LEFT JOIN med m ON f.station_id = m.station_id AND f.d = m.d
    """,
    doc="QC-T analog: J5 full-outer neighbor median with additive "
        "regionalization + A6 exact median + rule predicate "
        "(StationBases.py:3030-3072, StationT.py:89-119) — suppliers as "
        "stations, daily lineitem qty sums as the series.",
    bench=True,
)
def qc_neighbor_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.neighbors import knn_stations
    from weatherdb_spark.operators.qc import regionalized_neighbor_median

    # daily is consumed twice (donor side of the median + the station's
    # own values); persisting the aggregate computes the fact scan+rollup
    # once — at scale the daily rollup is ~3 orders smaller than the facts
    daily = scoped_persist(_daily_df(spark, sf_dir))
    knn = knn_stations(supplier_coords(spark, sf_dir), k=5, elevation_weighted=True)
    ma = _ma_df(spark, sf_dir)
    med = regionalized_neighbor_median(
        daily, knn, ma, coef_sign="add", value_col="qty", ts_col="timestamp",
        round_digits=1,
    )
    out = daily.join(med, ["station_id", "timestamp"], "left")
    return out.select(
        F.col("station_id").cast("long").alias("station_id"),
        F.col("timestamp").alias("day"),
        "qty",
        F.round("med", 4).alias("med"),
        F.when(
            F.col("med").isNotNull() & (F.abs(F.col("qty") - F.col("med")) > 60),
            F.lit(None),
        ).otherwise(F.col("qty")).alias("qc"),
    )


# --------------------------------------------------------------------------
# Fillup analog — S6 grid + J4 rank-ordered donor fill + J9 distance join
# --------------------------------------------------------------------------

@_register_extra(
    "fillup_rank_fill",
    oracle=f"""
    WITH {_KNN_SQL}, {_DAILY_SQL},
    ma AS ({_MA_SQL}),
    bounds AS (
        SELECT station_id, min(d) AS mn, max(d) AS mx FROM daily GROUP BY 1
    ),
    grid AS (
        SELECT station_id, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    ),
    base AS (
        SELECT g.station_id, g.d, f.qty
        FROM grid g LEFT JOIN daily f ON g.station_id = f.station_id AND g.d = f.d
    ),
    donors AS (
        -- no rounding: qty and ma are integer-valued, so qty*ma/ma is the
        -- same IEEE double on both engines; Spark's decimal-string HALF_UP
        -- and DuckDB's binary rounding disagree on exact halves
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
    SELECT b.station_id, b.d AS day,
           coalesce(b.qty, s.fill_val) AS filled,
           CASE WHEN b.qty IS NULL AND s.fill_val IS NOT NULL
                THEN s.fill_by END AS filled_by
    FROM base b LEFT JOIN best s ON b.station_id = s.station_id AND b.d = s.d
    """,
    doc="Fillup: S6 timeline expansion + J4 first-non-null donor in "
        "neighbor-rank order with multiplicative regionalization + "
        "filled_by provenance (StationBases.py:1346-1669, §2.11 "
        "declarative rank-fill) — suppliers as stations. EXTRA: single-pass "
        "variant subsumed by fillup_rank_fill_deep's distance-bounded "
        "cascade; kept bench-flagged for cross-round comparability.",
    bench=True,
)
def fillup_rank_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.fillup import rank_fill
    from weatherdb_spark.operators.neighbors import knn_stations
    from weatherdb_spark.operators.timeline import expand_timeline

    daily = _daily_df(spark, sf_dir)
    # the expanded grid is both the fill base and the donor source inside
    # rank_fill; persist computes scan+rollup+expansion once (dim-sized)
    grid = scoped_persist(expand_timeline(
        daily, interval="1 day", group_cols=("station_id",), min_date=None
    ))
    knn = knn_stations(supplier_coords(spark, sf_dir), k=5, elevation_weighted=True)
    ma = _ma_df(spark, sf_dir)
    out = rank_fill(
        grid, knn, ma, coef_sign="mult", base_col="qty", ts_col="timestamp",
        round_digits=None,
        # known fixture regime (the deep variants' convention): the
        # expanded grid measures 78.6% holes at every SF (sf0.001/
        # 0.01/0.1), far above HOLE_SEMI_MAX_FRACTION=0.35, so the
        # auto-probe always resolved False anyway — stating it skips
        # the probe's aggregate job (~1.6 s of the builder per bench
        # iteration) with a byte-identical plan
        hole_semi=False,
    )
    return out.select(
        F.col("station_id").cast("long").alias("station_id"),
        F.col("timestamp").alias("day"),
        F.col("filled"),
        F.col("filled_by").cast("long").alias("filled_by"),
    )


# --------------------------------------------------------------------------
# Richter correction analog — A3 + J6 + J7 + distribution
# --------------------------------------------------------------------------

_RICHTER_PARAMS_SQL = """
    params(ptype, e, b_no, b_little, b_protected, b_heavy) AS (VALUES
        ('precip_summer', 0.38, 0.345, 0.31, 0.28, 0.245),
        ('precip_winter', 0.46, 0.34, 0.28, 0.24, 0.19),
        ('mix', 0.55, 0.535, 0.39, 0.305, 0.185),
        ('snow', 0.82, 0.72, 0.51, 0.33, 0.21))
"""

@_register(
    "richter_correction",
    oracle=f"""
    WITH {_RICHTER_PARAMS_SQL},
    meta AS (
        SELECT s_suppkey,
               CASE WHEN s_suppkey % 15 < 3 THEN 'no-protection'
                    WHEN s_suppkey % 15 < 7 THEN 'little-protection'
                    WHEN s_suppkey % 15 < 12 THEN 'protected'
                    ELSE 'heavy-protection' END AS richter_class
        FROM supplier
    ),
    daily AS (
        SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d,
               sum(l_quantity) AS day_sum,
               count(*) FILTER (WHERE l_quantity > 0) AS count_n,
               CAST((dayofyear(l_shipdate) * 7) % 40 - 10 AS DOUBLE) AS temp
        FROM lineitem GROUP BY 1, 2, 5
    ),
    classed AS (
        SELECT d.*, m.richter_class,
               CASE WHEN d.temp >= 3.0 THEN
                        CASE WHEN month(d.d) IN (1,2,3,10,11,12)
                             THEN 'precip_winter' ELSE 'precip_summer' END
                    WHEN d.temp <= -0.7 THEN 'snow'
                    ELSE 'mix' END AS ptype
        FROM daily d JOIN meta m ON d.l_suppkey = m.s_suppkey
    ),
    delta AS (
        SELECT c.l_suppkey, c.d, c.count_n,
               CASE WHEN c.count_n > 0 AND c.day_sum > 0 THEN
                   (CASE c.richter_class
                        WHEN 'no-protection' THEN p.b_no
                        WHEN 'little-protection' THEN p.b_little
                        WHEN 'protected' THEN p.b_protected
                        ELSE p.b_heavy END) * pow(c.day_sum, p.e)
               END AS dn
        FROM classed c JOIN params p ON c.ptype = p.ptype
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey,
           CASE WHEN l.l_quantity > 0 AND dl.dn IS NOT NULL
                THEN round(l.l_quantity + dl.dn / dl.count_n, 3)
                ELSE l.l_quantity END AS corr
    FROM lineitem l
    LEFT JOIN delta dl ON l.l_suppkey = dl.l_suppkey
                      AND CAST(l.l_shipdate AS DATE) = dl.d
    """,
    doc="Richter correction (StationP.py:486-652): A3 daily sums + wet "
        "counts, J6 temperature join (deterministic day-of-year temp), "
        "precip-type CASE, J7 broadcast params join, b*(sum^e) delta "
        "distributed over the day's wet intervals — lineitem as 10-min "
        "facts, suppliers as stations.",
    bench=True,
)
def richter_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.richter import (
        richter_correct,
        richter_parameters_df,
    )

    li = load(spark, sf_dir, "lineitem")
    ts_p = li.select(
        F.col("l_suppkey").cast("int").alias("station_id"),
        F.col("l_shipdate").alias("timestamp"),
        F.col("l_quantity").alias("filled"),
        "l_orderkey",
        "l_linenumber",
    )
    # deterministic daily "temperature" series per station
    ts_t = (
        ts_p.select("station_id", F.to_date("timestamp").alias("timestamp"))
        .distinct()
        .withColumn(
            "filled",
            ((F.dayofyear("timestamp") * 7) % 40 - 10).cast("double"),
        )
    )
    meta = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("int").alias("station_id"),
        F.when(F.col("s_suppkey") % 15 < 3, "no-protection")
        .when(F.col("s_suppkey") % 15 < 7, "little-protection")
        .when(F.col("s_suppkey") % 15 < 12, "protected")
        .otherwise("heavy-protection")
        .alias("richter_class"),
    )
    out = richter_correct(ts_p, ts_t, meta, richter_parameters_df(spark), round_digits=3)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.col("station_id").cast("long").alias("l_suppkey"),
        "corr",
    )


# --------------------------------------------------------------------------
# A2 — yearly multi-annual mean (gap-scaled, 90% coverage)
# --------------------------------------------------------------------------

@_register(
    "a2_yearly_ma",
    oracle="""
    WITH yearly AS (
        SELECT l_suppkey, year(l_shipdate) AS y,
               CASE WHEN count(qty_ok) * 1.0 / count(*) > 0.9
                    THEN sum(qty_ok) / count(qty_ok) * count(*) END AS scaled
        FROM (
            SELECT l_suppkey, l_shipdate,
                   CASE WHEN l_tax <= 0.07 THEN l_quantity END AS qty_ok
            FROM lineitem
        ) t
        GROUP BY 1, 2
    )
    SELECT l_suppkey, round(avg(scaled), 4) AS ma_value
    FROM yearly GROUP BY 1
    """,
    doc="A2 yearly MA of a timeserie: per year sum/count*count(*) where "
        "coverage > 0.9, averaged across years "
        "(StationBases.py:940-958) over lineitem.",
)
def a2_yearly_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.aggregate import yearly_ma

    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_shipdate").alias("timestamp"),
        F.when(F.col("l_tax") <= 0.07, F.col("l_quantity")).alias("qty_ok"),
    )
    out = yearly_ma(li, kinds=["qty_ok"], agg_fun="sum", group_cols=("l_suppkey",))
    return out.select("l_suppkey", F.round("qty_ok", 4).alias("ma_value"))


# --------------------------------------------------------------------------
# A4 — qc_dropped share
# --------------------------------------------------------------------------

@_register(
    "a4_qc_dropped",
    oracle="""
    SELECT l_suppkey,
           round((count(raw) - count(qc)) * 100.0 / count(raw), 2) AS qc_dropped
    FROM (
        SELECT l_suppkey, l_quantity AS raw,
               CASE WHEN l_returnflag != 'R' THEN l_quantity END AS qc
        FROM lineitem
    ) t
    GROUP BY 1
    """,
    doc="A4 qc_dropped %% per station (StationBases.py:1316-1323) — "
        "returned lineitems as qc-dropped values.",
)
def a4_qc_dropped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.aggregate import qc_dropped_share

    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_quantity").alias("raw"),
        F.when(F.col("l_returnflag") != "R", F.col("l_quantity")).alias("qc"),
    )
    return qc_dropped_share(li, group_cols=("l_suppkey",))


# --------------------------------------------------------------------------
# A5 — hole census (gap thresholds via lag)
# --------------------------------------------------------------------------

@_register_extra(
    "a5_hole_census",
    oracle="""
    WITH p AS (
        SELECT user_id, ts,
               epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap_s
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id,
           count(*) FILTER (WHERE gap_s >= 43200) AS holes_ge_12_hours,
           count(*) FILTER (WHERE gap_s >= 86400) AS holes_ge_24_hours
    FROM p GROUP BY 1
    """,
    doc="A5 hole census: gaps via ts - lag(ts), conditional counts per "
        "threshold (StationBases.py:1981-2029) over events per user. "
        "EXTRA: unbounded variant subsumed by a5_hole_census_bounded, "
        "which adds the reference's meta-period sentinel bounds.",
)
def a5_hole_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.aggregate import hole_census

    ev = load(spark, sf_dir, "events")
    return hole_census(
        ev,
        gap_thresholds=("12 hours", "24 hours"),
        ts_col="ts",
        value_col="value",
        group_cols=("user_id",),
    )


@_register(
    "a5_hole_census_bounded",
    oracle="""
    WITH pres AS (
        SELECT user_id, ts FROM events
        WHERE value IS NOT NULL
          AND ts BETWEEN TIMESTAMP '2023-12-15 00:00:00'
                     AND TIMESTAMP '2024-02-15 00:00:00'
    ),
    allts AS (
        SELECT user_id, ts FROM pres
        UNION ALL
        SELECT DISTINCT user_id, TIMESTAMP '2023-12-15 00:00:00' FROM pres
        UNION ALL
        SELECT DISTINCT user_id, TIMESTAMP '2024-02-15 00:00:00' FROM pres
    ),
    g AS (
        SELECT user_id,
               epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   AS gap_s
        FROM allts
    )
    SELECT user_id,
           count(*) FILTER (WHERE gap_s >= 43200) AS holes_ge_12_hours,
           count(*) FILTER (WHERE gap_s >= 86400) AS holes_ge_24_hours
    FROM g GROUP BY 1
    """,
    doc="A5 with explicit period bounds: the bounds crop the scan AND "
        "join it as sentinel timestamps so leading/trailing holes count "
        "(reference UNIONs min_tstp/max_tstp, StationBases.py:2008-2014). "
        "Events span 2024-01-01..30, so every user gains a >=2-week "
        "leading and trailing hole.",
)
def a5_hole_census_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.aggregate import hole_census

    ev = load(spark, sf_dir, "events")
    return hole_census(
        ev,
        gap_thresholds=("12 hours", "24 hours"),
        ts_col="ts",
        value_col="value",
        group_cols=("user_id",),
        period=("2023-12-15 00:00:00", "2024-02-15 00:00:00"),
    )


# --------------------------------------------------------------------------
# A7 — adjustment: scale series so period mean == MA value
# --------------------------------------------------------------------------

@_register(
    "a7_adjustment_factors",
    oracle=f"""
    WITH ma AS ({_MA_SQL}),
    yearly AS (
        SELECT l_suppkey, year(l_shipdate) AS y, sum(l_quantity) AS ysum
        FROM lineitem GROUP BY 1, 2
    )
    SELECT y.l_suppkey, y.y AS year,
           round(y.ysum * m.ma * 40 / avg(y.ysum) OVER (PARTITION BY y.l_suppkey), 3)
               AS adj_sum
    FROM yearly y JOIN ma m ON y.l_suppkey = m.s_suppkey
    """,
    doc="A7 multiplicative adjustment: scale yearly sums so the period "
        "mean equals the station's MA target "
        "(StationBases.py:3094-3122,3136-3184) — lineitem yearly qty.",
)
def a7_adjustment_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    yearly = li.groupBy(
        "l_suppkey", F.year("l_shipdate").alias("year")
    ).agg(F.sum("l_quantity").alias("ysum"))
    ma = _ma_df(spark, sf_dir).select(
        F.col("station_id").cast("long").alias("l_suppkey"),
        (F.col("value") * 40).alias("ma_target"),
    )
    w = W.partitionBy("l_suppkey")
    out = yearly.join(F.broadcast(ma), "l_suppkey").withColumn(
        "adj_sum", F.round(F.col("ysum") * F.col("ma_target") / F.avg("ysum").over(w), 3)
    )
    return out.select("l_suppkey", "year", "adj_sum")


# --------------------------------------------------------------------------
# A8/A9 — min/max period where kind is present
# --------------------------------------------------------------------------

@_register(
    "a8_filled_period",
    oracle="""
    SELECT user_id, min(ts) AS value_from, max(ts) AS value_until
    FROM events WHERE value >= 5 GROUP BY 1
    """,
    doc="A8 filled-period bounds: min/max ts where kind is not NULL "
        "(StationBases.py:2121-2131) over events.",
)
def a8_filled_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.aggregate import filled_period

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", F.when(F.col("value") >= 5, F.col("value")).alias("v")
    )
    out = filled_period(ev, kind="v", ts_col="ts", group_cols=("user_id",))
    return out.select(
        "user_id", F.col("v_from").alias("value_from"), F.col("v_until").alias("value_until")
    )


# --------------------------------------------------------------------------
# J3 — aggregated-to-daily join with shifted day boundary
# --------------------------------------------------------------------------

@_register(
    "j3_daily_shifted_join",
    oracle="""
    WITH li AS (
        SELECT CAST(l_shipdate - INTERVAL 6 HOUR AS DATE) AS day,
               sum(l_quantity) AS sum_qty, count(*) AS n_items
        FROM lineitem GROUP BY 1
    ),
    od AS (
        SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT li.day, li.sum_qty, li.n_items, od.n_orders
    FROM li LEFT JOIN od USING (day)
    """,
    doc="J3/A3: aggregate fine-grained rows to a shifted day key "
        "((ts - '6h')::date, StationP.py:107-119) and LEFT JOIN the daily "
        "table — lineitem vs orders.",
)
def j3_daily_shifted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.functions.temporal import shifted_date

    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy(shifted_date(F.col("l_shipdate"), "6 hours").alias("day"))
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_items"))
    )
    od = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return li.join(od, "day", "left")


# --------------------------------------------------------------------------
# J10 — MA quotient views
# --------------------------------------------------------------------------

@_register(
    "j10_ma_quotient",
    oracle="""
    WITH cust AS (
        SELECT c_nationkey AS nationkey, round(avg(c_acctbal), 6) AS ma_timeserie
        FROM customer GROUP BY 1
    ),
    supp AS (
        SELECT s_nationkey AS nationkey, round(avg(s_acctbal), 6) AS ma_raster
        FROM supplier GROUP BY 1
    )
    SELECT c.nationkey, c.ma_timeserie, s.ma_raster,
           round(c.ma_timeserie / s.ma_raster, 6) AS quotient
    FROM cust c LEFT JOIN supp s USING (nationkey)
    """,
    doc="J10 MA quotient views: station_ma_timeserie vs station_ma_raster "
        "join + quotient select (db/views.py:77-165) — per-nation customer "
        "vs supplier balances.",
)
def j10_ma_quotient(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.round(F.avg("c_acctbal"), 6).alias("ma_timeserie"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.round(F.avg("s_acctbal"), 6).alias("ma_raster"))
    )
    return cust.join(supp, "nationkey", "left").withColumn(
        "quotient", F.round(F.col("ma_timeserie") / F.col("ma_raster"), 6)
    )


# --------------------------------------------------------------------------
# J11 — incremental modtime anti-join (raw_files diff)
# --------------------------------------------------------------------------

@_register(
    "j11_incremental_antijoin",
    oracle="""
    WITH db AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 2 = 0 THEN o_orderdate
                    ELSE o_orderdate - INTERVAL 1 DAY END AS modtime
        FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT o.o_orderkey, o.o_orderdate
    FROM orders o LEFT JOIN db ON o.o_orderkey = db.o_orderkey
    WHERE db.o_orderkey IS NULL OR db.modtime != o.o_orderdate
    """,
    doc="J11 incremental download manifest: CDC listing joined to "
        "raw_files on filepath, keep new or changed modtimes "
        "(StationBases.py:1183-1204) — orders as the file listing.",
)
def j11_incremental_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    db = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_orderdate"))
        .otherwise(F.col("o_orderdate") - F.expr("INTERVAL 1 DAY"))
        .alias("modtime"),
    )
    j = orders.join(db, "o_orderkey", "left")
    return j.filter(
        F.col("modtime").isNull() | (F.col("modtime") != F.col("o_orderdate"))
    ).select("o_orderkey", "o_orderdate")


# --------------------------------------------------------------------------
# J12 — virtual-station materialization (left-anti + union)
# --------------------------------------------------------------------------

@_register(
    "j12_virtual_stations",
    oracle="""
    SELECT n_nationkey, TRUE AS is_real FROM nation
    WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
    UNION ALL
    SELECT n_nationkey, FALSE AS is_real FROM nation
    WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
      AND EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
    """,
    doc="J12 virtual stations: T/ET meta rows materialized at P locations "
        "that lack them — left-anti join + union "
        "(StationBases.py:2868-2885) — nations with customers but no "
        "suppliers become virtual.",
)
def j12_virtual_stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    supp_nations = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    ).distinct()
    cust_nations = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    ).distinct()
    real = nation.join(supp_nations, "n_nationkey", "semi").select(
        "n_nationkey", F.lit(True).alias("is_real")
    )
    virtual = (
        nation.join(supp_nations, "n_nationkey", "anti")
        .join(cust_nations, "n_nationkey", "semi")
        .select("n_nationkey", F.lit(False).alias("is_real"))
    )
    return real.unionByName(virtual)


# --------------------------------------------------------------------------
# S10 — export date split + §2.6 sort/limit top-k
# --------------------------------------------------------------------------

@_register(
    "s10_export_split_date",
    oracle="""
    SELECT event_id, user_id,
           year(ts) AS Jahr, month(ts) AS Monat, day(ts) AS Tag,
           hour(ts) AS Stunde, minute(ts) AS Minute,
           value
    FROM events
    """,
    doc="S10 export date split: Jahr/Monat/Tag/Stunde/Minute columns "
        "(GroupStation.py:705-744) over events.",
)
def s10_export_split_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.export import split_date

    ev = load(spark, sf_dir, "events")
    return split_date(ev, ts_col="ts", keep=("event_id", "user_id"), value_cols=("value",))


@_register(
    "topk_order_limit",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    ORDER BY value DESC, event_id ASC
    LIMIT 100
    """,
    doc="§2.6 ORDER BY ... LIMIT top-k with deterministic tiebreak "
        "(StationBases.py:2286-2287) over events.",
)
def topk_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .select("event_id", "user_id", "value")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Fillup step 6 — bounded linear interpolation of leftover holes
# --------------------------------------------------------------------------

@_register(
    "fillup_interpolation",
    oracle=f"""
    WITH {_DAILY_SQL},
    bounds AS (
        SELECT station_id, min(d) AS mn, max(d) AS mx FROM daily GROUP BY 1
    ),
    grid AS (
        SELECT station_id, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    ),
    base AS (
        SELECT g.station_id, g.d, f.qty
        FROM grid g LEFT JOIN daily f ON g.station_id = f.station_id AND g.d = f.d
    ),
    win AS (
        SELECT station_id, d, qty,
               last_value(qty IGNORE NULLS) OVER wprev AS pv,
               last_value(CASE WHEN qty IS NOT NULL THEN d END IGNORE NULLS)
                   OVER wprev AS pt,
               first_value(qty IGNORE NULLS) OVER wnext AS nv,
               first_value(CASE WHEN qty IS NOT NULL THEN d END IGNORE NULLS)
                   OVER wnext AS nt
        FROM base
        WINDOW
            wprev AS (PARTITION BY station_id ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            wnext AS (PARTITION BY station_id ORDER BY d
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT station_id, d AS day,
           CASE WHEN qty IS NULL AND pv IS NOT NULL AND nv IS NOT NULL
                     AND epoch(CAST(nt AS TIMESTAMP)) - epoch(CAST(pt AS TIMESTAMP)) <= 172800
                THEN round(pv + (nv - pv)
                           * (epoch(CAST(d AS TIMESTAMP)) - epoch(CAST(pt AS TIMESTAMP)))
                           / (epoch(CAST(nt AS TIMESTAMP)) - epoch(CAST(pt AS TIMESTAMP))), 2)
                ELSE qty END AS filled,
           CASE WHEN qty IS NULL AND pv IS NOT NULL AND nv IS NOT NULL
                     AND epoch(CAST(nt AS TIMESTAMP)) - epoch(CAST(pt AS TIMESTAMP)) <= 172800
                THEN CAST(-1 AS BIGINT) END AS filled_by
    FROM win
    """,
    doc="Fillup step 6: linear interpolation of leftover holes bounded by "
        "max_gap via last/first ignorenulls windows, filled_by = -1 "
        "provenance (StationBases.py:1494-1562, gap bounds "
        "config_default.ini:146-158) — daily supplier series on the S6 grid.",
)
def fillup_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.fillup import interpolate_gaps
    from weatherdb_spark.operators.timeline import expand_timeline

    daily = _daily_df(spark, sf_dir)
    grid = expand_timeline(
        daily, interval="1 day", group_cols=("station_id",), min_date=None
    ).withColumnRenamed("qty", "filled")
    out = interpolate_gaps(grid, max_gap="2 days", round_digits=2)
    return out.select(
        F.col("station_id").cast("long").alias("station_id"),
        F.col("timestamp").alias("day"),
        F.col("filled"),
        F.col("filled_by").cast("long").alias("filled_by"),
    )


# --------------------------------------------------------------------------
# Fillup step 7 — P daily adjustment with caps (StationP.py:692-746)
# --------------------------------------------------------------------------

_ADJ_TS_SQL = """
    ts0 AS (
        SELECT l_suppkey AS station_id,
               l_shipdate + INTERVAL (l_linenumber * 10) MINUTE AS tstamp,
               sum(l_quantity) AS q
        FROM lineitem GROUP BY 1, 2
    ),
    ts AS (
        -- every second 10-min slot zeroed so the isolated-peak branch
        -- (both adjacent filled = 0) actually fires
        SELECT station_id, tstamp,
               CASE WHEN EXTRACT(MINUTE FROM tstamp) % 20 = 0
                    THEN 0.0 ELSE q END AS filled
        FROM ts0
    )
"""

@_register(
    "fillup_daily_adjust",
    oracle=f"""
    WITH {_ADJ_TS_SQL},
    keyed AS (
        SELECT *, CAST(tstamp - INTERVAL '5 hours 50 minutes' AS DATE) AS d
        FROM ts
    ),
    sums AS (
        SELECT station_id, d, sum(filled) AS sum_f FROM keyed GROUP BY 1, 2
    ),
    daily AS (
        SELECT station_id, d, sum_f * (station_id % 10 + 1) / 4.0 AS raw_d
        FROM sums
    ),
    coefs AS (
        SELECT s.station_id, s.d, dd.raw_d / s.sum_f AS coef
        FROM sums s
        JOIN daily dd ON s.station_id = dd.station_id AND s.d = dd.d
        WHERE dd.raw_d IS NOT NULL AND s.sum_f > 0
          AND dd.raw_d / s.sum_f != 1
    ),
    win AS (
        SELECT k.*, c.coef,
               lag(k.filled) OVER w AS pf,
               lead(k.filled) OVER w AS nf
        FROM keyed k
        LEFT JOIN coefs c ON k.station_id = c.station_id AND k.d = c.d
        WINDOW w AS (PARTITION BY k.station_id ORDER BY k.tstamp)
    )
    SELECT station_id, tstamp AS timestamp, filled,
           CASE WHEN filled IS NOT NULL AND coef IS NOT NULL THEN
               round(CASE WHEN pf = 0 AND nf = 0
                          THEN least(filled * coef, 5.0)
                          WHEN (filled * coef - filled) <= 10
                          THEN least(filled * coef, 50.0)
                          ELSE least(filled + 10, 50.0) END, 2)
           ELSE filled END AS corr_base
    FROM win
    """,
    doc="Fillup step 7 (P only): scale each 5h50-shifted day's 10-min "
        "values so they sum to the daily measurement (StationP.py:692-746); "
        "the isolated-peak cap fires when BOTH adjacent 10-min filled "
        "values are 0 (tsb.filled = 0 AND tsa.filled = 0, "
        "StationP.py:705-710), growth is capped at 10 mm, hard cap 50 mm; "
        "coef rows require daily raw present, sum > 0 and coef != 1.",
)
def fillup_daily_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.functions.temporal import shifted_date
    from weatherdb_spark.operators.fillup import daily_adjust_p

    li = load(spark, sf_dir, "lineitem")
    ts_p = (
        li.groupBy(
            F.col("l_suppkey").alias("station_id"),
            F.expr(
                "l_shipdate + make_interval(0, 0, 0, 0, 0, CAST(l_linenumber AS INT) * 10, 0)"
            ).alias("timestamp"),
        )
        .agg(F.sum("l_quantity").alias("_q"))
        .withColumn(
            "filled",
            F.when(F.minute("timestamp") % 20 == 0, F.lit(0.0)).otherwise(F.col("_q")),
        )
        .drop("_q")
    )
    day = shifted_date(F.col("timestamp"), "5 hours 50 minutes")
    ts_p_d = (
        ts_p.withColumn("_d", day)
        .groupBy("station_id", "_d")
        .agg(F.sum("filled").alias("_s"))
        .select(
            "station_id",
            F.col("_d").cast("timestamp").alias("timestamp"),
            (F.col("_s") * (F.col("station_id") % 10 + 1) / 4.0).alias("raw"),
        )
    )
    out = daily_adjust_p(ts_p, ts_p_d)
    return out.select("station_id", "timestamp", "filled", "corr_base")


# --------------------------------------------------------------------------
# Deep fillup — full distance-bounded candidate set, donor-starved fixture
# --------------------------------------------------------------------------

# unbounded elevation-weighted neighbor set (every other station, ranked)
_KNN_ALL_SQL = f"""
    coords AS ({_COORDS_SQL}),
    knn AS (
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
    )
"""

# starve half the station-days: nearby stations share the parity pattern
# often enough that many timestamps have all 5 nearest donors NULL and must
# draw from farther candidates — the case a k=5 neighbor dim cannot fill
_STARVED_SQL = f"""
    {_DAILY_SQL},
    starved AS (
        SELECT station_id, d,
               CASE WHEN (station_id * 13 + dayofyear(d)) % 2 = 0
                    THEN NULL ELSE qty END AS qty
        FROM daily
    )
"""


def _starved_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_df(spark, sf_dir)
    return daily.select(
        "station_id",
        "timestamp",
        F.when(
            (F.col("station_id") * 13 + F.dayofyear("timestamp")) % 2 == 0,
            F.lit(None),
        ).otherwise(F.col("qty")).alias("qty"),
    )


@_register(
    "fillup_rank_fill_deep",
    oracle=f"""
    WITH {_KNN_ALL_SQL}, {_STARVED_SQL},
    ma AS ({_MA_SQL}),
    bounds AS (
        SELECT station_id, min(d) AS mn, max(d) AS mx FROM starved GROUP BY 1
    ),
    grid AS (
        SELECT station_id, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    ),
    base AS (
        SELECT g.station_id, g.d, f.qty
        FROM grid g LEFT JOIN starved f ON g.station_id = f.station_id AND g.d = f.d
    ),
    donors AS (
        SELECT k.station_id, f.d, k.rank, k.nb_station_id,
               f.qty * m1.ma / m2.ma AS reg_val
        FROM knn k
        JOIN ma m1 ON m1.s_suppkey = k.station_id
        JOIN ma m2 ON m2.s_suppkey = k.nb_station_id
        JOIN starved f ON f.station_id = k.nb_station_id AND f.qty IS NOT NULL
    ),
    best AS (
        SELECT station_id, d,
               arg_min(reg_val, rank) AS fill_val,
               arg_min(nb_station_id, rank) AS fill_by
        FROM donors GROUP BY 1, 2
    )
    SELECT b.station_id, b.d AS day,
           coalesce(b.qty, s.fill_val) AS filled,
           CASE WHEN b.qty IS NULL AND s.fill_val IS NOT NULL
                THEN s.fill_by END AS filled_by
    FROM base b LEFT JOIN best s ON b.station_id = s.station_id AND b.d = s.d
    """,
    doc="Deep fillup: the oracle uses the UNBOUNDED candidate set (every "
        "station, distance-ranked) on a donor-starved series (half the "
        "station-days NULL) — reference semantics of looping ALL stations "
        "within max_fillup_dist until no holes remain "
        "(StationBases.py:1573-1638). The Spark side runs the cascade "
        "optimization (nearest-5 first, hole-targeted full pass after), "
        "proving it bitwise-equal to the unbounded join.",
)
def fillup_rank_fill_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.fillup import rank_fill
    from weatherdb_spark.operators.neighbors import knn_stations
    from weatherdb_spark.operators.timeline import expand_timeline

    starved = _starved_df(spark, sf_dir)
    # consumed by the donor side, the hole anti-join, and the final join
    grid = scoped_persist(expand_timeline(
        starved, interval="1 day", group_cols=("station_id",), min_date=None
    ))
    knn = knn_stations(supplier_coords(spark, sf_dir), k=None, elevation_weighted=True)
    out = rank_fill(
        grid, knn, _ma_df(spark, sf_dir), coef_sign="mult", base_col="qty",
        ts_col="timestamp", round_digits=None, cascade_k=5,
        # the starved fixture is ~90% holes on the expanded grid by
        # construction — the hole semi join can't pay for itself, so
        # skip the auto-size probe (callers with unknown regimes omit it)
        hole_semi=False,
    )
    return out.select(
        F.col("station_id").cast("long").alias("station_id"),
        F.col("timestamp").alias("day"),
        F.col("filled"),
        F.col("filled_by").cast("long").alias("filled_by"),
    )


@_register(
    "fillup_median_deep",
    oracle=f"""
    WITH {_KNN_ALL_SQL}, {_STARVED_SQL},
    ma AS ({_MA_SQL}),
    bounds AS (
        SELECT station_id, min(d) AS mn, max(d) AS mx FROM starved GROUP BY 1
    ),
    grid AS (
        SELECT station_id, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    ),
    base AS (
        SELECT g.station_id, g.d, f.qty
        FROM grid g LEFT JOIN starved f ON g.station_id = f.station_id AND g.d = f.d
    ),
    donors AS (
        SELECT k.station_id, f.d, k.rank, k.nb_station_id,
               f.qty + (m1.ma - m2.ma) AS reg_val,
               (k.dist_m <= 4000) AS nearf
        FROM knn k
        JOIN ma m1 ON m1.s_suppkey = k.station_id
        JOIN ma m2 ON m2.s_suppkey = k.nb_station_id
        JOIN starved f ON f.station_id = k.nb_station_id AND f.qty IS NOT NULL
    ),
    sel AS (
        SELECT *,
               row_number() OVER (PARTITION BY station_id, d, nearf ORDER BY rank) AS rn,
               max(CASE WHEN nearf THEN 1 ELSE 0 END)
                   OVER (PARTITION BY station_id, d) AS has_near
        FROM donors
    ),
    kept AS (
        SELECT * FROM sel
        WHERE (nearf AND rn <= 5) OR ((NOT nearf) AND rn = 1 AND has_near = 0)
    ),
    med AS (
        SELECT station_id, d,
               quantile_cont(reg_val, 0.5) AS medv,
               string_agg(nb_station_id::VARCHAR, ',' ORDER BY rank) AS donors_str
        FROM kept GROUP BY 1, 2
    )
    SELECT b.station_id, b.d AS day,
           round(CASE WHEN b.qty IS NULL THEN m.medv ELSE b.qty END, 4) AS filled,
           CASE WHEN b.qty IS NULL AND m.medv IS NOT NULL
                THEN m.donors_str END AS filled_by
    FROM base b LEFT JOIN med m ON b.station_id = m.station_id AND b.d = m.d
    """,
    doc="Deep T-style median fillup: median of the first 5 non-null donors "
        "in distance order from the FULL candidate set; beyond the "
        "near-distance threshold (_fillup_max_dist, StationT.py:48) a "
        "single donor is used and only when no nearer one exists "
        "(StationBases.py:1467-1471). filled_by is the donor id list in "
        "neighbor-rank order. Spark runs the cascade (nearest-8 first).",
    bench=True,
)
def fillup_median_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.fillup import median_fill
    from weatherdb_spark.operators.neighbors import knn_stations
    from weatherdb_spark.operators.timeline import expand_timeline

    starved = _starved_df(spark, sf_dir)
    # consumed by the donor side, the hole targets, and the final join
    grid = scoped_persist(expand_timeline(
        starved, interval="1 day", group_cols=("station_id",), min_date=None
    ))
    knn = knn_stations(supplier_coords(spark, sf_dir), k=None, elevation_weighted=True)
    out = median_fill(
        grid, knn, _ma_df(spark, sf_dir), n_donors=5, base_col="qty",
        value_cols=("qty",), out_cols=("filled",), ts_col="timestamp",
        round_digits=None, near_dist_m=4000.0, cascade_k=8,
        # see fillup_rank_fill_deep: known ~90%-hole fixture
        hole_semi=False,
    )
    return out.select(
        F.col("station_id").cast("long").alias("station_id"),
        F.col("timestamp").alias("day"),
        F.round("filled", 4).alias("filled"),
        F.array_join(F.col("filled_by"), ",").alias("filled_by"),
    )


# --------------------------------------------------------------------------
# A7 seasonal — P's winter/summer half-year adjustment factors
# --------------------------------------------------------------------------

@_register(
    "a7_seasonal_adjust",
    oracle=f"""
    WITH {_DAILY_SQL},
    terms AS (
        SELECT station_id, d, qty,
               CASE WHEN month(d) IN (4, 5, 6, 7, 8, 9)
                    THEN 'suhy' ELSE 'wihy' END AS term
        FROM daily
    ),
    yearly AS (
        SELECT station_id, term, year(d) AS y,
               sum(qty) AS ysum, count(qty) AS n
        FROM terms GROUP BY 1, 2, 3
    ),
    pstat AS (
        SELECT station_id, term, avg(ysum) AS p
        FROM yearly WHERE n >= 30 GROUP BY 1, 2
    ),
    sma AS (
        SELECT s_suppkey AS station_id, 'wihy' AS term,
               CAST(s_suppkey % 20 + 40 AS DOUBLE) AS v
        FROM supplier
        UNION ALL
        SELECT s_suppkey, 'suhy', CAST(s_suppkey % 15 + 30 AS DOUBLE)
        FROM supplier
    )
    SELECT t.station_id, t.d AS day, t.term, t.qty,
           round(t.qty * m.v / p.p, 3) AS adj
    FROM terms t
    LEFT JOIN pstat p ON t.station_id = p.station_id AND t.term = p.term
    LEFT JOIN sma m ON t.station_id = m.station_id AND t.term = m.term
    """,
    doc="A7 P seasonal adjustment (StationPBase.get_adj, "
        "StationBases.py:3136-3184): rows split into suhy (Apr-Sep) / "
        "wihy half-years; per (station, term) the period statistic is the "
        "mean of yearly sums over years passing the min-count gate; each "
        "row scales by its term's ma / period_stat. Stations/terms "
        "without a qualifying year stay NULL.",
)
def a7_seasonal_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.operators.aggregate import adjust_series_seasonal

    daily = _daily_df(spark, sf_dir)
    sup = load(spark, sf_dir, "supplier")
    sma = sup.select(
        F.col("s_suppkey").cast("int").alias("station_id"),
        F.lit("wihy").alias("term"),
        (F.col("s_suppkey") % 20 + 40).cast("double").alias("value"),
    ).unionByName(
        sup.select(
            F.col("s_suppkey").cast("int").alias("station_id"),
            F.lit("suhy").alias("term"),
            (F.col("s_suppkey") % 15 + 30).cast("double").alias("value"),
        )
    )
    out = adjust_series_seasonal(
        daily, sma, value_col="qty", ts_col="timestamp",
        min_count=30, round_digits=3,
    )
    return out.select(
        F.col("station_id").cast("long").alias("station_id"),
        F.col("timestamp").alias("day"),
        "term",
        "qty",
        "adj",
    )
