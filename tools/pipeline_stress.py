#!/usr/bin/env python
"""Broker pipeline stress: synthesize a multi-million-row warehouse and
time every stage end-to-end. Prints ONE JSON line so rounds can diff it.

Usage::

    python tools/pipeline_stress.py [--stations 100] [--years 2] [--wh DIR]

Default shape (100 stations x 2 years): ~10.5M rows of 10-minute P plus
daily P_D / T / ET — big enough that a quadratic plan (the class of bug the
sf0.1 registry queries are too small to surface, e.g. round 4's
O(rows^2) UNBOUNDED FOLLOWING interpolation frame) turns minutes into
hours and gets caught before a real 100x scale-up.

Stages timed: update_meta + update_ma_raster, update_raw (all four
parameters, timeline-expanded), quality_check, fillup (p_d, p with
interpolation + daily adjust, t 5-donor median incl. min/max, et),
richter_correct_stage, and a one-day incremental import (append_raw +
last_imp_quality_check + last_imp_fillup + last_imp_corr).

The synthetic series plant the pipeline's work: holes (NULL runs) that
fillup must close, consecutive equal runs and spikes for QC, and a daily
P_D series offset from the 10-min sums so daily adjustment has a real
coefficient. Data is arbitrary but deterministic (pure column
arithmetic, no RNG) — two runs of the same shape time the same plan.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from weatherdb_spark.broker import Broker  # noqa: E402
from weatherdb_spark.session import get_spark  # noqa: E402

START = "2018-01-01"


def _meta(spark, n_stations):
    ids = spark.range(1, n_stations + 1).select(F.col("id").cast("int").alias("station_id"))
    paras = spark.createDataFrame([("p",), ("p_d",), ("t",), ("et",)], "parameter string")
    return ids.crossJoin(paras).select(
        "station_id", "parameter",
        F.lit(True).alias("is_real"),
        F.concat(F.lit("st"), F.col("station_id")).alias("stationsname"),
        # ~30 km grid, 10 columns wide -> realistic neighbor distances
        ((F.col("station_id") % 10) * 30000.0).alias("x_utm"),
        (F.floor(F.col("station_id") / 10) * 30000.0).alias("y_utm"),
        (150 + (F.col("station_id") % 23) * 40).cast("int").alias("stationshoehe"),
        F.when(F.col("parameter") == "p",
               (F.col("station_id") % 14).cast("double")).alias("horizon"),
    )


def _ma(spark, n_stations):
    ids = spark.range(1, n_stations + 1).select(F.col("id").cast("int").alias("station_id"))
    rows = []
    for para, base, step in (("p", 800.0, 3.0), ("p_d", 800.0, 3.0),
                             ("t", 9.0, 0.05), ("et", 550.0, 1.5)):
        terms = ("wihy", "suhy", "year") if para in ("p", "p_d") else ("year",)
        for term in terms:
            rows.append(
                ids.select(
                    "station_id", F.lit(para).alias("parameter"),
                    F.lit(term).alias("term"),
                    (F.lit(base) + (F.col("station_id") % 17) * step
                     * (0.5 if term == "wihy" else 1.0)).alias("value"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _p_value():
    """Deterministic 10-min P value from (slot, station_id) — holes for
    fillup, 3-runs and spikes for QC."""
    return (
        F.when((F.col("slot") + F.col("station_id") * 13) % 97 < 5, None)  # ~5% holes
        .when((F.col("slot") % 701).isin(13, 14, 15), 0.5)                 # 3-runs
        .when((F.col("slot") + F.col("station_id")) % 499 == 7, 9.0)      # spikes
        .when(F.col("slot") % 7 == 0,
              F.round(((F.col("slot") + F.col("station_id")) % 13) * 0.1, 1))
        .otherwise(0.0)
        .alias("raw")
    )


def _ten_min_p(spark, n_stations, n_days, skew=1):
    grid = spark.range(n_days * 144).select(
        (F.lit(START).cast("timestamp")
         + F.col("id") * F.expr("INTERVAL 10 MINUTES")).alias("timestamp"),
        F.col("id").alias("slot"),
    )
    st = spark.range(1, n_stations + 1).select(F.col("id").cast("int").alias("station_id"))
    out = st.crossJoin(grid).select(
        "station_id", "timestamp", _p_value(),
        F.lit(1).cast("short").alias("qn"),
    )
    if skew > 1:
        # station 1 alone carries (skew-1) extra YEARS of history BEFORE
        # START — the hot-key shape a real archive has (one station with
        # a multi-decade record among short-lived ones). The per-station
        # (station, year) chunking must keep its tasks year-sized.
        extra_days = (skew - 1) * n_days
        grid2 = spark.range(extra_days * 144).select(
            (F.lit(START).cast("timestamp")
             - F.expr(f"INTERVAL {extra_days} DAYS")
             + F.col("id") * F.expr("INTERVAL 10 MINUTES")).alias("timestamp"),
            F.col("id").alias("slot"),
        )
        st1 = spark.createDataFrame([(1,)], "station_id int")
        out = out.unionByName(st1.crossJoin(grid2).select(
            "station_id", "timestamp", _p_value(),
            F.lit(1).cast("short").alias("qn"),
        ))
    return out


def _daily(spark, n_stations, n_days, para, skew=1):
    grid = spark.range(n_days).select(
        (F.lit(START).cast("timestamp")
         + F.col("id") * F.expr("INTERVAL 1 DAY")).alias("timestamp"),
        F.col("id").alias("d"),
    )
    st = spark.range(1, n_stations + 1).select(F.col("id").cast("int").alias("station_id"))
    base = st.crossJoin(grid)
    if skew > 1:
        extra_days = (skew - 1) * n_days
        grid2 = spark.range(extra_days).select(
            (F.lit(START).cast("timestamp")
             - F.expr(f"INTERVAL {extra_days} DAYS")
             + F.col("id") * F.expr("INTERVAL 1 DAY")).alias("timestamp"),
            F.col("id").alias("d"),
        )
        st1 = spark.createDataFrame([(1,)], "station_id int")
        base = base.unionByName(st1.crossJoin(grid2))
    hole = (F.col("d") + F.col("station_id") * 7) % 19 < 1  # ~5% holes
    if para == "p_d":
        val = F.round((F.col("d") % 29) * 0.7 + (F.col("station_id") % 7), 1)
    elif para == "t":
        val = F.round(((F.col("d") % 365) - 180) * 0.05 + (F.col("station_id") % 5), 1)
    else:  # et
        val = F.round((F.col("d") % 365) * 0.01 + (F.col("station_id") % 3), 1)
    out = base.select(
        "station_id", "timestamp", F.when(hole, None).otherwise(val).alias("raw")
    )
    if para == "t":
        out = out.withColumn("raw_min", F.col("raw") - 2.0).withColumn(
            "raw_max", F.col("raw") + 2.0
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stations", type=int, default=100)
    ap.add_argument("--years", type=float, default=2.0)
    ap.add_argument(
        "--skew", type=int, default=1,
        help="station 1 gets this multiple of the base history (extra "
             "years BEFORE the start) — a hot-key probe for the "
             "(station, year) chunking; keep skew*years <= 19 so the "
             "skewed archive stays past the 1999 min_date cut",
    )
    ap.add_argument("--wh", default=None, help="warehouse dir (default: temp)")
    ap.add_argument("--keep", action="store_true", help="keep the warehouse")
    args = ap.parse_args()

    n_days = int(args.years * 365)
    wh = args.wh or tempfile.mkdtemp(prefix="wdb_stress_")
    # this sandbox shares hardware with noisy neighbors: wall times drift
    # up to ~3x between calm and contended windows (a back-to-back A/B of
    # two commits is the only trustworthy comparison). Stamp the host
    # load so a cross-round diff can tell plan regressions from weather.
    load_start = os.getloadavg()
    spark = get_spark(app_name="pipeline_stress")
    b = Broker(spark, wh)

    stages: dict[str, float] = {}

    def lap(name, fn):
        t0 = time.perf_counter()
        fn()
        stages[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {stages[name]}s", file=sys.stderr, flush=True)

    try:
        lap("update_meta", lambda: b.update_meta(_meta(spark, args.stations)))
        lap("update_ma_raster", lambda: b.update_ma_raster(_ma(spark, args.stations)))
        lap("update_raw_p", lambda: b.update_raw(
            "p", _ten_min_p(spark, args.stations, n_days, skew=args.skew)))
        for para in ("p_d", "t", "et"):
            lap(f"update_raw_{para}", lambda para=para: b.update_raw(
                para, _daily(spark, args.stations, n_days, para,
                             skew=args.skew)))
        lap("quality_check", b.quality_check)
        lap("fillup", b.fillup)
        lap("richter_correct", b.richter_correct_stage)

        # one-day incremental import: the day after the initial period
        day0 = n_days
        lap("incr_append_raw", lambda: b.append_raw(
            "p",
            _ten_min_p(spark, args.stations, n_days + 1).filter(
                F.col("timestamp") >= F.lit(START).cast("timestamp")
                + F.expr(f"INTERVAL {day0} DAYS")
            ),
        ))
        lap("incr_qc", lambda: b.last_imp_quality_check(margin="2 days"))
        lap("incr_fillup", lambda: b.last_imp_fillup(margin="2 days"))
        lap("incr_corr", lambda: b.last_imp_corr(margin="2 days"))

        rows = {t: b.read(t).count() for t in ("ts_p", "ts_p_d", "ts_t", "ts_et")}
        print(json.dumps({
            "metric": "pipeline_stress_wall",
            "value": round(sum(stages.values()), 2),
            "unit": "sec",
            "stations": args.stations,
            "years": args.years,
            "skew": args.skew,
            "rows": rows,
            "rows_total": sum(rows.values()),
            "stages": stages,
            "load_1min_start": round(load_start[0], 2),
            "load_1min_end": round(os.getloadavg()[0], 2),
        }))
        sys.stdout.flush()
    finally:
        if not args.keep and args.wh is None:
            shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
