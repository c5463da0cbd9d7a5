"""Per-station stage scoping (reference StationsBase.quality_check /
fillup with stids, StationsBase.py:824-857, 931-966): quality_check,
fillup and richter_correct_stage accept ``stids`` and recompute only the
touched stations, merging them back while every untouched station bucket
is carried over byte-identical (hard-linked from the previous snapshot —
the parquet twin of the reference's per-station UPDATE)."""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import shutil

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker, N_STATION_BUCKETS

STATIONS = [1224, 1443, 7243, 1346, 684, 757]
TARGET = 1443
START = dt.datetime(2024, 1, 1)
N_DAYS = 8
TS_TABLES = ["ts_p", "ts_p_d", "ts_t", "ts_et"]


def _build(spark, wh: str) -> Broker:
    b = Broker(spark, wh)
    meta = spark.createDataFrame(
        [
            (stid, para, True, f"st{stid}", 10000.0 * i, 5000.0 * (i % 3),
             150 + 200 * i, 9.5 if para == "p" else None)
            for i, stid in enumerate(STATIONS)
            for para in ("p", "p_d", "t", "et")
        ],
        "station_id int, parameter string, is_real boolean, stationsname string, "
        "x_utm double, y_utm double, stationshoehe int, horizon double",
    )
    ma = spark.createDataFrame(
        [
            (stid, para, term,
             {"p": 800.0, "p_d": 800.0, "t": 9.0, "et": 550.0}[para]
             + (i * {"p": 30.0, "p_d": 30.0, "t": 0.5, "et": 15.0}[para])
             * (0.5 if term == "wihy" else 1.0))
            for i, stid in enumerate(STATIONS)
            for para in ("p", "p_d", "t", "et")
            for term in (("wihy", "suhy", "year") if para in ("p", "p_d")
                         else ("year",))
        ],
        "station_id int, parameter string, term string, value double",
    )
    stations = spark.createDataFrame([(s,) for s in STATIONS], "station_id int")
    grid = spark.range(N_DAYS * 144).select(
        (F.lit(START.isoformat()).cast("timestamp")
         + F.col("id") * F.expr("INTERVAL 10 MINUTES")).alias("timestamp"),
        F.col("id").alias("slot"),
    )
    ts_p = stations.crossJoin(grid).select(
        "station_id", "timestamp",
        F.when(F.col("slot") % 450 == 7, None)
        .when((F.col("station_id") == 757) & (F.col("slot") % 144 < 6), None)
        .when(F.col("slot") % 7 == 0, F.round((F.col("slot") % 13) * 0.1, 1))
        .otherwise(0.0)
        .alias("raw"),
        F.lit(1).cast("short").alias("qn"),
    )
    day_grid = spark.range(N_DAYS).select(
        (F.lit(START.isoformat()).cast("timestamp")
         + F.col("id") * F.expr("INTERVAL 1 DAY")).alias("timestamp"),
        F.col("id").alias("d"),
    )
    base_daily = stations.crossJoin(day_grid)
    ts_p_d = base_daily.select(
        "station_id", "timestamp",
        F.when(F.col("d") % 5 == 3, None)
        .otherwise(F.round(F.col("d") * 1.5 + F.col("station_id") % 7, 1))
        .alias("raw"),
    )
    ts_t = base_daily.select(
        "station_id", "timestamp",
        F.when((F.col("d") % 4 == 1) & (F.col("station_id") == 684), None)
        .otherwise(F.round(F.col("d") * 0.3 + (F.col("station_id") % 5) - 2.0, 1))
        .alias("raw"),
    ).withColumn("raw_min", F.col("raw") - 2.0).withColumn(
        "raw_max", F.col("raw") + 2.0
    )
    ts_et = base_daily.select(
        "station_id", "timestamp",
        F.when((F.col("d") % 6 == 2) & (F.col("station_id") == 1346), None)
        .otherwise(F.round(F.col("d") * 0.2 + (F.col("station_id") % 3), 1))
        .alias("raw"),
    )
    b.update_db(meta, ma, {"p_d": ts_p_d, "p": ts_p, "t": ts_t, "et": ts_et})
    return b


def _perturb_target(b: Broker) -> None:
    """Change the target station's raw values so the stages have real
    work (new values + a fresh hole)."""
    for table in TS_TABLES:
        cur = b.read(table).drop("station_bucket")
        changed = cur.withColumn(
            "raw",
            F.when(
                F.col("station_id") == TARGET,
                F.when(F.dayofmonth("timestamp") == 3, None)
                .otherwise(F.round(F.col("raw") * 1.3 + 0.2, 1)),
            ).otherwise(F.col("raw")),
        )
        b.write(table, changed, bucket_by_station=True)


def _bucket_file_hashes(b: Broker, table: str, skip_bucket: int) -> dict:
    out = {}
    root = b.data_path(table)
    for entry in sorted(os.listdir(root)):
        if not entry.startswith("station_bucket="):
            continue
        if int(entry.split("=", 1)[1]) == skip_bucket:
            continue
        # walk the bucket tree (nested ts_year leaves since layout 3)
        bdir = os.path.join(root, entry)
        for sub, _dirs, files in os.walk(bdir):
            rel = os.path.relpath(sub, root)
            for fname in sorted(files):
                if fname.endswith(".parquet"):
                    with open(os.path.join(sub, fname), "rb") as fh:
                        out[(rel, fname)] = hashlib.md5(fh.read()).hexdigest()
    assert out, f"{table}: no parquet files found under bucket dirs"
    return out


@pytest.fixture(scope="module")
def scoped_pair(spark, tmp_path_factory):
    """(full-recompute broker, scoped-recompute broker) over identical
    perturbed warehouses."""
    wh_a = str(tmp_path_factory.mktemp("wh_full"))
    a = _build(spark, wh_a)
    wh_b = str(tmp_path_factory.mktemp("wh_scoped")) + "/wh"
    shutil.copytree(a.dir, wh_b)
    btk = Broker(spark, wh_b)
    btk.force_deactivate_all()
    _perturb_target(a)
    _perturb_target(btk)

    a.quality_check()
    a.fillup()
    a.richter_correct_stage()

    hashes_before = {
        t: _bucket_file_hashes(btk, t, TARGET % N_STATION_BUCKETS)
        for t in TS_TABLES
    }
    btk.quality_check(stids=[TARGET])
    btk.fillup(stids=[TARGET])
    btk.richter_correct_stage(stids=[TARGET])
    return a, btk, hashes_before


def _rows(b: Broker, table: str, stid: int):
    df = b.read(table).drop("station_bucket").filter(F.col("station_id") == stid)
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )


@pytest.mark.parametrize("table", TS_TABLES)
def test_scoped_equals_full_on_touched_station(scoped_pair, table):
    full, scoped, _ = scoped_pair
    assert _rows(full, table, TARGET) == _rows(scoped, table, TARGET)


@pytest.mark.parametrize("table", TS_TABLES)
def test_untouched_buckets_byte_identical(scoped_pair, table):
    _, scoped, hashes_before = scoped_pair
    after = _bucket_file_hashes(scoped, table, TARGET % N_STATION_BUCKETS)
    assert after == hashes_before[table], (
        f"{table}: untouched buckets were rewritten"
    )


def test_scoped_stage_changed_the_target(scoped_pair):
    """Guard against a vacuous pass: the perturbation must actually
    produce different stage values for the target station."""
    _, scoped, _ = scoped_pair
    df = scoped.read("ts_p").filter(
        (F.col("station_id") == TARGET) & F.col("filled_by").isNotNull()
    )
    assert df.count() > 0  # the planted hole was filled from donors
