"""Incremental update path: append_raw merge + last_imp window +
window-bounded QC recompute (reference last_imp_* semantics,
broker.py:412-442, StationBases.py:969-1018)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker

START = dt.datetime(2024, 1, 1)


def _p_rows(day0: int, n_days: int, stations=(1, 2)):
    rows = []
    for s in stations:
        for i in range(day0 * 144, (day0 + n_days) * 144):
            ts = START + dt.timedelta(minutes=10 * i)
            rows.append((s, ts, round((i % 4) * 0.1, 1), 1))
    return rows


@pytest.fixture()
def inc_broker(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    b.update_meta(spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100), (2, "p", True, 5000.0, 0.0, 200)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    ))
    b.update_ma_raster(spark.createDataFrame(
        [(s, "p", t, 800.0) for s in (1, 2) for t in ("year", "wihy", "suhy")],
        "station_id int, parameter string, term string, value double",
    ))
    ts_p = spark.createDataFrame(
        _p_rows(0, 3), "station_id int, timestamp timestamp, raw double, qn short"
    )
    b.update_raw("p", ts_p)
    daily = spark.createDataFrame(
        [(s, START + dt.timedelta(days=d), 20.0) for s in (1, 2) for d in range(6)],
        "station_id int, timestamp timestamp, raw double",
    )
    b.update_raw("p_d", daily)
    return b


def test_append_raw_merges_and_tracks_window(spark, inc_broker):
    b = inc_broker
    assert b.read("ts_p").count() == 2 * 3 * 144

    # day 3-4 arrive later, plus a revision of one existing row
    new = spark.createDataFrame(
        _p_rows(3, 2), "station_id int, timestamp timestamp, raw double, qn short"
    ).unionByName(spark.createDataFrame(
        [(1, START + dt.timedelta(minutes=10), 9.9, 1)],
        "station_id int, timestamp timestamp, raw double, qn short",
    ))
    b.append_raw("p", new)

    got = b.read("ts_p")
    assert got.count() == 2 * 5 * 144
    # the revision landed
    revised = got.filter(
        (F.col("station_id") == 1)
        & (F.col("timestamp") == START + dt.timedelta(minutes=10))
    ).first()
    assert revised["raw"] == 9.9
    # untouched row kept
    kept = got.filter(
        (F.col("station_id") == 2)
        & (F.col("timestamp") == START + dt.timedelta(minutes=20))
    ).first()
    assert kept["raw"] == 0.2
    # window recorded
    lo, hi = b.last_imp("p")
    assert lo.startswith("2024-01-01") and hi.startswith("2024-01-05")


def test_last_imp_quality_check_bounded(spark, inc_broker):
    b = inc_broker
    # full QC first, then a new import carrying a planted artifact
    b.quality_check()
    before = b.read("ts_p").filter(F.col("qc").isNotNull()).count()

    rows = _p_rows(3, 1)
    # plant an out-of-bounds value (raw >= 50 nulls in qc)
    rows[7] = (rows[7][0], rows[7][1], 99.0, 1)
    new = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double, qn short"
    )
    b.append_raw("p", new)
    b.last_imp_quality_check(margin="1 day")

    got = b.read("ts_p")
    bad = got.filter(F.col("raw") == 99.0).first()
    assert bad["qc"] is None
    # new window rows got qc values
    new_qc = got.filter(
        (F.col("timestamp") >= START + dt.timedelta(days=3)) & F.col("qc").isNotNull()
    ).count()
    assert new_qc > 0
    # pre-existing qc untouched outside the widened window
    old_qc = got.filter(
        (F.col("timestamp") < START + dt.timedelta(days=2)) & F.col("qc").isNotNull()
    ).count()
    assert old_qc > 0
    assert got.filter(F.col("qc").isNotNull()).count() >= before
