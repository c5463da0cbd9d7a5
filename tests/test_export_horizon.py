"""S10/S11 export-path and S8 horizon tests."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from weatherdb_spark.operators.export import (
    create_ts,
    read_telemetry,
    split_date,
    write_telemetry,
    zip_exports,
)
from weatherdb_spark.operators.horizon import horizon_angles, station_horizon


@pytest.fixture()
def small_ts(spark):
    return spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 1.5),
            (1, "2024-01-01 00:20:00", 0.0),
            (2, "2024-01-01 00:10:00", 2.5),
        ],
        "station_id int, ts string, filled double",
    ).select("station_id", F.col("ts").cast("timestamp").alias("timestamp"), "filled")


def test_split_date_german_columns(small_ts):
    out = split_date(small_ts, granularity=5)
    assert out.columns == ["station_id", "Jahr", "Monat", "Tag", "Stunde", "Minute", "filled"]
    r = out.filter(F.col("station_id") == 1).orderBy("Minute").first()
    assert (r["Jahr"], r["Monat"], r["Tag"], r["Stunde"], r["Minute"]) == (2024, 1, 1, 0, 10)


def test_create_ts_zip_and_telemetry(spark, small_ts, tmp_path):
    out_dir = str(tmp_path / "export")
    tele = create_ts(small_ts, out_dir, sep="\t")
    assert tele["quantity"] == 2
    station_dirs = [d for d in os.listdir(out_dir) if d.startswith("station_id=")]
    assert sorted(station_dirs) == ["station_id=1", "station_id=2"]
    # header + tab separation
    s1 = [f for f in os.listdir(os.path.join(out_dir, "station_id=1")) if f.endswith(".csv")]
    content = open(os.path.join(out_dir, "station_id=1", s1[0])).read()
    assert content.splitlines()[0] == "Jahr\tMonat\tTag\tStunde\tMinute\tfilled"

    z = zip_exports(out_dir, str(tmp_path / "out.zip"))
    assert z["files"] == 2 and z["output_size"] > 0

    tdir = str(tmp_path / "telemetry")
    write_telemetry(spark, {**tele, **z}, tdir)
    got = read_telemetry(spark, tdir)
    assert got.count() == 1
    assert got.first()["quantity"] == 2


def test_horizon_flat_dem_is_zero():
    flat = lambda xs, ys: np.zeros_like(xs)  # noqa: E731
    assert station_horizon(0.0, 0.0, 100.0, flat, radius_m=5000, sample_step_m=250) == 0.0


def test_horizon_uniform_cone():
    # elevation rises 0.1 m/m away from the station in every direction:
    # every ray sees atan(0.1) = 5.71 deg, all band means equal, weights sum
    # to 1 -> horizon = 5.71
    cone = lambda xs, ys: 0.1 * np.sqrt(xs**2 + ys**2)  # noqa: E731
    h = station_horizon(0.0, 0.0, 0.0, cone, radius_m=5000, sample_step_m=250)
    assert abs(h - np.degrees(np.arctan(0.1))) < 1e-6


def test_horizon_west_wall_beats_north_wall():
    # azimuth 0 = east, CCW (utils/geometry.py:15-39): 180 = west. A ridge
    # west of the station fills both 0.35-weighted bands ([180,225],
    # [135,180)); the same ridge north of it mostly hits the 0.15 NW-N
    # band -> the west wall shadows more
    west = lambda xs, ys: np.where(xs < -1000, 200.0, 0.0)  # noqa: E731
    north = lambda xs, ys: np.where(ys > 1000, 200.0, 0.0)  # noqa: E731
    h_w = station_horizon(0.0, 0.0, 0.0, west, radius_m=5000, sample_step_m=100)
    h_n = station_horizon(0.0, 0.0, 0.0, north, radius_m=5000, sample_step_m=100)
    assert h_w > h_n > 0


def test_horizon_angles_dataframe(spark):
    meta = spark.createDataFrame(
        [(1, 0.0, 0.0, 100), (2, 50000.0, 0.0, 200)],
        "station_id int, x_utm double, y_utm double, stationshoehe int",
    )
    cone = lambda xs, ys: 0.05 * np.sqrt(xs**2 + ys**2)  # noqa: E731
    out = horizon_angles(meta, cone, radius_m=5000, sample_step_m=500)
    rows = {r["station_id"]: r["horizon"] for r in out.collect()}
    assert set(rows) == {1, 2}
    # station 1 sits at the cone tip with DEM elevation 0 at its point:
    # horizon = atan(0.05) = 2.862 deg
    assert abs(rows[1] - 2.862) < 0.01
    # station 2 on the flank: uphill east..north rays are outside the
    # 90-270 azimuth fan except the north band -> smaller but positive
    assert 0 <= rows[2] < rows[1]
