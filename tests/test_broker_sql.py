"""Raw-SQL surface over the warehouse: ``Broker.register_views`` /
``Broker.sql`` and the ``sql`` CLI command — the engine twin of the
reference's direct database access (``db_engine``,
db/connections.py:374, where users run ad-hoc SELECTs with psql or
SQLAlchemy against every table and the db/views.py views)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker


@pytest.fixture()
def wh(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    meta = spark.createDataFrame(
        [(1, "p", True, 10), (2, "p", True, 20), (3, "t", True, 30)],
        "station_id int, parameter string, is_real boolean, stationshoehe int",
    )
    b.write("meta", meta)
    ts = spark.createDataFrame(
        [
            (1, dt.datetime(2020, 1, 1, 0, 0), 1.0),
            (1, dt.datetime(2020, 1, 1, 0, 10), 2.0),
            (2, dt.datetime(2020, 1, 1, 0, 0), 4.0),
        ],
        "station_id int, timestamp timestamp, raw double",
    )
    b.write("ts_p", ts, bucket_by_station=True)
    return b


def test_register_views_lists_all_tables(wh):
    names = wh.register_views()
    assert names == ["meta", "ts_p"]
    # quotient views need their MA input tables; absent here
    assert "ma_quotient_raster" not in names


def test_sql_join_matches_dataframe_result(wh):
    got = wh.sql(
        """
        SELECT m.station_id, sum(t.raw) AS sum_raw
        FROM meta m JOIN ts_p t USING (station_id)
        WHERE m.parameter = 'p'
        GROUP BY m.station_id ORDER BY m.station_id
        """
    ).collect()
    assert [(r.station_id, r.sum_raw) for r in got] == [(1, 3.0), (2, 4.0)]


def test_sql_sees_new_snapshot_after_write(wh):
    assert wh.sql("SELECT count(*) AS n FROM ts_p").first().n == 3
    more = wh.spark.createDataFrame(
        [(3, dt.datetime(2020, 1, 2, 0, 0), 9.0)],
        "station_id int, timestamp timestamp, raw double",
    )
    wh.write(
        "ts_p",
        wh.read("ts_p").drop("station_bucket").unionByName(more),
        bucket_by_station=True,
    )
    # the manifest flipped; sql() re-registers and reads the new snapshot
    assert wh.sql("SELECT count(*) AS n FROM ts_p").first().n == 4


def test_sql_partition_columns_are_hidden(wh):
    cols = wh.sql("SELECT * FROM ts_p").columns
    # ts_year/station_bucket are physical layout, not user schema
    assert "ts_year" not in cols and "station_bucket" not in cols
    assert cols[:2] == ["station_id", "timestamp"]


def test_sql_scan_prunes_columns_and_pushes_filters(wh):
    plan = (
        wh.sql("SELECT raw FROM ts_p WHERE station_id = 1")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(station_id), EqualTo(station_id,1)]" in plan


def test_quotient_views_register_when_ma_tables_exist(wh):
    ma_ts = wh.spark.createDataFrame(
        [(1, "p", "raw", 800.0), (1, "p", "filled", 820.0)],
        "station_id int, parameter string, kind string, value double",
    )
    ma_raster = wh.spark.createDataFrame(
        [(1, "p", "year", 790.0)],
        "station_id int, parameter string, term string, value double",
    )
    wh.write("station_ma_timeserie", ma_ts)
    wh.write("station_ma_raster", ma_raster)
    names = wh.register_views()
    assert {"ma_quotient_kinds", "ma_quotient_raster"} <= set(names)
    q = wh.sql(
        "SELECT quotient FROM ma_quotient_raster "
        "WHERE station_id = 1 AND kind = 'raw'"
    ).first()
    assert q.quotient == pytest.approx(round(800.0 / 790.0, 4))


def test_cli_sql_csv_streams_rows(wh, capsys):
    from weatherdb_spark.cli import main

    assert main([
        "sql", "--warehouse", wh.dir, "--csv",
        "SELECT station_id, sum(raw) AS sum_raw FROM ts_p "
        "GROUP BY station_id ORDER BY station_id",
    ]) in (0, None)
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "station_id,sum_raw"
    assert out[1:] == ["1,3.0", "2,4.0"]
