"""Station/Stations facade, TimestampPeriod algebra, and plan-quality
(pushdown) checks."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker
from weatherdb_spark.period import TimestampPeriod
from weatherdb_spark.station import GroupStation, Station, Stations


# ----------------------------------------------------------- TimestampPeriod

def test_period_union_outer_inner():
    a = TimestampPeriod("2020-01-01", "2020-06-01")
    b = TimestampPeriod("2020-03-01", "2020-12-01")
    assert a.union(b, "outer") == TimestampPeriod("2020-01-01", "2020-12-01")
    assert a.union(b, "inner") == TimestampPeriod("2020-03-01", "2020-06-01")
    # disjoint inner -> empty
    c = TimestampPeriod("2021-01-01", "2021-02-01")
    assert a.union(c, "inner").is_empty()
    # NaT bounds are skipped in the comparison (reference
    # TimestampPeriod.py:108-114), not treated as unbounded
    d = TimestampPeriod(None, "2020-06-01")
    assert a.union(d, "outer") == a
    assert a.union(d, "inner") == a


def test_period_inside_contains_expand():
    a = TimestampPeriod("2020-02-01", "2020-03-01")
    b = TimestampPeriod("2020-01-01", "2020-12-01")
    assert a.inside(b) and b.contains(a) and not b.inside(a)
    e = TimestampPeriod("2020-01-01", "2020-01-31").expand_to_timestamp()
    assert e.end == dt.datetime(2020, 1, 31, 23, 59, 59, 999999)


# ------------------------------------------------------------------- facade

@pytest.fixture(scope="module")
def mini_broker(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("facade_wh"))
    b = Broker(spark, wh)
    meta = spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100), (2, "p", True, 10000.0, 0.0, 300),
         (3, "p", True, 20000.0, 0.0, 500)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    )
    b.update_meta(meta)
    b.update_ma_raster(spark.createDataFrame(
        [(s, "p", t, 800.0 + s) for s in (1, 2, 3) for t in ("year", "wihy", "suhy")],
        "station_id int, parameter string, term string, value double",
    ))
    rows = []
    for s in (1, 2, 3):
        for i in range(400):
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=10 * i)
            raw = None if (s == 1 and i % 7 == 3) else round((i % 5) * 0.1, 1)
            rows.append((s, ts, raw, raw))
    ts_p = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double, qc double"
    )
    filled = ts_p.withColumn("filled", F.coalesce("qc", F.lit(0.15))).withColumn(
        "filled_by",
        F.when(F.col("qc").isNull(), F.lit(2)).cast("short"),
    ).withColumn("corr", F.col("filled") * 1.1)
    b.write("ts_p", filled, bucket_by_station=True)
    return b


def test_station_get_df_and_wrappers(mini_broker):
    st = Station(mini_broker, 1, "p")
    raw = st.get_raw()
    assert raw.columns == ["station_id", "timestamp", "raw"]
    assert raw.count() == 400
    best = st.get_df()  # best kind for p = corr
    assert "corr" in best.columns
    agg = st.get_df(kinds=("filled",), agg_to="hour")
    assert agg.count() == 400 // 6 + (1 if 400 % 6 else 0)


def test_station_period_and_holes(mini_broker):
    st = Station(mini_broker, 1, "p")
    per = st.get_period_meta("raw")
    assert per.start == dt.datetime(2024, 1, 1)
    assert not per.has_NaT()
    holes = st.count_holes(gap_thresholds=("1 hour",), kind="raw").first()
    assert holes["holes_ge_1_hour"] == 0  # gaps are 20 min at most


def test_station_get_adj_and_dist(mini_broker):
    st = Station(mini_broker, 2, "p")
    adj = st.get_adj(kind="filled", min_count=10)
    assert "adj" in adj.columns
    assert adj.filter(F.col("adj").isNull()).count() == 0
    dist = Station(mini_broker, 1, "p").get_dist()
    donors = dist.filter(F.col("filled_by").isNotNull())
    assert donors.count() > 0
    assert donors.filter(F.col("dist_m").isNull()).count() == 0
    assert donors.first()["dist_m"] == 10000.0  # station 2 is 10 km away


def test_stations_pivot(mini_broker):
    wide = Stations(mini_broker, "p").get_df(stids=[1, 2, 3], kind="raw")
    assert set(wide.columns) == {"timestamp", "1", "2", "3"}
    assert wide.count() == 400


def test_group_station_export(mini_broker, tmp_path):
    import os

    tele = GroupStation(mini_broker, 1).create_ts(
        str(tmp_path / "exp"), parameters=("p",), kind="raw"
    )
    assert tele["p"]["files"] == 1
    path = tmp_path / "exp" / "1" / "P_00001.txt"
    assert os.path.isfile(path)
    lines = path.read_text().splitlines()
    # reference header: Name/Lat lines, then the column header row
    assert lines[0].startswith("Name: ")
    assert lines[1].startswith("Lat: ")
    assert lines[2].split("\t")[:2] == ["Jahr", "Monat"]


def test_group_stations_validate_and_joint_period(mini_broker, tmp_path):
    import os

    from weatherdb_spark.station import GroupStations

    gs = GroupStations(mini_broker)
    with pytest.raises(ValueError):
        gs.get_valid_stids([1, 99])
    per = gs.joint_period([1, 2, 3], kind="raw")
    assert per.start == dt.datetime(2024, 1, 1)
    tele = gs.create_ts([1, 2], str(tmp_path / "grp"), parameters=("p",), kind="raw")
    assert set(tele) == {"p"}
    assert tele["p"]["files"] == 2
    for stid in (1, 2):
        assert os.path.isfile(tmp_path / "grp" / str(stid) / f"P_{stid:05}.txt")


def test_get_quotient(mini_broker, spark):
    from weatherdb_spark.station import get_quotient

    mini_broker.update_ma_timeserie("p", kinds=("raw", "filled"), coverage=0.0)
    q = get_quotient(mini_broker, parameters=("p",), kinds=("filled",), which="raster")
    assert q.count() == 3
    assert q.filter(F.col("quotient").isNull()).count() == 0


# -------------------------------------------------------------- plan quality

def test_cli_stages_and_export(mini_broker, tmp_path):
    from weatherdb_spark.cli import main

    wh = mini_broker.dir
    assert main(["update-ma-timeserie", "--warehouse", wh, "-p", "p"]) == 0
    assert mini_broker.read("station_ma_timeserie").count() > 0
    out = str(tmp_path / "cli_exp")
    assert main([
        "create-ts", "--warehouse", wh, "--stations", "1", "2",
        "--out-dir", out, "--parameters", "p", "--kind", "raw",
    ]) == 0
    import os
    assert os.path.isfile(os.path.join(out, "1", "P_00001.txt"))


def test_exploded_shingles_no_expensive_prescan_filter(spark):
    """Regression: plain explode() makes Catalyst infer a size()>0 filter
    and push the whole shingle expression below the exchange, serializing
    it onto the pre-shuffle task. The explode_outer form must keep the
    transform() out of any Filter below the Exchange."""
    from weatherdb_spark.llm.dedup import exploded_shingles

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y")], "doc_id long, text string"
    ).coalesce(1)  # emulate the single-split small-file scan
    plan = (
        exploded_shingles(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # everything printed after the Exchange node is the pre-shuffle side
    # (tree prints top-down toward the scan): the shingle transform()
    # expression must not occur there
    assert "Exchange" in plan, plan
    below_exchange = plan.split("Exchange", 1)[1]
    assert "transform(" not in below_exchange, plan


def test_get_df_pushdown(mini_broker):
    """Filters and projection must reach the parquet scan: station filter
    as PushedFilters, kind projection as a narrow ReadSchema."""
    st = Station(mini_broker, 2, "p")
    plan = st.get_raw(period=("2024-01-01", "2024-01-02"))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "station_id" in plan.split("PushedFilters")[1][:200]
    # only the needed columns are read
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "raw" in read_schema and "corr" not in read_schema