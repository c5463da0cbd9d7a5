"""Period memo cache (reference _check_period cache,
StationBases.py:313-356): repeated period lookups within the TTL reuse
the memoized result (no Spark job), a table write invalidates
immediately (entries pin the snapshot version), and
Stations.get_max_periods computes every station in one grouped job and
seeds the cache."""

from __future__ import annotations

import datetime as dt
import shutil

from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker
from weatherdb_spark.period import TimestampPeriod
from weatherdb_spark.station import Station, Stations


def _fact(spark, n_days: int, stations=(1, 2, 3)):
    rows = []
    for s in stations:
        for i in range(n_days):
            rows.append((s, dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
                         float(i), float(i) if i % 3 else None))
    return spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double, qc double"
    )


def test_second_lookup_runs_no_spark_job(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 10), bucket_by_station=True)
    st = Station(b, 1, "p")
    p1 = st.get_max_period(kinds=["raw"])
    assert p1 == TimestampPeriod(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 10))
    # remove the data files but keep the manifest: a re-computation would
    # have to scan and fail — a cache hit touches no files
    shutil.rmtree(b.data_path("ts_p"))
    assert st.get_max_period(kinds=["raw"]) == p1


def test_write_invalidates_immediately(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 10), bucket_by_station=True)
    st = Station(b, 1, "p")
    assert st.get_max_period(kinds=["raw"]).end == dt.datetime(2024, 1, 10)
    b.write("ts_p", _fact(spark, 20), bucket_by_station=True)
    # no TTL wait: the snapshot version changed, the entry is dead
    assert st.get_max_period(kinds=["raw"]).end == dt.datetime(2024, 1, 20)


def test_get_period_meta_cached(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 10), bucket_by_station=True)
    st = Station(b, 1, "p")
    p1 = st.get_period_meta(kind="qc")  # qc is NULL every 3rd day
    assert p1.start == dt.datetime(2024, 1, 2)
    shutil.rmtree(b.data_path("ts_p"))
    assert st.get_period_meta(kind="qc") == p1


def test_batch_get_max_periods_seeds_cache(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 10), bucket_by_station=True)
    periods = Stations(b, "p").get_max_periods(kinds=["raw"])
    assert set(periods) == {1, 2, 3}
    assert periods[2] == TimestampPeriod(
        dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 10)
    )
    # per-station lookups now hit the seeded cache — no table scan
    shutil.rmtree(b.data_path("ts_p"))
    for s in (1, 2, 3):
        assert Station(b, s, "p").get_max_period(kinds=["raw"]) == periods[s]
