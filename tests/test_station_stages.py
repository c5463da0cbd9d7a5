"""Per-station stage wrappers on the Station facade — the reference runs
QC/fillup/last-imp maintenance station-by-station
(StationBases.py:779-809, 1289-1345, 1720-1766); the engine delegates to
the broker's scoped stages (stids + parameters narrowing)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker
from weatherdb_spark.station import Station


@pytest.fixture(scope="module")
def stage_broker(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("station_stage_wh"))
    b = Broker(spark, wh)
    meta = spark.createDataFrame(
        [
            (s, para, True, 10000.0 * i, 0.0, 100 + 50 * i)
            for i, s in enumerate((1, 2, 3))
            for para in ("t", "et")
        ],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    )
    b.update_meta(meta)
    b.update_ma_raster(spark.createDataFrame(
        [
            (s, para, "year", 9.0 + s if para == "t" else 550.0 + s)
            for s in (1, 2, 3)
            for para in ("t", "et")
        ],
        "station_id int, parameter string, term string, value double",
    ))
    rows_t, rows_et = [], []
    for s in (1, 2, 3):
        for d in range(60):
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(days=d)
            val = None if (s == 1 and d % 9 == 4) else round(d * 0.3 + s, 1)
            rows_t.append((
                s, ts, val,
                None if val is None else val - 2.0,
                None if val is None else val + 2.0,
            ))
            rows_et.append(
                (s, ts, None if (s == 1 and d % 7 == 2) else round(d * 0.2 + s, 1))
            )
    b.update_raw("t", spark.createDataFrame(
        rows_t,
        "station_id int, timestamp timestamp, raw double, raw_min double, "
        "raw_max double",
    ))
    b.update_raw("et", spark.createDataFrame(
        rows_et, "station_id int, timestamp timestamp, raw double"
    ))
    return b


def test_station_stage_wrappers_scope_parameter(stage_broker):
    st = Station(stage_broker, 1, "t")
    # a full load records no pending import window — nothing is owed
    assert st.is_last_imp_done("qc")
    # an incremental append opens one for each parameter
    spark = stage_broker.spark
    stage_broker.append_raw("t", spark.createDataFrame(
        [
            (s, dt.datetime(2024, 3, 1) + dt.timedelta(days=d),
             5.0 + s, 3.0 + s, 7.0 + s)
            for s in (1, 2, 3) for d in range(5)
        ],
        "station_id int, timestamp timestamp, raw double, raw_min double, "
        "raw_max double",
    ))
    stage_broker.append_raw("et", spark.createDataFrame(
        [
            (s, dt.datetime(2024, 3, 1) + dt.timedelta(days=d), 1.0 + s)
            for s in (1, 2, 3) for d in range(5)
        ],
        "station_id int, timestamp timestamp, raw double",
    ))
    assert not st.is_last_imp_done("qc")
    st.quality_check()
    marks = {
        (r["parameter"], r["stage"]) for r in stage_broker.state().collect()
    }
    assert ("t", "qc") in marks
    # parameter scoping: the et block must NOT have run
    assert ("et", "qc") not in marks
    assert st.is_last_imp_done("qc")
    assert not Station(stage_broker, 1, "et").is_last_imp_done("qc")

    assert not st.is_last_imp_done("filled")
    st.fillup()
    assert st.is_last_imp_done("filled")
    marks = {
        (r["parameter"], r["stage"]) for r in stage_broker.state().collect()
    }
    assert ("t", "filled") in marks and ("et", "filled") not in marks
    filled = st.get_filled()
    assert filled.filter(F.col("filled").isNull()).count() == 0

    # last_imp_* wrappers are no-ops once the stage consumed the window
    st.last_imp_quality_check()
    st.last_imp_qc()
    st.last_imp_fillup()

    with pytest.raises(AttributeError, match="richter_correct"):
        st.richter_correct()


def test_station_meta_maintenance(stage_broker):
    st = Station(stage_broker, 1, "t")
    st.update_period_meta("filled")
    row = (
        stage_broker.read("meta")
        .filter((F.col("station_id") == 1) & (F.col("parameter") == "t"))
        .first()
    )
    assert row["raw_from"] == dt.datetime(2024, 1, 1)
    # the append in the previous test extended the series to March 5
    assert row["filled_until"] == dt.datetime(2024, 3, 5)

    with pytest.raises(ValueError, match="bogus"):
        st.update_ma_timeseries("bogus")
    with pytest.raises(ValueError, match="filled_by"):
        st.update_ma_timeseries(["raw", "filled_by"])
    st.update_ma_timeseries("raw")
    ma = (
        stage_broker.read("station_ma_timeserie")
        .filter(
            (F.col("station_id") == 1)
            & (F.col("parameter") == "t")
            & (F.col("kind") == "raw")
        )
        .collect()
    )
    assert len(ma) == 1

    assert st.get_multi_annual_raster() == st.get_ma_raster()
    assert not st.isin_meta_p()  # no 10-min precipitation in this warehouse
    with pytest.warns(PendingDeprecationWarning):
        assert st.get_geom_shp().startswith("POINT (")


def test_stations_collection_dispatch(stage_broker):
    from weatherdb_spark.station import Stations

    ets = Stations(stage_broker, "et")
    # the et window opened in the first test is still pending
    assert not Station(stage_broker, 1, "et").is_last_imp_done("qc")
    ets.quality_check()
    ets.fillup()
    marks = {
        (r["parameter"], r["stage"]) for r in stage_broker.state().collect()
    }
    assert ("et", "qc") in marks and ("et", "filled") in marks
    assert Station(stage_broker, 1, "et").is_last_imp_done("qc")
    ets.update_period_meta()
    ets.update_ma_timeseries("raw")
    assert (
        stage_broker.read("station_ma_timeserie")
        .filter((F.col("parameter") == "et") & (F.col("kind") == "raw"))
        .count()
        == 3
    )
    # incremental dispatchers are consumed-window no-ops at this point
    ets.last_imp_quality_check()
    ets.last_imp_fillup()


def test_broker_paras_alias_and_richter_name(stage_broker):
    before = {
        (r["parameter"], r["stage"], r["updated_at"])
        for r in stage_broker.state().collect()
    }
    # reference spelling: paras= scopes exactly like parameters=
    stage_broker.quality_check(paras=[])
    stage_broker.fillup(paras=[])
    stage_broker.last_imp_quality_check(paras=[])
    stage_broker.last_imp_fillup(paras=[])
    after = {
        (r["parameter"], r["stage"], r["updated_at"])
        for r in stage_broker.state().collect()
    }
    assert before == after  # an empty scope runs no stage blocks
    # reference Broker method name; no-op without 10-min precipitation
    stage_broker.richter_correct()
    # a bare-string scope is one parameter, not a substring match
    assert Broker._param_wanted("et", "et")
    assert not Broker._param_wanted("t", "et")
    assert not Broker._param_wanted("p", "p_d")
    # a valid-but-unbuilt kind fails loudly, not as a NoneType write
    with pytest.raises(ValueError, match="none of the requested kinds"):
        stage_broker.update_ma_timeserie("t", kinds=("corr",))


def test_richter_class_wrappers_and_meta_patch(spark, tmp_path):
    import numpy as np

    # lambda, not a module-level function: executors can't import the
    # test module, but cloudpickle ships a lambda by value
    flat_dem = lambda xs, ys: np.full(len(xs), 120.0)  # noqa: E731
    b = Broker(spark, str(tmp_path / "wh"))
    b.update_meta(spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100, 8.2),
         (2, "p", True, 50000.0, 0.0, 200, None)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int, horizon double",
    ))
    st = Station(b, 1, "p")
    # update_meta already derived the class from the stored horizon
    assert st.get_richter_class() == "protected"  # 8.2 in [7, 12)
    assert st.update_richter_class() == "protected"  # skip_if_exist
    # forced refresh re-derives from the stored horizon without a DEM
    # (exercises the update_meta_fields dim patch)
    assert st.update_richter_class(skip_if_exist=False) == "protected"
    st2 = Station(b, 2, "p")
    with pytest.raises(ValueError, match="no stored horizon"):
        st2.update_richter_class()
    # the DEM path, scoped to station 2: flat terrain -> horizon 0
    assert st2.update_horizon(
        flat_dem, radius_m=2000.0, sample_step_m=500.0
    ) == 0.0
    assert st2.get_richter_class() == "no-protection"
    # station 1's stored values survived the scoped recompute
    assert st.get_horizon() == 8.2
    assert st.get_richter_class() == "protected"
    # P-only gates
    for method in ("corr", "last_imp_richter_correct", "update_richter_class"):
        with pytest.raises(AttributeError):
            getattr(Station(b, 1, "t"), method)()


def test_get_zipfiles_offline_listing(stage_broker):
    listing = [
        ("path/10minutenwerte_nieder_00001_now.zip", dt.datetime(2024, 1, 1)),
        ("path/tageswerte_KL_00001_akt.zip", dt.datetime(2024, 1, 2)),
        ("path/tageswerte_KL_00002_akt.zip", dt.datetime(2024, 1, 2)),
    ]
    st = Station(stage_broker, 1, "t")
    got = st.get_zipfiles(listing, only_new=False)
    assert got.count() == 2  # both _00001_ files, never station 2's
    assert got.filter(F.col("filepath").contains("00002")).count() == 0
    # with no raw_files manifest, only_new keeps everything
    if not stage_broker.exists("raw_files"):
        assert st.get_zipfiles(listing).count() == 2
