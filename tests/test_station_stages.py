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


META_TXT_HIST = (
    "Stations_id von_datum bis_datum Stationshoehe geoBreite geoLaenge Stationsname Bundesland\n"
    "----------- --------- --------- ------------- --------- --------- ----------- ----------\n"
    "00044 19900101 20191231            44     52.9336    8.2370 Großenkneten  Niedersachsen\n"
)
META_TXT_NOW = (
    "Stations_id von_datum bis_datum Stationshoehe geoBreite geoLaenge Stationsname Bundesland\n"
    "----------- --------- --------- ------------- --------- --------- ----------- ----------\n"
    "00044 20200101 20240101            44     52.9336    8.2370 Großenkneten  Niedersachsen\n"
    "00071 20091201 20191231           759     48.2156    8.9784 Albstadt-Badkap  Baden-Württemberg\n"
)
PRODUKT_P44 = (
    "STATIONS_ID;MESS_DATUM;QN;RWS_DAU_10;RWS_10;RWS_IND_10;eor\n"
    "  44;202401010000;3;10;0.10;1;eor\n"
    "  44;202401010010;3;10;0.20;1;eor\n"
    "  71;202401010000;3;10;0.50;1;eor\n"
)


def test_stations_offline_update_family(spark, tmp_path):
    """Collection-level download_meta/update_meta/update_raw/
    update_ma_raster/update — the offline tails of the reference's
    StationsBase.py:59-1000 CDC loops."""
    from weatherdb_spark.station import Stations

    hist = tmp_path / "hist_Beschreibung_Stationen.txt"
    hist.write_text(META_TXT_HIST, encoding="WINDOWS-1252")
    now = tmp_path / "now_Beschreibung_Stationen.txt"
    now.write_text(META_TXT_NOW, encoding="WINDOWS-1252")
    p_dir = tmp_path / "p_files"
    p_dir.mkdir()
    (p_dir / "produkt_zehn_min_rr_00044.txt").write_text(PRODUKT_P44)

    b = Broker(spark, str(tmp_path / "wh"))
    sts = Stations(b, "p")

    # multi-file join: new station added, von/bis widened to the union
    joined = sts.download_meta([str(hist), str(now)])
    assert joined.count() == 2
    r44 = joined.filter(F.col("stations_id") == "00044").first()
    assert str(r44["von_datum"])[:4] == "1990"   # hist start kept
    assert str(r44["bis_datum"])[:4] == "2024"   # widened by the now file

    sts.update_meta(meta_files=[str(hist), str(now)])
    meta = b.read("meta")
    assert meta.count() == 2
    assert meta.filter(F.col("station_id") == 71).first()["x_utm"] is not None

    # scoped raw import: only station 44's rows land; watermark advances
    sts.update_raw(stids=[44], raw_dir=str(p_dir))
    ts = b.read("ts_p")
    assert ts.filter(F.col("station_id") == 71).count() == 0
    assert ts.filter(F.col("station_id") == 44).count() == 2

    # ma raster: full sample, then a scoped resample leaves 71 untouched
    raster = spark.createDataFrame(
        [(c, r, "year", 100.0 + c) for c in range(2) for r in range(2)],
        "col int, row int, term string, value double",
    )
    meta_xy = [(44, 50.0, 50.0), (71, 150.0, 50.0)]
    b.update_meta(spark.createDataFrame(
        [(s, "p", True, x, y, 100) for s, x, y in meta_xy],
        "station_id int, parameter string, is_real boolean, "
        "x_utm double, y_utm double, stationshoehe int",
    ))
    sts.update_ma_raster(raster=raster, x0=0.0, y0=200.0, res=100.0)
    vals = {r["station_id"]: r["value"]
            for r in b.read("station_ma_raster").collect()}
    assert vals == {44: 100.0, 71: 101.0}
    shifted = raster.withColumn("value", F.col("value") + 9)
    sts.update_ma_raster(stids=[44], raster=shifted,
                         x0=0.0, y0=200.0, res=100.0)
    vals = {r["station_id"]: r["value"]
            for r in b.read("station_ma_raster").collect()}
    assert vals == {44: 109.0, 71: 101.0}  # 71 kept, 44 resampled
    # a scoped resample that finds NO data for the station (point beyond
    # the raster + buffer) must keep its stored values, not erase them
    far_raster = spark.createDataFrame(
        [(c, r, "year", 7.0) for c in range(2) for r in range(2)],
        "col int, row int, term string, value double",
    )
    sts.update_ma_raster(stids=[44], raster=far_raster,
                         x0=90000.0, y0=200.0, res=100.0)
    vals = {r["station_id"]: r["value"]
            for r in b.read("station_ma_raster").collect()}
    assert vals == {44: 109.0, 71: 101.0}  # unchanged, nothing deleted

    # the umbrella update: raw merge + incremental qc/fillup consume the
    # pending window (P's QC compares against the daily table and the
    # fillup regionalizes over seasonal MA values -> seed both dims)
    b.update_ma_raster(spark.createDataFrame(
        [(s, "p", t, 800.0) for s in (44, 71)
         for t in ("year", "wihy", "suhy")],
        "station_id int, parameter string, term string, value double",
    ))
    b.update_raw("p_d", spark.createDataFrame(
        [(44, dt.datetime(2024, 1, 1), 0.3), (71, dt.datetime(2024, 1, 1), 0.5)],
        "station_id int, timestamp timestamp, raw double",
    ))
    sts.update(only_new=True, raw_dir=str(p_dir))
    marks = {(r["parameter"], r["stage"]) for r in b.state().collect()}
    assert ("p", "qc") in marks and ("p", "filled") in marks

    # P-only warehouse (no ts_t): the incremental Richter correction is
    # a contract no-op, so StationsP.update must not crash mid-umbrella
    from weatherdb_spark.station import StationsP

    psts = StationsP(b)
    psts.last_imp_corr()  # pending window exists; ts_t does not
    assert not b.exists("ts_t")
    # update_richter_class without a stored horizon or DEM must fail
    # loudly (the per-station wrapper's contract), never silently no-op
    with pytest.raises(ValueError, match="horizon"):
        psts.update_richter_class()

    # the per-station wrappers delegate to the collection twins with a
    # one-station scope: importing for station 71 leaves 44's rows alone
    st71 = Station(b, 71, "p")
    st71.update_raw(raw_dir=str(p_dir))
    ts = b.read("ts_p")
    assert ts.filter(F.col("station_id") == 71).count() == 1
    assert ts.filter((F.col("station_id") == 44)
                     & F.col("raw").isNotNull()).count() == 2


def test_stations_richter_class_skip_if_exist_scopes_dem_scan(stage_broker):
    """skip_if_exist=True narrows the DEM recompute to stations without a
    class (StationP.py:451-463's guard at collection level); False
    recomputes everyone in scope."""
    from weatherdb_spark.station import StationsP

    b = stage_broker
    sp = StationsP(b)
    calls = []
    orig = type(b).update_horizon

    def spy(self, dem_sampler, parameter="p", stids=None, **kw):
        calls.append(stids)
        return orig(self, dem_sampler, parameter, stids=stids, **kw)

    type(b).update_horizon = spy
    try:
        def flat_dem(xs, ys):
            import numpy as np

            return np.zeros(len(xs))

        # no classes stored yet: the skip path still visits everyone
        # (scope None = all when the class column doesn't exist yet)
        sp.update_richter_class(dem_sampler=flat_dem, radius_m=200.0,
                                sample_step_m=100.0)
        assert calls[-1] is None or len(calls[-1]) > 0
        # now every station has a class: skip_if_exist short-circuits
        sp.update_richter_class(dem_sampler=flat_dem, radius_m=200.0,
                                sample_step_m=100.0)
        assert len(calls) == 1  # no second update_horizon call
        # force: full scope again
        sp.update_richter_class(dem_sampler=flat_dem, skip_if_exist=False,
                                radius_m=200.0, sample_step_m=100.0)
        assert len(calls) == 2 and calls[-1] is None
    finally:
        type(b).update_horizon = orig
