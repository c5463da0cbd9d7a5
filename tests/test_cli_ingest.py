"""Offline update-meta / update-raw CLI commands (reference
cli.py:167-193, minus the FTP download — the SURVEY §7.4 non-goal):
ingest a directory of DWD-format zips and a station-list text file into
a fresh warehouse, completing CLI parity the way ingest-ma-rasters did
for S12."""

from __future__ import annotations

import zipfile

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker
from weatherdb_spark.cli import main

PRODUKT_P_HIST = (
    "STATIONS_ID;MESS_DATUM;QN;RWS_DAU_10;RWS_10;RWS_IND_10;eor\n"
    "  44;202401010000;3;10;0.10;1;eor\n"
    "  44;202401010010;3;10;-999;1;eor\n"
    "  44;202401010020;3;10;0.30;1;eor\n"
    "  44;202401010030;3;10;-0.10;1;eor\n"
)
PRODUKT_P_RECENT = (
    "STATIONS_ID;MESS_DATUM;QN;RWS_DAU_10;RWS_10;RWS_IND_10;eor\n"
    "  44;202401010020;1;10;9.90;1;eor\n"
    "  44;202401010040;1;10;0.40;1;eor\n"
)
PRODUKT_T = (
    "STATIONS_ID;MESS_DATUM;QN_4;TMK;TNK;TXK;eor\n"
    "  44;20240101;3;1.5;-2.0;5.0;eor\n"
    "  44;20240102;3;-999;-999;-999;eor\n"
    "  71;20240101;3;-4.0;-8.0;0.5;eor\n"
)
META_TXT = (
    "Stations_id von_datum bis_datum Stationshoehe geoBreite geoLaenge Stationsname Bundesland\n"
    "----------- --------- --------- ------------- --------- --------- ----------- ----------\n"
    "00044 19690101 20240101            44     52.9336    8.2370 Großenkneten  Niedersachsen\n"
    "00071 20091201 20191231           759     48.2156    8.9784 Albstadt-Badkap  Baden-Württemberg\n"
)


@pytest.fixture()
def dwd_dirs(tmp_path):
    p_dir = tmp_path / "p_zips"
    p_dir.mkdir()
    with zipfile.ZipFile(p_dir / "10minutenwerte_nieder_00044_hist.zip", "w") as zf:
        zf.writestr("produkt_zehn_min_rr_00044.txt", PRODUKT_P_HIST)
        zf.writestr("Metadaten_Parameter_00044.txt", "ignored")
    with zipfile.ZipFile(p_dir / "10minutenwerte_nieder_00044_now.zip", "w") as zf:
        zf.writestr("produkt_zehn_min_rr_00044.txt", PRODUKT_P_RECENT)
    t_dir = tmp_path / "t_files"
    t_dir.mkdir()
    (t_dir / "produkt_klima_tag_00044.txt").write_text(PRODUKT_T)
    meta_file = tmp_path / "zehn_min_rr_Beschreibung_Stationen.txt"
    meta_file.write_text(META_TXT, encoding="WINDOWS-1252")
    return str(p_dir), str(t_dir), str(meta_file)


def test_cli_update_meta_and_raw(spark, tmp_path, dwd_dirs):
    p_dir, t_dir, meta_file = dwd_dirs
    wh = str(tmp_path / "wh")

    assert main(["update-meta", "--warehouse", wh, "--file", meta_file,
                 "--parameters", "p", "t"]) == 0
    b = Broker(spark, wh)
    meta = b.read("meta")
    assert meta.count() == 4  # 2 stations x 2 parameters
    r44 = meta.filter((F.col("station_id") == 44)
                      & (F.col("parameter") == "p")).first()
    assert r44["stationshoehe"] == 44
    assert r44["x_utm"] is not None  # UTM derived from lon/lat
    # a second run upserts (no duplicates)
    assert main(["update-meta", "--warehouse", wh, "--file", meta_file,
                 "--parameters", "p"]) == 0
    assert b.read("meta").count() == 4

    assert main(["update-raw", "--warehouse", wh, "--dir", p_dir,
                 "-p", "p"]) == 0
    ts_p = b.read("ts_p")
    rows = {r["timestamp"].isoformat(): r["raw"]
            for r in ts_p.filter(F.col("station_id") == 44).collect()}
    assert rows["2024-01-01T00:00:00"] == 0.10
    assert rows["2024-01-01T00:10:00"] is None   # -999 sentinel
    assert rows["2024-01-01T00:20:00"] == 0.30   # hist wins over now (F7)
    assert rows["2024-01-01T00:30:00"] is None   # negative scrub (F6)
    assert rows["2024-01-01T00:40:00"] == 0.40

    assert main(["update-raw", "--warehouse", wh, "--dir", t_dir,
                 "-p", "t"]) == 0
    ts_t = b.read("ts_t")
    t44 = {r["timestamp"].isoformat(): (r["raw"], r["raw_min"], r["raw_max"])
           for r in ts_t.filter(F.col("station_id") == 44).collect()}
    assert t44["2024-01-01T00:00:00"] == (1.5, -2.0, 5.0)  # negatives kept
    assert t44["2024-01-02T00:00:00"] == (None, None, None)
    assert ts_t.filter(F.col("station_id") == 71).count() == 1


def test_station_download_raw_offline(spark, tmp_path, dwd_dirs):
    """Station.download_raw parses without writing (StationBases.py:
    1247-1268); only_new=True keeps rows past the raw watermark."""
    from weatherdb_spark.station import Station

    p_dir, _t_dir, meta_file = dwd_dirs
    wh = str(tmp_path / "wh")
    assert main(["update-meta", "--warehouse", wh, "--file", meta_file,
                 "--parameters", "p"]) == 0
    b = Broker(spark, wh)
    st = Station(b, 44, "p")
    raw = st.download_raw(p_dir)
    assert raw.count() == 5 and not b.exists("ts_p")  # parse only, no write
    assert main(["update-raw", "--warehouse", wh, "--dir", p_dir,
                 "-p", "p"]) == 0
    # everything already imported -> nothing newer than the watermark
    assert st.download_raw(p_dir, only_new=True).count() == 0


def test_broker_update_ma_timeseries_reference_spelling(mini_like_wh):
    b = mini_like_wh
    # t/et have no fact tables in this warehouse: the loop skips them
    b.update_ma_timeseries(paras=["p", "t", "et"], kinds=("raw",),
                           coverage=0.0)
    ma = b.read("station_ma_timeserie")
    assert ma.filter(F.col("parameter") == "p").count() > 0
    assert ma.filter(F.col("parameter") != "p").count() == 0


@pytest.fixture()
def mini_like_wh(spark, tmp_path):
    import datetime as dt

    b = Broker(spark, str(tmp_path / "ma_wh"))
    b.update_meta(spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    ))
    rows = [
        (1, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=10 * i),
         round((i % 5) * 0.1, 1))
        for i in range(200)
    ]
    b.write("ts_p", spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double"
    ), bucket_by_station=True)
    return b


def test_cli_create_user_config(tmp_path, monkeypatch):
    """create-user-config writes the commented defaults copy and records
    its location — no warehouse or SparkSession involved."""
    from weatherdb_spark import userconfig

    monkeypatch.setenv("WEATHERDB_SPARK_MAIN_CONFIG_DIR", str(tmp_path / "main"))
    try:
        target = tmp_path / "cfg" / "user.ini"
        assert main(["create-user-config", "--file", str(target)]) == 0
        text = target.read_text()
        assert "; warehouse_dir" in text or ";warehouse_dir" in text
        # second run without on-exists fails; define only re-records
        with pytest.raises(FileExistsError):
            main(["create-user-config", "--file", str(target)])
        assert main(["create-user-config", "--file", str(target),
                     "--on-exists", "define"]) == 0
    finally:
        userconfig._config = None


DEM_ASC = (
    "ncols 4\n"
    "nrows 3\n"
    "xllcorner 500000\n"
    "yllcorner 5600000\n"
    "cellsize 10000\n"
    "NODATA_value -9999\n"
    "900 900 100 100\n"
    "900 900 100 100\n"
    "900 -9999 100 100\n"
)


def test_cli_update_richter_class_from_dem(spark, tmp_path):
    """update-richter-class samples the DEM grid around each station and
    writes horizon + richter_class into meta (S8+S9 offline tail)."""
    wh = tmp_path / "wh"
    b = Broker(spark, str(wh))
    meta = spark.createDataFrame(
        [(1, "p", 525000.0, 5615000.0, 100.0),
         (2, "p", 505000.0, 5615000.0, 900.0)],
        "station_id int, parameter string, x_utm double, y_utm double, "
        "stationshoehe double",
    )
    b.update_meta(meta)
    dem = tmp_path / "dem.asc"
    dem.write_text(DEM_ASC)
    rc = main([
        "update-richter-class", "--warehouse", str(wh), "--dem", str(dem),
        "--radius-m", "30000", "--sample-step-m", "5000",
    ])
    assert rc in (0, None)
    rows = {
        r["station_id"]: r
        for r in b.read("meta").select(
            "station_id", "horizon", "richter_class"
        ).collect()
    }
    # station 1 sits low with a 800 m wall to the WEST (the scan covers
    # azimuths 90-270 deg: north over west to south) -> some protection;
    # station 2 sits on the high ground -> flat horizon
    assert rows[1]["horizon"] is not None
    assert rows[1]["horizon"] > rows[2]["horizon"]
    assert rows[1]["richter_class"] is not None
    assert rows[2]["richter_class"] == "no-protection"


def test_cli_update_db_and_create_ts_end_to_end(spark, tmp_path):
    """Stage CLI smoke on a fresh warehouse: update-db runs QC -> fillup
    (all parameters, incl. a mean-only T table) -> richter no-op, and
    create-ts exports kind='best' (corr for P) with the NULL-until-
    computed corr column, matching the reference's pre-correction
    exports."""
    import datetime as dt

    wh = str(tmp_path / "wh")
    b = Broker(spark, wh)
    b.update_meta(spark.createDataFrame(
        [(s, p, True, 1000.0 * s, 1000.0 * s, 100 + s)
         for s in (1, 2) for p in ("p", "p_d", "t")],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    ))
    b.update_ma_raster(spark.createDataFrame(
        [(s, p, t, 800.0 + s) for s in (1, 2)
         for p in ("p", "p_d", "t") for t in ("year", "wihy", "suhy")],
        "station_id int, parameter string, term string, value double",
    ))
    start = dt.datetime(2024, 1, 1)
    b.update_raw("p", spark.createDataFrame(
        [(s, start + dt.timedelta(minutes=10 * i),
          0.1 if i % 7 else None, 1) for s in (1, 2) for i in range(288)],
        "station_id int, timestamp timestamp, raw double, qn short",
    ))
    for p in ("p_d", "t"):
        b.update_raw(p, spark.createDataFrame(
            [(s, start + dt.timedelta(days=d), 14.4)
             for s in (1, 2) for d in range(3)],
            "station_id int, timestamp timestamp, raw double",
        ))

    assert main(["update-db", "--warehouse", wh]) == 0
    stages = {(r["parameter"], r["stage"]) for r in b.state().collect()}
    assert {("p", "qc"), ("p", "filled"), ("p_d", "filled"),
            ("t", "qc"), ("t", "filled")} <= stages

    out = str(tmp_path / "exp")
    assert main(["create-ts", "--warehouse", wh, "--out-dir", out,
                 "--stations", "1", "2"]) == 0
    text = (tmp_path / "exp" / "1" / "P_00001.txt").read_text()
    assert "corr" in text.splitlines()[2]  # best kind for P is corr


def test_cli_stream_import(spark, tmp_path):
    """stream-import drains CSV drops into append_raw via the
    checkpointed file source; a second run with a new drop processes
    only the new file and widens the pending window."""
    import datetime as dt

    import pandas as pd

    wh = str(tmp_path / "wh")
    src = tmp_path / "drops"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    day0 = dt.datetime(2024, 1, 1)

    def drop(name, d0):
        pd.DataFrame({
            "station_id": [7] * 2,
            "timestamp": [day0 + dt.timedelta(days=d0 + k) for k in range(2)],
            "raw": [1.0 + d0 + k for k in range(2)],
        }).to_csv(src / name, index=False, sep=";")

    drop("a.csv", 0)
    assert main(["stream-import", "--warehouse", wh, "--dir", str(src),
                 "-p", "t", "--checkpoint", ckpt,
                 "--schema", "station_id int, timestamp timestamp, raw double"
                 ]) == 0
    b = Broker(spark, wh)
    assert b.read("ts_t").filter(F.col("raw").isNotNull()).count() == 2

    drop("b.csv", 3)
    assert main(["stream-import", "--warehouse", wh, "--dir", str(src),
                 "-p", "t", "--checkpoint", ckpt,
                 "--schema", "station_id int, timestamp timestamp, raw double"
                 ]) == 0
    assert b.read("ts_t").filter(F.col("raw").isNotNull()).count() == 4
    assert b.last_imp("t") == ("2024-01-01 00:00:00", "2024-01-05 00:00:00")
