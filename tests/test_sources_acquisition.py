"""S1 (FTP listing / incremental file selection) and S12 (raster
acquisition + ASCII-grid parsing) — everything short of the socket,
against fixture listings and grids."""

from __future__ import annotations

import datetime as dt
import gzip

import pytest

from weatherdb_spark.sources.ftp import (
    files_to_update,
    listing_df,
    parse_ftp_dir_listing,
    station_zip_files,
)
from weatherdb_spark.sources.rasters import (
    ascii_grid_df,
    parse_esri_ascii_grid,
    read_ascii_grid,
    select_newest_dem,
)

FOLDER = "/climate/10_minutes/precipitation/historical/"
LISTING = """\
drwxr-xr-x   2 ftp  ftp       4096 Jan 15 2024 subdir
-rw-r--r--   1 ftp  ftp     123456 Mar  3 2023 10minutenwerte_nieder_00044_20100101_20191231_hist.zip
-rw-r--r--   1 ftp  ftp     234567 Jul 12 08:45 10minutenwerte_nieder_00044_20200101_20231231_hist.zip
-rw-r--r--   1 ftp  ftp     345678 Feb 28 2022 10minutenwerte_nieder_00071_20100101_20191231_hist.zip
total 3
""".splitlines()


def test_parse_ftp_dir_listing_both_date_forms():
    files = parse_ftp_dir_listing(LISTING, FOLDER, default_year=2025)
    assert len(files) == 3  # dir + total lines skipped
    by_name = dict(files)
    assert (
        by_name[FOLDER + "10minutenwerte_nieder_00044_20100101_20191231_hist.zip"]
        == dt.datetime(2023, 3, 3)
    )
    # HH:MM form takes the default year
    assert (
        by_name[FOLDER + "10minutenwerte_nieder_00044_20200101_20231231_hist.zip"]
        == dt.datetime(2025, 7, 12, 8, 45)
    )


def test_station_zip_filter_with_and_without_prefix():
    files = parse_ftp_dir_listing(LISTING, FOLDER, default_year=2025)
    got = station_zip_files(files, 44)
    assert len(got) == 2 and all("_00044_" in f for f, _ in got)
    got_prefixed = station_zip_files(
        files, 44, zip_regex_prefix=FOLDER + "10minutenwerte_nieder_"
    )
    assert got_prefixed == got
    assert station_zip_files(files, 9999) == []


def test_files_to_update_new_and_changed_only(spark):
    files = parse_ftp_dir_listing(LISTING, FOLDER, default_year=2025)
    listing = listing_df(spark, files)
    # manifest: file 1 unchanged, file 2 older on record, file 3 absent
    manifest = spark.createDataFrame(
        [
            (FOLDER + "10minutenwerte_nieder_00044_20100101_20191231_hist.zip",
             dt.datetime(2023, 3, 3)),
            (FOLDER + "10minutenwerte_nieder_00044_20200101_20231231_hist.zip",
             dt.datetime(2024, 1, 1)),
        ],
        "filepath string, modtime timestamp",
    )
    out = {r.filepath for r in files_to_update(listing, manifest).collect()}
    assert out == {
        FOLDER + "10minutenwerte_nieder_00044_20200101_20231231_hist.zip",
        FOLDER + "10minutenwerte_nieder_00071_20100101_20191231_hist.zip",
    }
    assert files_to_update(listing, None).count() == 3


GRID = """\
ncols 3
nrows 2
xllcorner 500000
yllcorner 5350000
cellsize 1000
NODATA_value -999
1.0 2.0 -999
4.0 5.0 6.0
"""


def test_parse_esri_ascii_grid_and_nodata():
    header, rows = parse_esri_ascii_grid(GRID)
    assert header["ncols"] == 3 and header["cellsize"] == 1000
    assert rows == [[1.0, 2.0, None], [4.0, 5.0, 6.0]]


def test_parse_xllcenter_normalized_to_corner():
    txt = GRID.replace("xllcorner 500000", "xllcenter 500500").replace(
        "yllcorner 5350000", "yllcenter 5350500"
    )
    header, _ = parse_esri_ascii_grid(txt)
    assert header["xllcorner"] == 500000 and header["yllcorner"] == 5350000


def test_parse_grid_row_count_mismatch_raises():
    with pytest.raises(ValueError):
        parse_esri_ascii_grid(GRID.replace("nrows 2", "nrows 3"))


def test_read_ascii_grid_gzip(tmp_path):
    p = tmp_path / "grid.asc.gz"
    p.write_bytes(gzip.compress(GRID.encode()))
    header, rows = read_ascii_grid(p)
    assert header["nrows"] == 2 and rows[1][2] == 6.0


def test_ascii_grid_df_north_first_with_top_edge_origin(spark):
    header, rows = parse_esri_ascii_grid(GRID)
    df, x0, y0, res = ascii_grid_df(spark, header, rows, term="year")
    # y0 is the TOP edge (yllcorner + nrows*cellsize), matching the
    # sampler's y0 - row*res addressing
    assert (x0, y0, res) == (500000.0, 5352000.0, 1000.0)
    cells = {(r.col, r.row): r.value for r in df.collect()}
    assert cells[(0, 0)] == 1.0 and cells[(0, 1)] == 4.0
    assert (2, 0) not in cells and cells[(2, 1)] == 6.0


def test_grid_to_broker_station_sample(spark, tmp_path):
    from pyspark.sql import functions as F

    from weatherdb_spark.broker import Broker

    b = Broker(spark, str(tmp_path / "wh"))
    # station 1 sits in the south-middle cell (value 5.0, clean point
    # sample); station 2 sits in the NODATA cell so the 50 m buffer grows
    # to 500 m and averages the two edge-adjacent data cells (2.0, 6.0)
    b.update_meta(spark.createDataFrame(
        [(1, "p", True, 501500.0, 5350500.0, 100),
         (2, "p", True, 502500.0, 5351500.0, 100)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    ))
    header, rows = parse_esri_ascii_grid(GRID)
    grid, x0, y0, res = ascii_grid_df(spark, header, rows, term="year")
    b.update_ma_raster_from_grid("p", grid, x0=x0, y0=y0, res=res)
    out = {r.station_id: r.value
           for r in b.read("station_ma_raster").collect()}
    assert out[1] == 5.0
    assert out[2] == pytest.approx((2.0 + 6.0) / 2)


def test_select_newest_dem_prefers_year_then_resolution():
    cat = [
        {"datasetId": "COP-DEM_GLO-90-DGED/2023_1"},
        {"datasetId": "COP-DEM_GLO-30-DGED/2023_1"},
        {"datasetId": "COP-DEM_GLO-30-DGED/2022_2"},
    ]
    assert select_newest_dem(cat)["id"] == "COP-DEM_GLO-30-DGED/2023_1"


def test_broker_raw_files_manifest_roundtrip(spark, tmp_path):
    from weatherdb_spark.broker import Broker

    b = Broker(spark, str(tmp_path / "wh"))
    files = parse_ftp_dir_listing(LISTING, FOLDER, default_year=2025)
    listing = listing_df(spark, files)
    # empty manifest: everything downloads; then nothing does
    assert b.files_to_download(listing).count() == 3
    b.mark_files_imported(listing)
    assert b.files_to_download(listing).count() == 0
    # a newer server modtime resurfaces exactly that file
    bumped = listing_df(spark, [
        (files[0][0], files[0][1] + dt.timedelta(days=1))
    ])
    assert b.files_to_download(bumped).count() == 1
    b.mark_files_imported(bumped)
    assert b.files_to_download(bumped).count() == 0
    assert b.read("raw_files").count() == 3


def test_ingest_ma_raster_dir_end_to_end(spark, tmp_path):
    """S12 offline tail: a directory of downloaded term grids lands in
    station_ma_raster through one sampling pass."""
    from pyspark.sql import functions as F

    from weatherdb_spark.broker import Broker
    from weatherdb_spark.sources.rasters import ingest_ma_raster_dir

    d = tmp_path / "rasters"
    d.mkdir()
    (d / "hyras_wihy.asc").write_text(GRID)
    (d / "hyras_suhy.asc.gz").write_bytes(
        gzip.compress(GRID.replace("4.0 5.0 6.0", "7.0 8.0 9.0").encode())
    )
    (d / "readme.txt").write_text("ignored")

    b = Broker(spark, str(tmp_path / "wh"))
    # stations inside cells (0,1) -> wihy 4.0 / suhy 7.0 and (1,1) -> 5.0/8.0
    b.update_meta(spark.createDataFrame(
        [(1, "p", True, 500500.0, 5350500.0, 100),
         (2, "p", True, 501500.0, 5350500.0, 100)],
        "station_id int, parameter string, is_real boolean, "
        "x_utm double, y_utm double, stationshoehe int",
    ))
    names, (x0, y0, res) = ingest_ma_raster_dir(b, "p", d)
    assert names == ["hyras_suhy.asc.gz", "hyras_wihy.asc"]
    assert (x0, y0, res) == (500000.0, 5352000.0, 1000.0)
    ma = {(r["station_id"], r["term"]): r["value"]
          for r in b.read("station_ma_raster").collect()}
    assert ma[(1, "wihy")] == 4.0 and ma[(1, "suhy")] == 7.0
    assert ma[(2, "wihy")] == 5.0 and ma[(2, "suhy")] == 8.0
    assert b.read("station_ma_raster").filter(
        F.col("parameter") != "p").count() == 0


def test_ingest_ma_raster_dir_geometry_mismatch_raises(spark, tmp_path):
    from weatherdb_spark.broker import Broker
    from weatherdb_spark.sources.rasters import ingest_ma_raster_dir

    d = tmp_path / "rasters"
    d.mkdir()
    (d / "a_wihy.asc").write_text(GRID)
    (d / "b_suhy.asc").write_text(GRID.replace("cellsize 1000", "cellsize 500"))
    b = Broker(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="share one grid"):
        ingest_ma_raster_dir(b, "p", d)


def test_select_dem_tiles_extent_and_name_filter():
    from weatherdb_spark.sources.rasters import select_dem_tiles

    files = [
        {"nativeDemUrl": "https://x/Copernicus_DSM_10_N48_00_E008_00.tar"},
        {"nativeDemUrl": "https://x/Copernicus_DSM_10_N60_00_E008_00.tar"},
        {"nativeDemUrl": "https://x/Copernicus_DSM_10_N48_00_E030_00.tar"},
        {"nativeDemUrl": "https://x/readme.txt"},
    ]
    # Germany-ish extent keeps only the N48/E008 tile; the 1-degree
    # margin admits tiles whose west/south edge is just outside
    picked = select_dem_tiles(files, (5.3, 46.1, 15.6, 55.4))
    assert [(t["lat"], t["long"]) for t in picked] == [(48, 8)]


@pytest.mark.parametrize("command", ["ingest-ma-rasters", "update-ma-raster"])
def test_cli_ingest_ma_rasters(spark, tmp_path, command):
    from weatherdb_spark.broker import Broker
    from weatherdb_spark.cli import main

    d = tmp_path / "rasters"
    d.mkdir()
    (d / "hyras_year.asc").write_text(GRID)
    wh = str(tmp_path / "wh")
    Broker(spark, wh).update_meta(spark.createDataFrame(
        [(1, "p", True, 500500.0, 5350500.0, 100)],
        "station_id int, parameter string, is_real boolean, "
        "x_utm double, y_utm double, stationshoehe int",
    ))
    assert main([command, "--warehouse", wh,
                 "--dir", str(d), "-p", "p"]) == 0
    ma = Broker(spark, wh).read("station_ma_raster").first()
    assert ma["term"] == "year" and ma["value"] == 4.0
