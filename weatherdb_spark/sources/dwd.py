"""S2/S3 — DWD CDC file readers, Spark-first.

The reference downloads zip/gz files from the DWD FTP server and parses the
contained ``produkt*`` tables with pandas (utils/dwd.py:127-208); the meta
station list is a quasi-fixed-width WINDOWS-1252 text file parsed with a
regex separator (utils/dwd.py:210-350). Here:

- ``read_produkt_csv`` reads the *extracted* produkt tables with
  ``spark.read.csv`` — distributed, schema-on-read, with the reference's
  NA sentinels and date formats. Zip handling stays a driver-side unpack
  (or a binaryFile + pandas_udf pass) because DWD zips are tiny per file;
  the table scan is the part that must scale.
- ``localize_p_timestamps`` reproduces the per-file timezone rule for
  10-min precipitation: files wholly before 2000 are MEZ (UTC+1), files
  wholly after are UTC (StationP.py:190-206).
- ``ingest_p_raw`` applies the P import chain: frequency filter (F5),
  per-file dedup (F7 first-wins), negative scrub (F6)
  (StationP.py:208-224).
- ``read_meta_txt`` parses the station list on the driver (it is a few
  thousand rows) and returns a DataFrame.
"""

from __future__ import annotations

import io
import os
import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: NA sentinels used across DWD tables (utils/dwd.py:185-188)
DWD_NA_VALUES = ["-999", "-9999", "####", "#####", "######"]

#: per-parameter CDC import column maps (reference _cdc_col_names_imp /
#: _db_col_names_imp / _cdc_date_col: StationP.py:66-69, StationPD.py:38-40,
#: StationT.py:35-37, StationET.py:32-34). ``scrub_negative`` mirrors the
#: F6 negative scrub — P/ET measurements cannot be negative; T can.
CDC_IMPORT_COLS: dict[str, dict] = {
    "p": {"date": "MESS_DATUM", "cols": {"RWS_10": "raw"},
          "scrub_negative": True},
    "p_d": {"date": "MESS_DATUM", "cols": {"RSK": "raw"},
            "scrub_negative": True},
    "t": {"date": "MESS_DATUM",
          "cols": {"TMK": "raw", "TNK": "raw_min", "TXK": "raw_max"},
          "scrub_negative": False},
    "et": {"date": "Datum", "cols": {"VPGFAO": "raw"},
           "scrub_negative": True},
}


def dwd_id_to_str(id) -> str:
    """Station id in the DWD's zero-padded 5-char form (utils/dwd.py:
    29-44) — the spelling inside CDC file names and meta listings."""
    return f"{id:0>5}"


def parse_dwd_date(col: Column | str) -> Column:
    """Parse DWD date strings by length: %Y%m%d, %Y%m%d%H or %Y%m%d%H%M
    (utils/dwd.py:46-76). Unknown lengths yield NULL (the reference
    raises; a scan cannot, so callers should assert non-null)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    return (
        F.when(F.length(c) == 8, F.to_timestamp(c, "yyyyMMdd"))
        .when(F.length(c) == 10, F.to_timestamp(c, "yyyyMMddHH"))
        .when(F.length(c) == 12, F.to_timestamp(c, "yyyyMMddHHmm"))
    )


def read_produkt_csv(
    spark: SparkSession,
    path: str | list[str],
    date_cols: tuple[str, ...] = ("MESS_DATUM", "Datum"),
    station_col: str = "STATIONS_ID",
) -> DataFrame:
    """Read extracted DWD ``produkt*`` tables: ``;``-separated, header row,
    leading-space-padded values, NA sentinels, ``eor`` end marker column.

    Everything reads as string (CSV ``nullValue`` takes a single sentinel,
    DWD uses five), sentinels null out in one pass, then dates parse via
    :func:`parse_dwd_date`, the station id casts to int, and every other
    data column casts to double (DWD produkt tables are numeric throughout).
    Adds ``_src_file`` for per-file rules (timezone, dedup order)."""
    df = (
        spark.read.option("sep", ";")
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
        .csv(path)
    )
    df = df.withColumn("_src_file", F.input_file_name())
    if "eor" in df.columns:
        df = df.drop("eor")
    for c in df.columns:
        if c == "_src_file":
            continue
        cleaned = F.when(F.trim(F.col(c)).isin(DWD_NA_VALUES), None).otherwise(
            F.trim(F.col(c))
        )
        if c in date_cols:
            df = df.withColumn(c, parse_dwd_date(cleaned))
        elif c == station_col:
            df = df.withColumn(c, cleaned.cast("int"))
        else:
            df = df.withColumn(c, cleaned.cast("double"))
    return df


def localize_p_timestamps(
    df: DataFrame, ts_col: str = "MESS_DATUM", file_col: str = "_src_file"
) -> DataFrame:
    """Per-file timezone correction for 10-min precipitation
    (StationP.py:197-205): files entirely >= 1999-12-31 23:00 are UTC;
    files entirely < 2000-01-01 01:00 are MEZ (UTC+1) and shift back one
    hour; files straddling the boundary get ``_tz_error = true`` (the
    reference raises)."""
    bounds = df.groupBy(file_col).agg(
        F.min(ts_col).alias("_ts_min"), F.max(ts_col).alias("_ts_max")
    )
    utc_from = F.lit("1999-12-31 23:00:00").cast("timestamp")
    mez_until = F.lit("2000-01-01 01:00:00").cast("timestamp")
    out = df.join(F.broadcast(bounds), file_col)
    is_utc = F.col("_ts_min") >= utc_from
    is_mez = F.col("_ts_max") < mez_until
    return (
        out.withColumn(
            ts_col,
            F.when(is_utc, F.col(ts_col)).otherwise(
                F.col(ts_col) - F.expr("INTERVAL 1 HOUR")
            ),
        )
        .withColumn("_tz_error", ~is_utc & ~is_mez)
        .drop("_ts_min", "_ts_max")
    )


def ingest_p_raw(
    df: DataFrame,
    value_col: str = "RWS_10",
    ts_col: str = "MESS_DATUM",
    station_col: str = "STATIONS_ID",
    file_col: str = "_src_file",
) -> DataFrame:
    """P raw-import chain (StationP.py:208-224): keep on-grid rows
    (minute % 10 == 0, F5), duplicate timestamps across files take the
    first file (F7, :func:`~weatherdb_spark.operators.imports.first_file_rows`),
    within-file duplicates collapse to the mean (StationBases.py:1232-1243),
    negative measurements null out (F6, before the mean so a sentinel
    next to a real value doesn't drag it down). Returns
    (station_id, timestamp, raw, qn).

    A ``_tz_error`` column (:func:`localize_p_timestamps` boundary
    straddle) raises on evaluation — the reference refuses such files
    rather than importing shifted timestamps."""
    from weatherdb_spark.operators.imports import first_file_rows

    on_grid = df.filter(F.minute(ts_col) % 10 == 0)
    deduped = first_file_rows(on_grid, [station_col, ts_col], file_col)
    if "_tz_error" in deduped.columns:
        # the guard rides on the timestamp key so column pruning can
        # never drop it; any action over a straddling file fails loudly
        deduped = deduped.withColumn(
            ts_col,
            F.when(
                F.col("_tz_error"),
                F.raise_error(F.concat(
                    F.lit("P file straddles the 2000 MEZ/UTC boundary: "),
                    F.col(file_col),
                )),
            ).otherwise(F.col(ts_col)),
        )
    qn_col = "QN" if "QN" in df.columns else None
    scrubbed = F.when(F.col(value_col) < 0, None).otherwise(F.col(value_col))
    return (
        deduped.groupBy(
            F.col(station_col).cast("int").alias("station_id"),
            F.col(ts_col).alias("timestamp"),
        )
        .agg(
            F.avg(scrubbed).alias("raw"),
            (F.min(qn_col) if qn_col else F.min(F.lit(None)))
            .cast("short").alias("qn"),
        )
    )


_META_SEP = re.compile(r"\s{2,}|(?<=\d|\))\s(?=\w)")


def read_meta_txt(spark: SparkSession, path: str, encoding: str = "WINDOWS-1252") -> DataFrame:
    """S3 — parse a DWD station-list text file (utils/dwd.py:253-270):
    WINDOWS-1252, header line with column names, ``----`` separator line,
    columns split on >=2 spaces or one space between a number and a word.
    Driver-side pandas (the file is small); returns a Spark DataFrame with
    snake_case columns and parsed dates."""
    with open(path, "rb") as fh:
        text = fh.read().decode(encoding).replace("\r\n", "\n")
    lines = text.split("\n")
    colnames = lines[0].split()
    rows = []
    for line in lines[2:]:
        if not line.strip():
            continue
        parts = _META_SEP.split(line.strip(), maxsplit=len(colnames) - 1)
        parts += [None] * (len(colnames) - len(parts))
        rows.append(parts)
    pdf = pd.DataFrame(rows, columns=colnames)
    for c in colnames:
        lc = c.lower()
        if "datum" in lc:
            pdf[c] = pd.to_datetime(pdf[c], format="%Y%m%d")
        elif lc in ("stations_id", "stationshoehe"):
            pdf[c] = pd.to_numeric(pdf[c])
        elif lc in ("geobreite", "geolaenge"):
            pdf[c] = pdf[c].astype(float)
    pdf.columns = [c.lower() for c in pdf.columns]
    return spark.createDataFrame(pdf)


def extract_zip_dir(
    src_dir: str, member_prefix: str = "produkt", out_dir: str | None = None
) -> list[str]:
    """Extract the ``produkt*`` members of every DWD per-station zip in
    ``src_dir`` into a flat directory (offline tail of the reference's
    download+unzip import, StationBases.py:1239-1308 ``_download_raw``).
    Member names are prefixed with their archive's stem so overlapping
    hist/recent archives stay distinct files (the F7 first-file dedup
    keys on the file NAME, not the path). The default extraction dir is
    deterministic per source dir and cleared on reuse, so repeated
    imports don't leak a new temp copy per run. Returns the extracted
    file paths."""
    import hashlib
    import shutil
    import tempfile
    import zipfile

    if out_dir is None:
        digest = hashlib.md5(os.path.abspath(src_dir).encode()).hexdigest()[:12]
        out_dir = os.path.join(
            tempfile.gettempdir(), f"dwd_extract_{digest}"
        )
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    extracted: list[str] = []
    for fname in sorted(os.listdir(src_dir)):
        if not fname.endswith(".zip"):
            continue
        stem = fname[:-4]
        with zipfile.ZipFile(os.path.join(src_dir, fname)) as zf:
            for member in zf.namelist():
                base = os.path.basename(member)
                if not base.startswith(member_prefix):
                    continue
                target = os.path.join(out_dir, f"{stem}__{base}")
                with zf.open(member) as src, open(target, "wb") as dst:
                    dst.write(src.read())
                extracted.append(target)
    return extracted


def ingest_raw_dir(
    spark: SparkSession, parameter: str, src_dir: str
) -> DataFrame:
    """Offline ``update-raw``: read a directory of DWD files — per-station
    ``*.zip`` archives and/or already-extracted ``produkt*`` tables (plain
    or ``.gz``) — and apply the parameter's import chain. Returns the
    (station_id, timestamp, raw, ...) frame ``Broker.update_raw`` /
    ``append_raw`` expect (reference cli.py:188-193 ``update_raw``, minus
    the FTP download — SURVEY §7.4's declared non-goal)."""
    if parameter not in CDC_IMPORT_COLS:
        raise ValueError(
            f"parameter {parameter!r} not in {sorted(CDC_IMPORT_COLS)}"
        )
    spec = CDC_IMPORT_COLS[parameter]
    paths = [
        os.path.join(src_dir, f)
        for f in sorted(os.listdir(src_dir))
        if os.path.basename(f).startswith("produkt")
        and (f.endswith(".txt") or f.endswith(".gz") or f.endswith(".csv"))
    ]
    paths += extract_zip_dir(src_dir)
    if not paths:
        raise FileNotFoundError(
            f"no produkt files or zips found in {src_dir}"
        )
    df = read_produkt_csv(spark, paths, date_cols=(spec["date"],))
    if parameter == "p":
        return ingest_p_raw(localize_p_timestamps(df))
    # daily tables: F7 first-file dedup (shared helper — name-first key
    # with full-path tie-break), column map, optional F6 scrub, then the
    # within-file duplicates collapse to the mean like the P chain
    from weatherdb_spark.operators.imports import first_file_rows

    deduped = first_file_rows(df, ["STATIONS_ID", spec["date"]], "_src_file")
    aggs = []
    for src, dst in spec["cols"].items():
        v = F.col(src)
        if spec["scrub_negative"]:
            v = F.when(v < 0, None).otherwise(v)
        aggs.append(F.avg(v).alias(dst))
    return deduped.groupBy(
        F.col("STATIONS_ID").cast("int").alias("station_id"),
        F.col(spec["date"]).alias("timestamp"),
    ).agg(*aggs)


def meta_from_dwd(meta_txt: DataFrame, parameter: str) -> DataFrame:
    """Map a parsed DWD station list (:func:`read_meta_txt`) onto the
    warehouse meta schema for one parameter (the reference's per-class
    meta upsert source, StationsBase.py:120-146): WGS84 coordinates stay
    (lon, lat) — ``Broker.update_meta`` derives the UTM pair."""
    return meta_txt.select(
        F.col("stations_id").cast("int").alias("station_id"),
        F.lit(parameter).alias("parameter"),
        F.lit(True).alias("is_real"),
        F.col("stationsname").alias("stationsname"),
        F.col("geolaenge").cast("double").alias("lon"),
        F.col("geobreite").cast("double").alias("lat"),
        F.col("stationshoehe").cast("int").alias("stationshoehe"),
    )
