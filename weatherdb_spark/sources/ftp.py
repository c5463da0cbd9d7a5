"""S1 — DWD CDC FTP file listing and incremental file selection
(reference weatherdb/utils/dwd.py:80-125 ``get_ftp_file_list`` /
``get_cdc_file_list``, StationBases.py:1130-1200 ``get_zipfiles``).

The network is intentionally the thinnest possible layer: everything
testable — the unix ``dir`` listing parse, the per-station zip regex,
the new-or-changed modtime selection against the ``raw_files`` manifest
— is a pure function over strings/DataFrames. ``get_cdc_file_list`` is
the only function that opens a socket (stdlib ftplib, no extra deps) and
is exercised only when a live connection is available.
"""

from __future__ import annotations

import datetime as dt
import ftplib
import re
from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CDC_HOST = "opendata.dwd.de"

_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    )
}


def parse_listing_line(
    line: str, folder: str, default_year: int | None = None
) -> tuple[str, dt.datetime] | None:
    """Parse one unix ``LIST`` line into (filepath, modtime) exactly like
    the reference (dwd.py:113-117: ``split(maxsplit=9)``, fields 5-7 are
    the date, field 8 the name). Listing dates come in two shapes:
    ``Mon DD YYYY`` for old files and ``Mon DD HH:MM`` for files younger
    than ~6 months — the latter has no year, so ``default_year`` (today's
    year when None) fills it in, matching dateutil's behavior in the
    reference. Directory entries and short lines return None.
    """
    parts = line.split(maxsplit=9)
    if len(parts) < 9 or parts[0].startswith("d"):
        return None
    mon, day, year_or_time = parts[5], parts[6], parts[7]
    if mon not in _MONTHS:
        return None
    if ":" in year_or_time:
        hh, mm = year_or_time.split(":")
        year = default_year or dt.date.today().year
        modtime = dt.datetime(year, _MONTHS[mon], int(day), int(hh), int(mm))
    else:
        modtime = dt.datetime(int(year_or_time), _MONTHS[mon], int(day))
    return folder + parts[8], modtime


def parse_ftp_dir_listing(
    lines: Iterable[str], folder: str, default_year: int | None = None
) -> list[tuple[str, dt.datetime]]:
    """All (filepath, modtime) tuples from a folder's ``dir`` output."""
    out = []
    for line in lines:
        parsed = parse_listing_line(line, folder, default_year)
        if parsed is not None:
            out.append(parsed)
    return out


def get_ftp_file_list(
    ftp_conn: ftplib.FTP, ftp_folders: Sequence[str] | str
) -> list[tuple[str, dt.datetime]]:
    """Live listing over an open connection (dwd.py:80-120). Reconnects
    on a dead control channel like the reference's NOOP probe."""
    if isinstance(ftp_folders, str):
        ftp_folders = [ftp_folders]
    try:
        ftp_conn.voidcmd("NOOP")
    except ftplib.all_errors:
        # a bare connect() reopens the socket UNAUTHENTICATED — without
        # the login every later dir() would fail with 530 Not logged in
        ftp_conn.connect()
        ftp_conn.login()
    files: list[tuple[str, dt.datetime]] = []
    for folder in ftp_folders:
        lines: list[str] = []
        ftp_conn.dir(folder, lines.append)
        files.extend(parse_ftp_dir_listing(lines, folder))
    return files


def get_cdc_file_list(
    ftp_folders: Sequence[str] | str,
) -> list[tuple[str, dt.datetime]]:
    """Anonymous session against the public DWD CDC server
    (dwd.py:121-125). Raises the underlying socket error when offline —
    callers in tests pass a pre-parsed listing instead."""
    with ftplib.FTP(CDC_HOST) as ftp_con:
        ftp_con.login()
        return get_ftp_file_list(ftp_con, ftp_folders)


def station_zip_files(
    files: Iterable[tuple[str, dt.datetime]],
    station_id: int,
    id_digits: int = 5,
    zip_regex_prefix: str | None = None,
) -> list[tuple[str, dt.datetime]]:
    """The reference's per-station zip filter (StationBases.py:1168-1177):
    zero-padded station id bounded by ``_`` or ``.``, with an optional
    parameter-specific prefix (e.g. P's ``10minutenwerte_nieder_``)."""
    id_str = str(station_id).rjust(id_digits, "0")
    if zip_regex_prefix is not None:
        comp = re.compile(zip_regex_prefix + id_str + r"[_\.].*")
        # a file-name prefix ('10minutenwerte_nieder_') must match the
        # basename — anchoring it at the full listing path matches
        # nothing; full-path matching stays for callers that pass one
        return [
            f for f in files
            if comp.match(f[0].rsplit("/", 1)[-1]) or comp.match(f[0])
        ]
    comp = re.compile(r".*_" + id_str + r"[_\.].*")
    return [f for f in files if comp.match(f[0])]


def listing_df(
    spark: SparkSession, files: Sequence[tuple[str, dt.datetime]]
) -> DataFrame:
    """(filepath, modtime) listing as a DataFrame — the dim side of the
    incremental anti-join. A full CDC folder is tens of thousands of
    rows, so this always broadcasts."""
    return spark.createDataFrame(
        list(files) or [(None, None)], "filepath string, modtime timestamp"
    ).filter(F.col("filepath").isNotNull())


def files_to_update(
    listing: DataFrame, manifest: DataFrame | None
) -> DataFrame:
    """J11 — the reference's ``only_new`` selection
    (StationBases.py:1183-1200): keep listing rows whose filepath is not
    in the ``raw_files`` manifest or whose server modtime is newer than
    the stored one. With no manifest yet, everything is new."""
    if manifest is None:
        return listing
    db = manifest.select(
        F.col("filepath"), F.col("modtime").alias("_db_modtime")
    )
    return (
        listing.join(F.broadcast(db), "filepath", "left")
        .filter(
            F.col("_db_modtime").isNull()
            | (F.col("modtime") > F.col("_db_modtime"))
        )
        .drop("_db_modtime")
    )
