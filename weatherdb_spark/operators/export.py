"""S10/S11 — timeseries export (create_ts path).

Reference: GroupStation.create_ts (GroupStation.py:434-661) writes one
tab-separated file per station/parameter with an optional German date split
(Jahr/Monat/Tag/Stunde/Minute, _split_date GroupStation.py:705-744),
optionally zipped (GroupStations.py:296-451). Spark-first: the date split
is a projection; the file layout is ``df.write.partitionBy(station_id)``;
zipping stays a driver post-step.
"""

from __future__ import annotations

import time
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# German column names as in the reference's export format
_SPLIT_COLS = (
    ("Jahr", F.year),
    ("Monat", F.month),
    ("Tag", F.dayofmonth),
    ("Stunde", F.hour),
    ("Minute", F.minute),
)


def split_date(
    df: DataFrame,
    ts_col: str = "timestamp",
    keep: Sequence[str] = ("station_id",),
    value_cols: Sequence[str] = ("filled",),
    granularity: int = 5,
) -> DataFrame:
    """Split the timestamp into Jahr/Monat/Tag/Stunde/Minute columns
    (GroupStation.py:705-744). ``granularity`` limits how many parts are
    emitted (e.g. 3 for daily data)."""
    parts = [fn(F.col(ts_col)).alias(name) for name, fn in _SPLIT_COLS[:granularity]]
    return df.select(*keep, *parts, *value_cols)


def create_ts(
    df: DataFrame,
    out_dir: str,
    ts_col: str = "timestamp",
    value_cols: Sequence[str] = ("filled",),
    split: bool = True,
    granularity: int = 5,
    sep: str = "\t",
    col_names: dict[str, str] | None = None,
) -> dict:
    """Write per-station tab-separated export files
    (GroupStations.py:296-451): one directory per station via
    ``partitionBy``, header row, deterministic order within files.
    ``col_names`` renames output columns post-split — the RoGeR toolbox
    preset maps Jahr/Monat/... -> YYYY/MM/... (GroupStation.py:405-415).

    Returns an S11-style telemetry dict (models.py:354-386)."""
    import os

    t0 = time.time()
    out = (
        split_date(df, ts_col=ts_col, value_cols=value_cols, granularity=granularity)
        if split
        else df
    )
    # chronological within-file order: the split parts in significance
    # order, or the raw timestamp — NOT "every column but station_id",
    # which would sort by a value column first when it precedes the date
    sort_cols = (
        [name for name, _ in _SPLIT_COLS[:granularity]] if split else [ts_col]
    )
    if col_names:
        for old, new in col_names.items():
            if old in out.columns:
                out = out.withColumnRenamed(old, new)
        sort_cols = [col_names.get(c, c) for c in sort_cols]
    (
        # station_id leads the sort: partitionBy(station_id) imposes a
        # required ordering on station_id, and satisfying it here keeps
        # Spark from inserting its own (non-stable) re-sort that could
        # scramble the within-file date order on spill
        out.repartition("station_id")
        .sortWithinPartitions("station_id", *sort_cols)
        .write.mode("overwrite")
        .option("sep", sep)
        .option("header", True)
        .partitionBy("station_id")
        .csv(out_dir)
    )
    return {
        # free from the partition layout — a distinct-count would
        # re-execute the full input plan just for telemetry
        "quantity": sum(
            1 for e in os.listdir(out_dir) if e.startswith("station_id=")
        ),
        "aggregate": granularity,
        "duration_s": round(time.time() - t0, 3),
        "out_dir": out_dir,
    }


def finalize_station_files(
    out_dir: str,
    para: str,
    dest_dir: str,
    meta: dict[int, tuple[str, float, float]] | None = None,
    file_pattern: str = "{para}_{id:0>5}.txt",
) -> int:
    """Driver post-pass over a ``partitionBy(station_id)`` CSV export:
    move each station's part file to the reference's per-station layout
    ``dest_dir/<stid>/<PARA>_<stid:05>.txt`` and prepend the meta header

        Name: <name> (ID: <id>)\\t...\\n
        Lat: <lat>   ,Lon: <lon>\\t...\\n

    (GroupStation.py:566-568, 633-639). ``meta`` maps station_id ->
    (name, lat, lon); stations missing from it get no header. Pure file
    ops on the driver — O(#stations), no Spark jobs."""
    import os
    import shutil

    n = 0
    for entry in sorted(os.listdir(out_dir)):
        if not entry.startswith("station_id="):
            continue
        stid = int(entry.split("=", 1)[1])
        part_dir = os.path.join(out_dir, entry)
        parts = sorted(
            f for f in os.listdir(part_dir) if f.endswith(".csv") or f.endswith(".txt")
        )
        if not parts:
            continue
        dest = os.path.join(dest_dir, str(stid))
        os.makedirs(dest, exist_ok=True)
        fname = file_pattern.format(para=para.upper(), id=stid)
        with open(os.path.join(dest, fname), "w") as out:
            first = True
            for p in parts:
                with open(os.path.join(part_dir, p)) as fh:
                    lines = fh.readlines()
                if not lines:
                    continue
                if first and meta is not None and stid in meta:
                    name, lat, lon = meta[stid]
                    tabs = "\t" * (lines[0].count("\t"))
                    out.write(f"Name: {name} (ID: {stid}){tabs}\n")
                    out.write(f"Lat: {lat}   ,Lon: {lon}{tabs}\n")
                out.writelines(lines if first else lines[1:])  # one header row
                first = False
        shutil.rmtree(part_dir)
        n += 1
    return n


def zip_exports(out_dir: str, zip_path: str) -> dict:
    """Driver post-step: bundle the per-station export directories into one
    zip (GroupStations.py:296-451 'zip' option). Returns size telemetry."""
    import os
    import zipfile

    n = 0
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(out_dir):
            for f in sorted(files):
                if f.endswith((".csv", ".txt")):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, out_dir))
                    n += 1
    return {"zip": zip_path, "files": n, "output_size": os.path.getsize(zip_path)}


def write_telemetry(spark, telemetry: dict, path: str) -> None:
    """S11 — append one timing row to the export-telemetry table
    (needed_download_time, models.py:354-386; writer
    GroupStations.py:430-445)."""
    import json
    import os
    import time as _t

    os.makedirs(path, exist_ok=True)
    row = dict(telemetry, ts=_t.time())
    fname = os.path.join(path, f"telemetry_{int(row['ts'] * 1000)}.json")
    with open(fname, "w") as fh:
        json.dump(row, fh)


def read_telemetry(spark, path: str) -> DataFrame:
    return spark.read.json(path)
