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
) -> dict:
    """Write per-station tab-separated export files
    (GroupStations.py:296-451): one directory per station via
    ``partitionBy``, header row, deterministic order within files.

    Returns an S11-style telemetry dict (models.py:354-386)."""
    t0 = time.time()
    out = (
        split_date(df, ts_col=ts_col, value_cols=value_cols, granularity=granularity)
        if split
        else df
    )
    (
        out.repartition("station_id")
        .sortWithinPartitions(*[c for c in out.columns if c != "station_id"])
        .write.mode("overwrite")
        .option("sep", sep)
        .option("header", True)
        .partitionBy("station_id")
        .csv(out_dir)
    )
    return {
        "quantity": df.select("station_id").distinct().count(),
        "aggregate": granularity,
        "duration_s": round(time.time() - t0, 3),
        "out_dir": out_dir,
    }


def zip_exports(out_dir: str, zip_path: str) -> dict:
    """Driver post-step: bundle the per-station export directories into one
    zip (GroupStations.py:296-451 'zip' option). Returns size telemetry."""
    import os
    import zipfile

    n = 0
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(out_dir):
            for f in sorted(files):
                if f.endswith(".csv"):
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
