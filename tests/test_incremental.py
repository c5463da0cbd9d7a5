"""Incremental update path: append_raw merge + last_imp window +
window-bounded QC recompute (reference last_imp_* semantics,
broker.py:412-442, StationBases.py:969-1018)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker

START = dt.datetime(2024, 1, 1)


def _p_rows(day0: int, n_days: int, stations=(1, 2)):
    rows = []
    for s in stations:
        for i in range(day0 * 144, (day0 + n_days) * 144):
            ts = START + dt.timedelta(minutes=10 * i)
            rows.append((s, ts, round((i % 4) * 0.1, 1), 1))
    return rows


@pytest.fixture()
def inc_broker(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    b.update_meta(spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100), (2, "p", True, 5000.0, 0.0, 200)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    ))
    b.update_ma_raster(spark.createDataFrame(
        [(s, "p", t, 800.0) for s in (1, 2) for t in ("year", "wihy", "suhy")],
        "station_id int, parameter string, term string, value double",
    ))
    ts_p = spark.createDataFrame(
        _p_rows(0, 3), "station_id int, timestamp timestamp, raw double, qn short"
    )
    b.update_raw("p", ts_p)
    daily = spark.createDataFrame(
        [(s, START + dt.timedelta(days=d), 20.0) for s in (1, 2) for d in range(6)],
        "station_id int, timestamp timestamp, raw double",
    )
    b.update_raw("p_d", daily)
    return b


def test_append_raw_merges_and_tracks_window(spark, inc_broker):
    b = inc_broker
    assert b.read("ts_p").count() == 2 * 3 * 144

    # day 3-4 arrive later, plus a revision of one existing row
    new = spark.createDataFrame(
        _p_rows(3, 2), "station_id int, timestamp timestamp, raw double, qn short"
    ).unionByName(spark.createDataFrame(
        [(1, START + dt.timedelta(minutes=10), 9.9, 1)],
        "station_id int, timestamp timestamp, raw double, qn short",
    ))
    b.append_raw("p", new)

    got = b.read("ts_p")
    assert got.count() == 2 * 5 * 144
    # the revision landed
    revised = got.filter(
        (F.col("station_id") == 1)
        & (F.col("timestamp") == START + dt.timedelta(minutes=10))
    ).first()
    assert revised["raw"] == 9.9
    # untouched row kept
    kept = got.filter(
        (F.col("station_id") == 2)
        & (F.col("timestamp") == START + dt.timedelta(minutes=20))
    ).first()
    assert kept["raw"] == 0.2
    # window recorded
    lo, hi = b.last_imp("p")
    assert lo.startswith("2024-01-01") and hi.startswith("2024-01-05")
    # meta raw periods refreshed by the import (update_period_meta)
    mrow = (
        b.read("meta")
        .filter((F.col("parameter") == "p") & (F.col("station_id") == 1))
        .first()
    )
    assert mrow["raw_until"] >= START + dt.timedelta(days=4)


def test_last_imp_quality_check_bounded(spark, inc_broker):
    b = inc_broker
    # full QC first, then a new import carrying a planted artifact
    b.quality_check()
    before = b.read("ts_p").filter(F.col("qc").isNotNull()).count()

    rows = _p_rows(3, 1)
    # plant an out-of-bounds value (raw >= 50 nulls in qc)
    rows[7] = (rows[7][0], rows[7][1], 99.0, 1)
    new = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double, qn short"
    )
    b.append_raw("p", new)
    b.last_imp_quality_check(margin="1 day")

    got = b.read("ts_p")
    bad = got.filter(F.col("raw") == 99.0).first()
    assert bad["qc"] is None
    # new window rows got qc values
    new_qc = got.filter(
        (F.col("timestamp") >= START + dt.timedelta(days=3)) & F.col("qc").isNotNull()
    ).count()
    assert new_qc > 0
    # pre-existing qc untouched outside the widened window
    old_qc = got.filter(
        (F.col("timestamp") < START + dt.timedelta(days=2)) & F.col("qc").isNotNull()
    ).count()
    assert old_qc > 0
    assert got.filter(F.col("qc").isNotNull()).count() >= before


def _t_rows(day0: int, n_days: int, stations=(1, 2)):
    # daily T with raw/min/max and qc pre-set (QC stage bypassed so the
    # fixture stays small); a hole at station 1 every 5th day
    rows = []
    for s in stations:
        for d in range(day0, day0 + n_days):
            ts = START + dt.timedelta(days=d)
            v = 10.0 + s + d % 3
            hole = s == 1 and d % 5 == 4
            rows.append((
                s, ts,
                None if hole else v,
                None if hole else v - 2,
                None if hole else v + 2,
                None if hole else v,
            ))
    return rows


def _build(spark, tmp_path, name, p_days, t_days):
    b = Broker(spark, str(tmp_path / name))
    b.update_meta(spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100, 5.0), (2, "p", True, 5000.0, 0.0, 200, 9.0),
         (1, "t", True, 0.0, 0.0, 100, 5.0), (2, "t", True, 5000.0, 0.0, 200, 9.0),
         (1, "p_d", True, 0.0, 0.0, 100, 5.0),
         (2, "p_d", True, 5000.0, 0.0, 200, 9.0)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int, horizon double",
    ))
    b.update_ma_raster(spark.createDataFrame(
        [(s, p, t, 800.0) for s in (1, 2) for p in ("p", "p_d", "t")
         for t in ("year", "wihy", "suhy")],
        "station_id int, parameter string, term string, value double",
    ))
    b.update_raw("p", spark.createDataFrame(
        _p_rows(0, p_days),
        "station_id int, timestamp timestamp, raw double, qn short",
    ))
    b.update_raw("p_d", spark.createDataFrame(
        [(s, START + dt.timedelta(days=d), 20.0) for s in (1, 2) for d in range(6)],
        "station_id int, timestamp timestamp, raw double",
    ))
    b.update_raw("t", spark.createDataFrame(
        _t_rows(0, t_days),
        "station_id int, timestamp timestamp, raw double, raw_min double, "
        "raw_max double, qc double",
    ))
    return b


def _stage_rows(b, table, cols):
    out = b.read(table).select("station_id", "timestamp", *cols).collect()
    def norm(v):
        return tuple(v) if isinstance(v, list) else v
    return sorted((r[0], r[1], *(norm(r[i]) for i in range(2, 2 + len(cols))))
                  for r in out)


def test_incremental_fillup_corr_equals_full_recompute(spark, tmp_path):
    """append_raw -> last_imp_quality_check -> last_imp_fillup ->
    last_imp_corr must equal the full recompute row-for-row (reference
    last_imp_* semantics: same data, same result, less work)."""
    # full: all 5 days from the start
    full = _build(spark, tmp_path, "full", p_days=5, t_days=5)
    full.quality_check()
    full.fillup()
    full.richter_correct_stage()

    # inc: 3 days, full stages, then 2 more via the last_imp path
    inc = _build(spark, tmp_path, "inc", p_days=3, t_days=5)
    inc.quality_check()
    inc.fillup()
    inc.richter_correct_stage()
    inc.append_raw("p", spark.createDataFrame(
        _p_rows(3, 2),
        "station_id int, timestamp timestamp, raw double, qn short",
    ))
    inc.last_imp_quality_check(margin="2 days")
    inc.last_imp_fillup(margin="2 days")
    inc.last_imp_corr(margin="2 days")

    got = _stage_rows(inc, "ts_p", ["raw", "qc", "filled", "filled_by", "corr"])
    want = _stage_rows(full, "ts_p", ["raw", "qc", "filled", "filled_by", "corr"])
    assert len(got) == len(want)
    diffs = [(g, w) for g, w in zip(got, want) if g != w]
    assert not diffs, f"{len(diffs)} divergent rows; first: {diffs[0]}"

    # t table (touched only by the full path in both brokers) stays equal
    got_t = _stage_rows(inc, "ts_t", ["filled", "filled_min", "filled_max", "filled_by"])
    want_t = _stage_rows(full, "ts_t", ["filled", "filled_min", "filled_max", "filled_by"])
    assert got_t == want_t


def test_incremental_merges_hardlink_untouched_years(spark, tmp_path):
    """Layout 3: a one-day import into a multi-year table rewrites only
    the touched year's (bucket, year) leaves — every other year's parquet
    files carry into the new snapshot as hard links (same inode), so the
    merge cost is O(touched years), not O(table)."""
    import os

    from weatherdb_spark.broker import Broker

    b = Broker(spark, str(tmp_path / "wh"))
    b.update_meta(spark.createDataFrame(
        [(s, "p_d", True, f"st{s}", 1000.0 * s, 0.0, 100, None) for s in (1, 2, 3)],
        "station_id int, parameter string, is_real boolean, stationsname string, "
        "x_utm double, y_utm double, stationshoehe int, horizon double",
    ))
    b.update_ma_raster(spark.createDataFrame(
        [(s, "p_d", "year", 800.0 + s) for s in (1, 2, 3)],
        "station_id int, parameter string, term string, value double",
    ))
    # two years of daily data for 3 stations
    rows = []
    for s in (1, 2, 3):
        for d in range(730):
            ts = dt.datetime(2023, 1, 1) + dt.timedelta(days=d)
            rows.append((s, ts, float((d + s) % 9)))
    b.update_raw("p_d", spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double"))
    b.fillup()  # full stage once, so the incremental merge has its columns
    assert b._is_year_partitioned("ts_p_d")

    def leaf_inodes(table, year):
        out = {}
        root = b.data_path(table)
        for sub, _dirs, files in os.walk(root):
            if f"ts_year={year}" not in sub:
                continue
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(sub, f)
                    out[os.path.relpath(p, root)] = os.stat(p).st_ino
        assert out, f"no parquet leaves for ts_year={year}"
        return out

    inodes_2023_before = leaf_inodes("ts_p_d", 2023)
    # one-day import into 2024 only
    new = spark.createDataFrame(
        [(s, dt.datetime(2024, 12, 31), 5.0) for s in (1, 2, 3)],
        "station_id int, timestamp timestamp, raw double",
    )
    b.append_raw("p_d", new)
    assert leaf_inodes("ts_p_d", 2023) == inodes_2023_before  # hard-linked
    # the import itself landed
    got = b.read("ts_p_d").filter(
        F.col("timestamp") == "2024-12-31").select("raw").collect()
    assert [r["raw"] for r in got] == [5.0, 5.0, 5.0]
    assert b.read("ts_p_d").count() == 3 * 731  # grid extended by one day

    # window-bounded stage merges keep linking the untouched year too
    b.last_imp_fillup(margin="2 days")
    assert leaf_inodes("ts_p_d", 2023) == inodes_2023_before
    filled = b.read("ts_p_d").filter(F.col("timestamp") == "2024-12-31")
    assert filled.filter(F.col("filled").isNull()).count() == 0


def test_append_raw_disjoint_years_no_duplicate_keys(spark, tmp_path):
    """One import batch touching DISJOINT calendar years across stations
    (a backfill for one, fresh data for another) must not corrupt the
    gap years: the touched-years slice makes the expansion regenerate a
    station's gap years as null grid rows, and those years' real rows
    hard-link from the previous snapshot — the phantom rows must be
    clamped away, or every (station, ts) key in the gap duplicates."""
    from weatherdb_spark.broker import Broker

    b = Broker(spark, str(tmp_path / "wh"))
    b.update_meta(spark.createDataFrame(
        [(s, "p_d", True, 1000.0 * s, 0.0, 100) for s in (1, 2)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    ))
    # six years of daily data for both stations (2020..2025)
    rows = [
        (s, dt.datetime(2020, 1, 1) + dt.timedelta(days=d), float(d % 7))
        for s in (1, 2) for d in range(2192)
    ]
    b.update_raw("p_d", spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double"))
    assert b._is_year_partitioned("ts_p_d")
    n0 = b.read("ts_p_d").count()
    assert n0 == 2 * 2192

    # one batch: station 1 revises a 2020 row, station 2 a 2025 row —
    # the touched years are disjoint, the 2021-2024 gap hard-links
    new = spark.createDataFrame(
        [(1, dt.datetime(2020, 6, 15), 99.0),
         (2, dt.datetime(2025, 12, 31), 88.0)],
        "station_id int, timestamp timestamp, raw double",
    )
    assert b._append_years("ts_p_d", new) == [2020, 2025]  # disjoint!
    b.append_raw("p_d", new)

    got = b.read("ts_p_d")
    dupes = (
        got.groupBy("station_id", "timestamp").count()
        .filter(F.col("count") > 1).count()
    )
    assert dupes == 0
    assert got.count() == n0  # revisions only — no new grid rows
    # the revision and the extension both landed
    assert got.filter(
        (F.col("station_id") == 1) & (F.col("timestamp") == "2020-06-15")
    ).first()["raw"] == 99.0
    assert got.filter(
        (F.col("station_id") == 2) & (F.col("timestamp") == "2025-12-31")
    ).first()["raw"] == 88.0
    # gap-year rows untouched (no null-grid overwrite)
    assert got.filter(
        (F.col("timestamp") >= "2021-01-01")
        & (F.col("timestamp") < "2025-01-01")
        & F.col("raw").isNull()
    ).count() == 0


def test_pending_window_replaced_when_corr_inapplicable(spark, tmp_path):
    """P-only warehouse (no ts_t / no richter_class): the Richter stage
    is a contract no-op, so after qc + fillup the pending window counts
    as CONSUMED and the next append REPLACES it. Before the shared
    _richter_applicable predicate the un-markable 'corr' stage kept the
    window pending forever, so every append widened it and the one-day
    incremental recompute degraded to O(archive)."""
    b = Broker(spark, str(tmp_path / "wh"))
    b.update_meta(spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100), (2, "p", True, 5000.0, 0.0, 200)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    ))
    b.update_ma_raster(spark.createDataFrame(
        [(s, "p", t, 800.0) for s in (1, 2) for t in ("year", "wihy", "suhy")],
        "station_id int, parameter string, term string, value double",
    ))
    b.update_raw("p_d", spark.createDataFrame(
        [(s, START + dt.timedelta(days=d), 10.0) for s in (1, 2) for d in range(4)],
        "station_id int, timestamp timestamp, raw double",
    ))
    b.append_raw("p", spark.createDataFrame(
        _p_rows(0, 1), "station_id int, timestamp timestamp, raw double, qn short"
    ))
    assert not b._richter_applicable()
    b.last_imp_quality_check()
    b.last_imp_fillup()
    b.last_imp_corr()  # contract no-op — must not leave the window owed
    assert b._last_imp_consumed("p")
    # next day's import: the window REPLACES (day 2 only), not widens
    b.append_raw("p", spark.createDataFrame(
        _p_rows(1, 1), "station_id int, timestamp timestamp, raw double, qn short"
    ))
    lo, hi = b.last_imp("p")
    assert lo.startswith("2024-01-02"), f"window widened: {(lo, hi)}"


def test_append_widens_period_meta_full_recompute_trues_up(spark, inc_broker):
    """append_raw stamps period bounds from the batch's own spans
    (O(batch), no archive scan); a revision that nulls the period edge
    is only trued up by the explicit full recompute."""
    b = inc_broker
    row = (
        b.read("meta")
        .filter((F.col("parameter") == "p") & (F.col("station_id") == 1))
        .first()
    )
    until_before = row["raw_until"]
    # revise the last raw value of station 1 to NULL (negative scrub)
    b.append_raw("p", spark.createDataFrame(
        [(1, until_before, None, 1)],
        "station_id int, timestamp timestamp, raw double, qn short",
    ))
    row = (
        b.read("meta")
        .filter((F.col("parameter") == "p") & (F.col("station_id") == 1))
        .first()
    )
    assert row["raw_until"] == until_before  # widening-only: no shrink
    b.update_period_meta("p")  # the exact recompute shrinks it
    row = (
        b.read("meta")
        .filter((F.col("parameter") == "p") & (F.col("station_id") == 1))
        .first()
    )
    assert row["raw_until"] < until_before


def test_stage_runs_refresh_stage_kind_period_meta(spark, inc_broker):
    """Full stages end with the exact period recompute and incremental
    merges widen from the window's own spans, so qc/filled period bounds
    exist and stay fresh without anyone calling update-period-meta —
    the bounds count_holes' between_meta_period relies on."""
    b = inc_broker
    b.quality_check()
    b.fillup()
    row = (
        b.read("meta")
        .filter((F.col("parameter") == "p") & (F.col("station_id") == 1))
        .first()
    )
    assert row["qc_from"] is not None and row["filled_until"] is not None
    filled_until_before = row["filled_until"]
    # a later import + incremental stages must ADVANCE the filled bound
    last_day = int((filled_until_before - START).total_seconds() // 86400)
    b.append_raw("p", spark.createDataFrame(
        _p_rows(last_day + 1, 1),
        "station_id int, timestamp timestamp, raw double, qn short",
    ))
    b.update_raw("p_d", spark.createDataFrame(
        [(s, START + dt.timedelta(days=d), 20.0)
         for s in (1, 2) for d in range(last_day + 2)],
        "station_id int, timestamp timestamp, raw double",
    ))
    b.last_imp_quality_check()
    b.last_imp_fillup()
    row = (
        b.read("meta")
        .filter((F.col("parameter") == "p") & (F.col("station_id") == 1))
        .first()
    )
    assert row["filled_until"] > filled_until_before
