"""Regression tests for the round-5 core-module review findings:
TimestampPeriod unpack, character-iterated string arguments, hole-census
bound handling, NULL-text exact dedup, connected-components convergence,
split_date forwarding, and IVF sample training."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker
from weatherdb_spark.operators.aggregate import hole_census
from weatherdb_spark.period import TimestampPeriod
from weatherdb_spark.station import GroupStation, Station, Stations


@pytest.fixture(scope="module")
def pe_broker(spark, tmp_path_factory):
    """Mini warehouse with a multi-char parameter table (ts_et) so the
    string-iteration class of bug is observable."""
    wh = str(tmp_path_factory.mktemp("review_wh"))
    b = Broker(spark, wh)
    b.update_meta(spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100), (1, "et", True, 0.0, 0.0, 100),
         (1, "t", True, 0.0, 0.0, 100)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    ))
    p_rows = [
        (1, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=10 * i), 0.1, 0.1)
        for i in range(288)
    ]
    b.write("ts_p", spark.createDataFrame(
        p_rows, "station_id int, timestamp timestamp, raw double, filled double"
    ), bucket_by_station=True)
    et_rows = [
        (1, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), 2.0, 2.0)
        for i in range(5)
    ]
    b.write("ts_et", spark.createDataFrame(
        et_rows, "station_id int, timestamp timestamp, raw double, filled double"
    ), bucket_by_station=True)
    t_rows = [
        (1, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), 5.0, 5.0)
        for i in range(5)
    ]
    b.write("ts_t", spark.createDataFrame(
        t_rows, "station_id int, timestamp timestamp, raw double, filled double"
    ), bucket_by_station=True)
    return b


def test_get_df_accepts_timestampperiod_default_path(pe_broker):
    """nas_allowed=True (default) forwards the period object into the
    facade, which unpacks it — a TimestampPeriod must behave like the
    (start, end) tuple the annotation also allows."""
    st = Station(pe_broker, 1, "p")
    per = TimestampPeriod("2024-01-01", "2024-01-01 12:00:00")
    got = st.get_df(kinds=("raw",), period=per)
    want = st.get_df(kinds=("raw",), period=("2024-01-01", "2024-01-01 12:00:00"))
    assert got.count() == want.count() > 0
    start, end = per  # tuple-unpack protocol itself
    assert (start, end) == (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 12))


def test_group_station_get_df_multichar_parameter_string(pe_broker):
    """parameters='et' must select the ET series, not iterate to
    ('e', 't') and silently return the T series."""
    df = GroupStation(pe_broker, 1).get_df(
        parameters="et", kinds=("raw",), agg_to=None
    )
    value_cols = [c for c in df.columns if c != "timestamp"]
    assert value_cols == ["ET_raw"]
    assert df.first()["ET_raw"] == 2.0  # ET value, not T's 5.0


def test_get_meta_explanation_single_field_string():
    exp = Stations.get_meta_explanation(infos="station_id")
    assert set(exp) == {"station_id"}


def test_group_station_create_ts_split_date_false(pe_broker, tmp_path):
    GroupStation(pe_broker, 1).create_ts(
        str(tmp_path / "exp"), parameters=("p",), kind="raw", split_date=False
    )
    path = tmp_path / "exp" / "1" / "P_00001.txt"
    header = path.read_text().splitlines()[2]  # after Name/Lat meta rows
    assert header.split("\t")[0] == "timestamp"  # no Jahr/Monat split


def test_hole_census_half_open_period(spark):
    """A single-bound period crops and sentinels only that bound —
    previously the NULL-cast bound filtered out every row."""
    obs = spark.createDataFrame(
        [(1, dt.datetime(2024, 2, 1) + dt.timedelta(hours=i), 1.0)
         for i in range(48)],
        "station_id int, timestamp timestamp, raw double",
    )
    out = hole_census(
        obs, gap_thresholds=("1 days",), period=("2024-01-01", None)
    ).first()
    assert out["holes_ge_1_days"] == 1  # the leading 31-day hole


def test_hole_census_meta_and_period_bounds_intersect(spark):
    """period wider than the station's meta period must not count the
    station's non-existence as holes."""
    obs = spark.createDataFrame(
        [(1, dt.datetime(2010, 1, 1) + dt.timedelta(hours=i), 1.0)
         for i in range(24 * 30)],
        "station_id int, timestamp timestamp, raw double",
    )
    mp = spark.createDataFrame(
        [(1, dt.datetime(2010, 1, 1), dt.datetime(2010, 1, 31))],
        "station_id int, period_from timestamp, period_until timestamp",
    )
    out = hole_census(
        obs, gap_thresholds=("2 weeks",),
        period=("1990-01-01", "2025-01-01"), meta_period=mp,
    ).first()
    assert out["holes_ge_2_weeks"] == 0


def test_exact_dedup_keeps_null_text_documents(spark):
    from weatherdb_spark.llm.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None), (5, "b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in exact_dedup(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # nothing silently dropped
    assert out[3]["is_kept"] and not out[4]["is_kept"]
    assert out[3]["group_size"] == 2


def test_connected_components_raises_when_unconverged(spark, monkeypatch):
    from weatherdb_spark.llm import dedup

    monkeypatch.setattr(dedup, "DRIVER_CC_MAX_EDGES", -1)  # force distributed
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=1).collect()
    # ample rounds converge to one component
    labels = dedup.connected_components(chain, max_iter=20).collect()
    assert {r["component_id"] for r in labels} == {0}


def test_ivf_topk_trains_on_sample(spark, monkeypatch):
    """With the training cap below the corpus size the quantizer fits on
    a sample; results still return k neighbors per query."""
    import random

    from weatherdb_spark.llm import similarity

    monkeypatch.setattr(similarity, "IVF_TRAIN_MAX_ROWS", 50)
    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.ivf_topk(emb, emb.limit(3), k=2, n_cells=4, n_probe=4)
    rows = out.collect()
    assert len(rows) == 6  # 3 queries x k=2 — n_probe=all keeps recall 1


def test_ingest_p_raw_within_file_duplicates_average(spark):
    """Duplicate (station, ts) keys INSIDE the winning file collapse to
    the mean (reference StationBases.py:1232-1243), with the F6 negative
    scrub applied before averaging."""
    import datetime as dt

    from weatherdb_spark.sources.dwd import ingest_p_raw

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1.0, 1, "/a/produkt_rr.txt"),
        (1, dt.datetime(2024, 1, 1, 0, 0), 3.0, 1, "/a/produkt_rr.txt"),
        # a negative sentinel next to a real value must not drag the mean
        (1, dt.datetime(2024, 1, 1, 0, 10), -999.0, 1, "/a/produkt_rr.txt"),
        (1, dt.datetime(2024, 1, 1, 0, 10), 4.0, 1, "/a/produkt_rr.txt"),
    ]
    df = spark.createDataFrame(
        rows,
        "STATIONS_ID int, MESS_DATUM timestamp, RWS_10 double, QN int, _src_file string",
    )
    out = {r.timestamp: r.raw for r in ingest_p_raw(df).collect()}
    assert out[dt.datetime(2024, 1, 1, 0, 0)] == 2.0
    assert out[dt.datetime(2024, 1, 1, 0, 10)] == 4.0


def test_ingest_p_raw_raises_on_tz_straddling_file(spark):
    """A file straddling the 2000 MEZ/UTC boundary must fail loudly (the
    reference raises) instead of importing hour-shifted timestamps."""
    import datetime as dt

    from weatherdb_spark.sources.dwd import ingest_p_raw, localize_p_timestamps

    rows = [
        (1, dt.datetime(1999, 12, 31, 22, 50), 1.0, 1, "/a/produkt_straddle.txt"),
        (1, dt.datetime(2000, 1, 1, 1, 10), 2.0, 1, "/a/produkt_straddle.txt"),
    ]
    df = spark.createDataFrame(
        rows,
        "STATIONS_ID int, MESS_DATUM timestamp, RWS_10 double, QN int, _src_file string",
    )
    with pytest.raises(Exception, match="MEZ/UTC boundary"):
        ingest_p_raw(localize_p_timestamps(df)).collect()


def test_frame_sample_empty_payload_yields_no_frames(spark):
    from weatherdb_spark.llm.multimodal import frame_sample

    df = spark.createDataFrame(
        [(1, b"x" * 100), (2, b""), (3, None)],
        "doc_id long, payload binary",
    )
    out = frame_sample(df, every_n_bytes=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
    assert by_doc == {1: [0, 1]}  # no spurious (0, -1) frames for 2 and 3


def test_multimodal_udfs_tolerate_null_payload(spark):
    from weatherdb_spark.llm.multimodal import (
        decode_images, extract_features, resize_images,
    )

    df = spark.createDataFrame(
        [(1, b"abc"), (2, None)], "doc_id long, payload binary"
    )
    dec = {r["doc_id"]: r["n_bytes"] for r in decode_images(df).collect()}
    assert dec == {1: 3, 2: 0}
    assert extract_features(df).count() == 2
    assert resize_images(df).count() == 2


def test_station_zip_files_basename_prefix():
    from weatherdb_spark.sources.ftp import station_zip_files

    files = [
        ("/climate/10_minutes/10minutenwerte_nieder_00044_hist.zip", None),
        ("/climate/10_minutes/10minutenwerte_nieder_00055_hist.zip", None),
    ]
    got = station_zip_files(files, 44, zip_regex_prefix="10minutenwerte_nieder_")
    assert [f for f, _ in got] == [files[0][0]]


def test_sample_raster_boundary_station_takes_own_cell(spark):
    """A station exactly on a cell boundary point-samples the single
    half-open containing cell, not the average of the touching cells."""
    from weatherdb_spark.operators.raster import sample_raster

    stations = spark.createDataFrame(
        [(1, 100.0, 200.0)], "station_id int, x_utm double, y_utm double"
    )
    # grid: res 100, x0=0, y0=1000 -> station (100, 200) sits on the
    # boundary between cols 0|1 (x) and rows 7|8 (y); the half-open
    # containing cell is (col 1, row 8)
    raster = spark.createDataFrame(
        [(c, r, "year", float(10 * c + r)) for c in (0, 1) for r in (7, 8)],
        "col long, row long, term string, value double",
    )
    out = sample_raster(stations, raster, x0=0.0, y0=1000.0, res=100.0).collect()
    assert len(out) == 1
    assert out[0]["value"] == 18.0  # cell (1, 8), no averaging
    assert out[0]["sample_dist_m"] == 0.0


def test_horizon_null_outside_dem(spark):
    import numpy as np

    from weatherdb_spark.operators.horizon import horizon_angles

    meta = spark.createDataFrame(
        [(1, 0.0, 0.0, 100)],
        "station_id int, x_utm double, y_utm double, stationshoehe int",
    )

    def sampler(xs, ys):
        return np.full(len(xs), np.nan)

    row = horizon_angles(meta, sampler).first()
    assert row["horizon"] is None


def test_stream_run_gate_per_window_head(spark, tmp_path):
    """[qn=3, 1, 1, 1] equal values: the batch rule flags rows 2-4 (the
    window headed at row 2) — the stream must agree, not gate the whole
    run on its first row. A NULL qn head never flags (SQL semantics)."""
    import pandas as pd

    from weatherdb_spark.streaming.stateful import consec_run_flags

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({
        "station_id": [1, 1, 1, 1, 2, 2, 2],
        "timestamp": ["2024-01-01 00:00:00", "2024-01-01 00:10:00",
                      "2024-01-01 00:20:00", "2024-01-01 00:30:00",
                      "2024-01-01 00:00:00", "2024-01-01 00:10:00",
                      "2024-01-01 00:20:00"],
        "raw": [0.5, 0.5, 0.5, 0.5, 0.7, 0.7, 0.7],
        "qn": [3, 1, 1, 1, None, 1, 1],  # station 2: NULL head
    }).to_csv(src / "a.csv", index=False)
    stream = (
        # qn double: a None in the pandas column makes to_csv write
        # '3.0'-style floats, which an int schema would null out wholesale
        spark.readStream.schema(
            "station_id int, timestamp timestamp, raw double, qn double"
        ).option("header", "true").csv(str(src))
    )
    q = (
        consec_run_flags(stream)
        .writeStream.format("memory").queryName("gate_flags")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination()
    got = {
        (r["station_id"], r["timestamp"].strftime("%H:%M"))
        for r in spark.sql("SELECT * FROM gate_flags").collect()
    }
    assert got == {(1, "00:10"), (1, "00:20"), (1, "00:30")}


def test_to_db_units_half_even(spark):
    from weatherdb_spark.functions.units import to_db_unit, to_db_units

    df = spark.createDataFrame([(0.125,), (0.135,)], "raw double")
    col_form = df.select(to_db_units(F.col("raw"), 100).alias("v")).collect()
    frame_form = to_db_unit(df, "p").collect()  # p decimals = 100
    assert [r["v"] for r in col_form] == [12, 14]  # half-even, like pandas
    assert [r["raw"] for r in frame_form] == [12, 14]


def test_merge_upsert_null_key_match_not_insert(spark):
    from weatherdb_spark.sinks.merge import merge_upsert

    cur = spark.createDataFrame([(None, 1.0), (1, 2.0)], "k int, v double")
    upd = spark.createDataFrame([(None, 9.0)], "k int, v double")
    out = {r["k"]: r for r in merge_upsert(cur, upd, keys=["k"]).collect()}
    assert out[None]["_merge_action"] == "update"  # eqNullSafe matched it
    assert out[None]["v"] == 9.0
    assert out[1]["_merge_action"] == "keep"


def test_write_merged_rewrites_only_touched_partitions(spark, tmp_path):
    import os

    from weatherdb_spark.sinks.merge import merge_upsert, write_merged

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, 0, 1.0), (2, 1, 2.0)], "k int, part int, v double"
    )
    base.write.partitionBy("part").parquet(path)

    def files(part):
        d = os.path.join(path, f"part={part}")
        return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))

    before = files(1)
    upd = spark.createDataFrame([(1, 0, 9.0)], "k int, part int, v double")
    merged = merge_upsert(spark.read.parquet(path).select("k", "part", "v"),
                          upd, keys=["k"], value_cols=["v"])
    write_merged(merged, path, partition_cols=("part",))
    assert files(1) == before  # untouched partition kept its files
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: 9.0, 2: 2.0}


def test_append_raw_widens_pending_last_imp(spark, tmp_path):
    """Two appends before any incremental stage: the last_imp window
    must span BOTH batches, or the first import is silently orphaned."""
    import datetime as dt

    b = Broker(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0), 1.0)],
        "station_id int, timestamp timestamp, raw double",
    )
    b.update_raw("p_d", base)
    b.append_raw("p_d", spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1), 2.0)],
        "station_id int, timestamp timestamp, raw double",
    ))
    b.append_raw("p_d", spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1), 3.0)],
        "station_id int, timestamp timestamp, raw double",
    ))
    lo, hi = b.last_imp("p_d")
    assert lo.startswith("2024-03-01")  # first pending batch still covered
    assert hi.startswith("2024-06-01")
    # consume the window (what last_imp_fillup stamps), then a new
    # append REPLACES it instead of widening forever
    b._mark("p_d", "filled", "ts_p_d")
    b.append_raw("p_d", spark.createDataFrame(
        [(1, dt.datetime(2024, 9, 1), 4.0)],
        "station_id int, timestamp timestamp, raw double",
    ))
    lo, hi = b.last_imp("p_d")
    assert lo.startswith("2024-09-01")


def test_last_imp_qc_keeps_margin_row_flags(spark, tmp_path):
    """A qc flag set by the full QC on rows INSIDE the margin (but
    outside the import window) must survive the incremental QC — margin
    rows are context only, their truncated recomputation must not merge."""
    import datetime as dt

    b = Broker(spark, str(tmp_path / "wh"))
    rows = []
    # a 3-run of equal 5.0 values (qn=1) early on day 1 — flagged by QC
    for i in range(6):
        ts = dt.datetime(2024, 1, 1, 10, 0) + dt.timedelta(minutes=10 * i)
        rows.append((1, ts, 5.0 if i < 3 else float(i), 1))
    # normal data near the later import window
    for i in range(6):
        ts = dt.datetime(2024, 1, 2, 10, 0) + dt.timedelta(minutes=10 * i)
        rows.append((1, ts, float(i % 3), 1))
    b.update_raw("p", spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double, qn int"))
    b.update_raw("p_d", spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 10.0), (1, dt.datetime(2024, 1, 2), 3.0)],
        "station_id int, timestamp timestamp, raw double"))
    b.quality_check()
    flagged = (
        b.read("ts_p")
        .filter(F.col("raw").isNotNull() & F.col("qc").isNull())
        .count()
    )
    assert flagged >= 3  # the run is nulled by the full QC
    # incremental import well after the run, margin 2 days REACHES it
    b.append_raw("p", spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2, 12, 0), 0.5, 1)],
        "station_id int, timestamp timestamp, raw double, qn int"))
    b.last_imp_quality_check(margin="2 days")
    flagged_after = (
        b.read("ts_p")
        .filter(F.col("raw").isNotNull() & F.col("qc").isNull())
        .count()
    )
    assert flagged_after >= flagged  # margin rows kept their flags


def test_expand_timeline_start_after_end_yields_no_rows(spark):
    """A station whose archive wholly predates min_date must produce no
    grid (not a descending-sequence explosion or a phantom row)."""
    import datetime as dt
    import time

    from weatherdb_spark.operators.timeline import expand_timeline

    df = spark.createDataFrame(
        [(1, dt.datetime(1960, 1, 1) + dt.timedelta(minutes=10 * i), 1.0)
         for i in range(10)],
        "station_id int, timestamp timestamp, raw double",
    )
    t0 = time.time()
    out = expand_timeline(df, "10 minutes", min_date="1994-01-01")
    assert out.count() == 0
    assert time.time() - t0 < 60  # no quadratic row generation


def test_mark_footer_span_matches_scan(spark, tmp_path):
    import datetime as dt

    b = Broker(spark, str(tmp_path / "wh"))
    b.update_raw("p_d", spark.createDataFrame(
        [(1, dt.datetime(2020, 5, 1), 1.0), (2, dt.datetime(2023, 11, 30), 2.0)],
        "station_id int, timestamp timestamp, raw double",
    ))
    lo, hi = b._table_span("ts_p_d")
    assert str(lo).startswith("2020-05-01")
    # expand_timeline extends the grid to the max observed timestamp
    assert str(hi).startswith("2023-11-30")


def test_table_span_handles_date_typed_column(spark, tmp_path):
    """Parquet footer stats for DATE columns come back as datetime.date
    (no tzinfo attribute) — _table_span must not assume tz-aware
    datetimes (regression: AttributeError in the stress pipeline)."""
    import datetime as dt

    b = Broker(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, dt.date(2020, 5, 1), 1.0), (2, dt.date(2023, 11, 30), 2.0)],
        "station_id int, timestamp date, raw double",
    )
    b.write("ts_p_d", df, bucket_by_station=False)
    lo, hi = b._table_span("ts_p_d")
    assert str(lo) == "2020-05-01"
    assert str(hi) == "2023-11-30"


def test_quality_check_without_ts_p_d_fails_loudly(spark, tmp_path):
    import datetime as dt

    b = Broker(spark, str(tmp_path / "wh"))
    b.update_raw("p", spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0, 1)],
        "station_id int, timestamp timestamp, raw double, qn int",
    ))
    with pytest.raises(FileNotFoundError, match="ts_p_d"):
        b.quality_check()


def test_ma_stage_respects_broker_mutex(spark, tmp_path):
    wh = str(tmp_path / "wh")
    b1, b2 = Broker(spark, wh), Broker(spark, wh)
    ma = spark.createDataFrame(
        [(1, "p", "year", 800.0)],
        "station_id int, parameter string, term string, value double",
    )
    with b1.activate():
        with pytest.raises(RuntimeError, match="Another Broker"):
            b2.update_ma_raster(ma)
    b1.update_ma_raster(ma)  # lock released -> proceeds
    assert b1.read("station_ma_raster").count() == 1


def test_write_small_pins_schema_for_all_null_columns(spark, tmp_path):
    """An EMPTY import writes pipeline_state with NULL watermarks; a
    plain pandas.to_parquet would re-infer that column's type, and the
    next _mark's read-union would cast real timestamp strings into it
    (CAST_INVALID_INPUT). The empty-then-real sequence must work."""
    import datetime as dt

    b = Broker(spark, str(tmp_path / "wh"))
    empty = spark.createDataFrame(
        [], "station_id int, timestamp timestamp, raw double"
    )
    b.update_raw("t", empty)
    rows = [(1, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), 20.0 + i)
            for i in range(3)]
    b.update_raw("t", spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double"
    ))
    b.append_raw("t", empty)  # empty batch: no-op, no corruption
    marks = {r["stage"]: r["watermark_from"] for r in b.state().collect()}
    assert marks["raw"] == "2024-01-01 00:00:00"
    # the no-op must not record a "None"-bounded last_imp window
    assert b.last_imp("t") is None


def test_fillup_without_dims_fails_loudly(spark, tmp_path):
    import datetime as dt

    b = Broker(spark, str(tmp_path / "wh"))
    b.update_raw("t", spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)],
        "station_id int, timestamp timestamp, raw double",
    ))
    with pytest.raises(FileNotFoundError, match="update-meta|station_ma_raster"):
        b.fillup()


def test_update_raw_rejects_duplicate_keys(spark, tmp_path):
    """The engine twin of the reference raw tables' timestamp PK: an
    import batch with duplicate (station_id, timestamp) keys fails
    loudly instead of corrupting downstream keyed merges."""
    b = Broker(spark, str(tmp_path / "wh"))
    dup = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0), (1, dt.datetime(2024, 1, 1), 2.0)],
        "station_id int, timestamp timestamp, raw double",
    )
    with pytest.raises(ValueError, match="duplicate"):
        b.update_raw("t", dup)
    ok = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0), (1, dt.datetime(2024, 1, 2), 2.0)],
        "station_id int, timestamp timestamp, raw double",
    )
    b.update_raw("t", ok)
    with pytest.raises(ValueError, match="append_raw"):
        b.append_raw("t", dup)


def test_station_isin_meta_check(spark, tmp_path):
    from weatherdb_spark.station import Station

    b = Broker(spark, str(tmp_path / "wh"))
    b.update_meta(spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    ))
    assert Station(b, 1, "p").check_isin_meta().isin_meta()
    assert not Station(b, 2, "p").isin_meta()
    with pytest.raises(KeyError, match="not in the"):
        Station(b, 999, "p").check_isin_meta()


def test_cosine_zero_norm_vector_is_null_not_error(spark):
    """A zero embedding (padding doc) must not kill the task with an
    ANSI DIVIDE_BY_ZERO; NULL similarity ranks last / fails thresholds."""
    from weatherdb_spark.llm.similarity import brute_topk, cosine

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = emb.select(
        cosine(F.col("embedding"), F.array(F.lit(1.0), F.lit(0.0))).alias("c")
    ).collect()
    assert got[0]["c"] == 1.0 and got[1]["c"] is None
    zero_q = spark.createDataFrame(
        [(9, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert brute_topk(emb, zero_q, k=2).count() == 2  # no task failure


def test_quality_score_empty_text(spark):
    from weatherdb_spark.llm.text import quality_score

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "the quick brown fox is here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert rows[1] is not None and 0.0 <= rows[1] <= 1.0
    assert rows[3] > rows[1]  # real text outranks empty


def test_sample_raster_fine_resolution_plan_stays_small(spark):
    """The candidate offsets are generated by sequence-explode, not a
    literal struct array — res=1 m with a 1 km buffer implies ~4M
    offsets and a literal plan hung the driver before the first task.
    Also: a station far outside the raster is absent, not an error."""
    import time

    from weatherdb_spark.operators.raster import sample_raster

    st = spark.createDataFrame(
        [(1, -5000.0, -5000.0), (2, 1.5, 8.5)],
        "station_id int, x_utm double, y_utm double",
    )
    grid = spark.createDataFrame(
        [(i, j, "year", 1.0) for i in range(3) for j in range(3)],
        "col int, row int, term string, value double",
    )
    t0 = time.time()
    rows = sample_raster(st, grid, x0=0.0, y0=10.0, res=1.0).collect()
    assert time.time() - t0 < 120
    assert [(r["station_id"], r["value"]) for r in rows] == [(2, 1.0)]


def test_fillup_t_without_minmax_columns(spark, tmp_path):
    """A mean-only T table (no raw_min/raw_max import) still fills —
    the min/max series ride along only when the import carried them."""
    b = Broker(spark, str(tmp_path / "wh"))
    b.update_meta(spark.createDataFrame(
        [(s, "t", True, 1000.0 * s, 0.0, 100) for s in (1, 2)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    ))
    b.update_ma_raster(spark.createDataFrame(
        [(s, "t", "year", 9.0) for s in (1, 2)],
        "station_id int, parameter string, term string, value double",
    ))
    rows = [(s, dt.datetime(2024, 1, 1) + dt.timedelta(days=d),
             None if (s, d) == (1, 2) else 5.0 + d)
            for s in (1, 2) for d in range(5)]
    b.update_raw("t", spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double"
    ))
    b.quality_check()
    b.fillup()
    out = b.read("ts_t")
    assert "filled" in out.columns and "filled_min" not in out.columns
    hole = out.filter("station_id = 1 AND timestamp = '2024-01-03'").first()
    assert hole["filled"] is not None  # donor-filled from station 2


def test_get_df_unbuilt_stage_kind_is_typed_null(spark, tmp_path):
    """kind='corr' before richter-correct ran: the reference's schema
    carries the column as NULL from day one — the read must return typed
    NULLs, not fail on a valid-but-unbuilt kind."""
    from weatherdb_spark.station import Station

    b = Broker(spark, str(tmp_path / "wh"))
    b.update_raw("p", spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0, 1)],
        "station_id int, timestamp timestamp, raw double, qn short",
    ))
    df = Station(b, 1, "p").get_df(kinds=("raw", "corr"))
    row = df.first()
    assert row["raw"] == 1.0 and row["corr"] is None
    assert dict(df.dtypes)["corr"] == "double"


def test_ivf_topk_deterministic_under_repartitioning(spark):
    """The IVF quantizer is a pure function of (corpus, seed): the SAME
    corpus under a different partition layout yields identical top-k
    results. pyspark.ml KMeans broke this — its partition-order float
    sums moved centroids enough to flip borderline cell assignments and
    flake the ann_ivf_recall gate between environments."""
    import random

    from weatherdb_spark.llm.similarity import ivf_topk

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)]
    emb1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    emb2 = emb1.repartition(17, "vec_id")
    q = emb1.filter("vec_id < 4")
    out1 = sorted(map(tuple, ivf_topk(emb1, q, k=3, n_cells=6,
                                      n_probe=2).collect()))
    out2 = sorted(map(tuple, ivf_topk(emb2, q, k=3, n_cells=6,
                                      n_probe=2).collect()))
    assert out1 == out2 and len(out1) == 12


# ---------------------------------------------------------------- round 8


def test_hamming_pairs_mixed_sign_block0_agreement(spark):
    """Two 64-bit fingerprints differing ONLY in bit 63 (one negative,
    one non-negative) agree on block 0 alone; sign-following key
    extraction (arithmetic shift or Spark's %) would hand the two sides
    different block-0 keys and silently miss the pair — the bitwise-AND
    mask keeps recall 1."""
    from weatherdb_spark.llm.dedup import hamming_pairs_exact
    from weatherdb_spark.llm.multimodal import dhash_images

    g1 = bytearray(72)
    g1[71] = 1            # bit 63 only (row 7: grid[70] < grid[71])
    g2 = bytearray(72)    # all-zero grid -> fingerprint 0
    df = spark.createDataFrame(
        [(1, bytes(g1)), (2, bytes(g2))], "doc_id long, payload binary"
    )
    fps = {r.doc_id: r.dhash for r in dhash_images(df).collect()}
    assert fps[1] < 0 and fps[2] == 0
    got = {tuple(r) for r in
           hamming_pairs_exact(dhash_images(df), "dhash",
                               max_hamming=1, bits=64).collect()}
    assert got == {(1, 2, 1)}


def test_image_neardup_max_hamming_zero(spark):
    """max_hamming=0 (exact-duplicate images) makes the single block 64
    bits wide; 2**64 fits no JVM long — the key must be the fingerprint
    itself, not a modulo."""
    from weatherdb_spark.llm.multimodal import image_neardup_pairs

    p = bytes(range(72))
    df = spark.createDataFrame(
        [(1, p), (2, p), (3, bytes(reversed(p)))],
        "doc_id long, payload binary",
    )
    got = {tuple(r) for r in
           image_neardup_pairs(df, max_hamming=0).collect()}
    assert got == {(1, 2, 0)}


def test_compact_ivf_index_migrates_legacy_layout_first(spark, tmp_path):
    """Vacuuming a pre-r8 raw-parquet index must not version the RAW
    dirs under their legacy names (which stranded every reader): it
    migrates to the broker layout first, probes identical after."""
    import os

    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from weatherdb_spark.llm.similarity import (
        IVF_INVERTED_TABLE,
        _ivf_frames,
        build_ivf_index,
        compact_ivf_index,
        ivf_topk_indexed,
    )
    from weatherdb_spark.sources.testdata import load

    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    src = str(tmp_path / "src")
    build_ivf_index(emb, src, n_cells=8, seed=42)
    cent, inv = _ivf_frames(spark, src)
    legacy = str(tmp_path / "legacy")
    cent.write.parquet(os.path.join(legacy, "centroids"))
    # several files per cell leaf so vacuum has something to fold
    inv.repartition(6).write.partitionBy("cell").parquet(
        os.path.join(legacy, "inverted"))
    before = {tuple(r) for r in
              ivf_topk_indexed(spark, legacy, q, k=3, n_probe=4).collect()}

    compact_ivf_index(spark, legacy)
    from weatherdb_spark.broker import Broker
    assert Broker(spark, legacy).exists(IVF_INVERTED_TABLE)
    assert not os.path.isdir(os.path.join(legacy, "inverted"))
    after = {tuple(r) for r in
             ivf_topk_indexed(spark, legacy, q, k=3, n_probe=4).collect()}
    assert after == before and after


def test_partition_merge_rejects_unversioned_partitioned_table(spark, tmp_path):
    """A partitioned but MANIFEST-LESS table resolves its data path to
    the table root; linking 'the previous snapshot' from there would
    recurse into the freshly written version dir. Refused upfront."""
    import pytest as _pytest

    from weatherdb_spark.broker import Broker

    b = Broker(spark, str(tmp_path / "wh"))
    spark.createDataFrame([(1, 0), (2, 1)], "id long, cell int") \
        .write.partitionBy("cell").parquet(b.path("dimtab"))
    batch = spark.createDataFrame([(3, 0)], "id long, cell int")
    with _pytest.raises(ValueError, match="unversioned"):
        b.write_partition_merge("dimtab", batch, "cell")


def test_stream_into_corpus_threads_embedding_col(spark, tmp_path):
    """The streaming sink passes embedding_col through to append — a
    paraphrase arriving in a LATER micro-batch is rejected
    archive_semantic, not silently admitted."""
    import math
    import os
    import random

    import pandas as pd

    from weatherdb_spark.llm.corpus import CorpusStore, stream_into_corpus

    def unit(seed, jitter=0.0):
        rng = random.Random(seed)
        v = [rng.uniform(-1, 1) for _ in range(64)]
        if jitter:
            v = [x + jitter * ((i % 2) * 2 - 1) for i, x in enumerate(v)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame({
        "doc_id": [1], "text": ["the original phrasing of one idea"],
        "embedding": [str(unit(7))],
    }).to_json(src / "a.json", orient="records", lines=True)
    pd.DataFrame({
        "doc_id": [2], "text": ["a full rewrite sharing no words"],
        "embedding": [str(unit(7, jitter=0.001))],
    }).to_json(src / "b.json", orient="records", lines=True)
    os.utime(src / "a.json", (1_700_000_000, 1_700_000_000))
    os.utime(src / "b.json", (1_700_000_100, 1_700_000_100))

    from pyspark.sql import functions as F
    store = CorpusStore(spark, str(tmp_path / "wh"),
                        semantic_threshold=0.98)
    stream = (
        spark.readStream.schema("doc_id long, text string, embedding string")
        .option("maxFilesPerTrigger", 1).json(str(src))
        .withColumn(
            "embedding",
            F.from_json("embedding", "array<float>"),
        )
    )
    stream_into_corpus(stream, store, str(tmp_path / "ck"),
                       embedding_col="embedding")
    assert {r.doc_id for r in store.read().collect()} == {1}
    rej = {(r.doc_id, r.reason, r.blocked_by)
           for r in store.rejections().collect()}
    assert rej == {(2, "archive_semantic", 1)}


def test_bm25_dropped_terms_none_share_is_empty(spark):
    from weatherdb_spark.llm.search import bm25_dropped_terms

    docs = spark.createDataFrame([(1, "the the the")], "doc_id long, text string")
    queries = spark.createDataFrame([(1, "the")], "query_id long, query string")
    rep = bm25_dropped_terms(docs, queries, max_df_share=None)
    assert rep.count() == 0
    assert rep.columns == ["word", "doc_freq", "n_docs", "df_share"]
