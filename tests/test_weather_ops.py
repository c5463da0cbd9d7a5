"""Unit tests of the weather compound operators on small deterministic
fixtures, in the reference's invariant style (SURVEY.md §5): qc only where
raw exists, filled has no NAs where any donor has data, corr only where
filled exists."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.operators.fillup import (
    daily_adjust_p,
    interpolate_gaps,
    median_fill,
    rank_fill,
)
from weatherdb_spark.operators.qc import qc_et, qc_p, qc_t
from weatherdb_spark.operators.richter import (
    precipitation_type,
    richter_class,
    richter_correct,
    richter_parameters_df,
)

TS0 = dt.datetime(2024, 1, 1)


def _ts(i: int, step_min: int = 10) -> dt.datetime:
    return TS0 + dt.timedelta(minutes=step_min * i)


def test_qc_p_flags(spark):
    # station 1: 3 consecutive equal 0.5 values with qn!=3 at i=2..4;
    # isolated peak 6.0 at i=8; bound violation 55 at i=10; clean elsewhere
    rows = []
    vals = [0.0, 0.2, 0.5, 0.5, 0.5, 0.1, 0.0, 0.0, 6.0, 0.0, 55.0, 0.3]
    for i, v in enumerate(vals):
        rows.append((1, _ts(i), float(v), 1))
    ts_p = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double, qn smallint"
    )
    # daily table consistent (no failed days)
    ts_p_d = spark.createDataFrame(
        [(1, dt.date(2023, 12, 31), sum(vals))],
        "station_id int, timestamp date, raw double",
    )
    out = {r["timestamp"]: r["qc"] for r in qc_p(ts_p, ts_p_d).collect()}
    assert out[_ts(2)] is None and out[_ts(3)] is None and out[_ts(4)] is None
    assert out[_ts(8)] is None  # isolated peak
    assert out[_ts(10)] is None  # >= 50
    assert out[_ts(1)] == 0.2 and out[_ts(5)] == 0.1


def test_qc_p_failed_day(spark):
    # 10-min sums are all zero but the daily table reports rain -> whole
    # (shifted) day nulled (StationP.py:107-119)
    rows = [(1, _ts(i + 36), 0.0, 3) for i in range(144)]  # day starting 06:00
    ts_p = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double, qn smallint"
    )
    ts_p_d = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 5.0)], "station_id int, timestamp date, raw double"
    )
    out = qc_p(ts_p, ts_p_d)
    assert out.filter(F.col("qc").isNotNull()).count() == 0


def _meta(spark, n=6, elev=None):
    elev = elev or [100] * n
    rows = [(i + 1, float(i * 10000), 0.0, elev[i]) for i in range(n)]
    return spark.createDataFrame(
        rows, "station_id int, x_utm double, y_utm double, stationshoehe int"
    )


def _knn_line(spark, n=6, k=5):
    # stations on a line at 10 km spacing -> neighbor ranks by |i-j|
    from weatherdb_spark.operators.neighbors import knn_stations

    return knn_stations(_meta(spark, n), k=k)


def test_qc_t_outlier_and_inversion(spark):
    d = dt.date(2024, 1, 15)  # winter
    knn = _knn_line(spark, 6)
    ma = spark.createDataFrame(
        [(i, 10.0) for i in range(1, 7)], "station_id int, value double"
    )
    # all stations 5.0 except station 1 reads 15.0 (upper outlier)
    # and station 6 reads -5.0 (lower outlier)
    rows = [(1, d, 15.0), (2, d, 5.0), (3, d, 5.0), (4, d, 5.0), (5, d, 5.0), (6, d, -5.0)]
    ts_t = spark.createDataFrame(rows, "station_id int, timestamp date, raw double")
    meta_low = _meta(spark, 6)
    out = {r["station_id"]: r["qc"] for r in qc_t(ts_t, knn, ma, meta_low).collect()}
    assert out[1] is None and out[6] is None and out[3] == 5.0

    # same data but station 1 at 900 m in winter: upper test disabled
    meta_high = _meta(spark, 6, elev=[900, 100, 100, 100, 100, 100])
    out2 = {r["station_id"]: r["qc"] for r in qc_t(ts_t, knn, ma, meta_high).collect()}
    assert out2[1] == 15.0  # inversion protection
    assert out2[6] is None  # lower test still applies


def test_qc_et_rules(spark):
    d = dt.date(2024, 6, 15)
    knn = _knn_line(spark, 6)
    ma = spark.createDataFrame(
        [(i, 5.0) for i in range(1, 7)], "station_id int, value double"
    )
    # neighbors ~2.0; station 1 reads 5.0 (> 2*med and > 3) -> null;
    # station 6 reads 25 (> 20 bound) -> null; station 2 fine
    rows = [(1, d, 5.0), (2, d, 2.0), (3, d, 2.0), (4, d, 2.0), (5, d, 2.0), (6, d, 25.0)]
    ts_et = spark.createDataFrame(rows, "station_id int, timestamp date, raw double")
    out = {r["station_id"]: r["qc"] for r in qc_et(ts_et, knn, ma).collect()}
    assert out[1] is None and out[6] is None and out[2] == 2.0


def test_rank_fill_prefers_nearest_donor(spark):
    d0 = dt.date(2024, 1, 1)
    knn = _knn_line(spark, 4, k=3)
    ma = spark.createDataFrame(
        [(1, 100.0), (2, 50.0), (3, 100.0), (4, 100.0)], "station_id int, value double"
    )
    # station 1 has a hole on day 2; donor station 2 (rank 1) has data ->
    # regionalized by 100/50 = x2; on day 3 station 2 is also missing ->
    # station 3 (rank 2) fills at coef 1
    rows = [
        (1, d0, 1.0), (1, d0 + dt.timedelta(days=1), None), (1, d0 + dt.timedelta(days=2), None),
        (2, d0, 2.0), (2, d0 + dt.timedelta(days=1), 3.0), (2, d0 + dt.timedelta(days=2), None),
        (3, d0, 2.0), (3, d0 + dt.timedelta(days=1), 9.0), (3, d0 + dt.timedelta(days=2), 7.0),
        (4, d0, 2.0), (4, d0 + dt.timedelta(days=1), 9.0), (4, d0 + dt.timedelta(days=2), 8.0),
    ]
    facts = spark.createDataFrame(rows, "station_id int, timestamp date, qc double")
    out = {
        (r["station_id"], r["timestamp"]): (r["filled"], r["filled_by"])
        for r in rank_fill(facts, knn, ma, coef_sign="mult").collect()
    }
    assert out[(1, d0)] == (1.0, None)  # own value kept
    assert out[(1, d0 + dt.timedelta(days=1))] == (6.0, 2)  # 3.0 * 100/50
    assert out[(1, d0 + dt.timedelta(days=2))] == (7.0, 3)  # rank-2 donor
    # invariant: no NAs in filled where any donor has data
    assert all(v[0] is not None for v in out.values())


def test_median_fill_five_donors(spark):
    d = dt.date(2024, 1, 1)
    knn = _knn_line(spark, 7, k=6)
    ma = spark.createDataFrame(
        [(i, 10.0) for i in range(1, 8)], "station_id int, value double"
    )
    rows = [(1, d, None)] + [(i, d, float(i)) for i in range(2, 8)]
    facts = spark.createDataFrame(rows, "station_id int, timestamp date, qc double")
    out = {r["station_id"]: r for r in median_fill(facts, knn, ma, n_donors=5).collect()}
    # first 5 non-null donors in rank order: stations 2,3,4,5,6 -> values 2..6
    assert out[1]["filled"] == 4.0
    assert out[1]["filled_by"] == [2, 3, 4, 5, 6]


def test_interpolate_gaps_bounded(spark):
    rows = [
        (1, _ts(0), 1.0, None),
        (1, _ts(1), None, None),   # short gap -> interpolated
        (1, _ts(2), 4.0, None),
        (1, _ts(3), None, None),   # gap of 7 steps = 70 min > 1 hour -> stays
        (1, _ts(4), None, None),
        (1, _ts(5), None, None),
        (1, _ts(6), None, None),
        (1, _ts(7), None, None),
        (1, _ts(8), None, None),
        (1, _ts(9), 4.0, None),
    ]
    facts = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, filled double, filled_by smallint"
    )
    out = {r["timestamp"]: (r["filled"], r["filled_by"]) for r in
           interpolate_gaps(facts, max_gap="1 hour").collect()}
    assert out[_ts(1)] == (2.5, -1)
    assert out[_ts(4)][0] is None  # long gap untouched


def test_daily_adjust_p_scales_to_daily(spark):
    # one (shifted) day: 10-min filled values sum 4.0, daily raw 8.0 -> x2
    base = dt.datetime(2024, 1, 1, 6, 0)
    rows = [(1, base + dt.timedelta(minutes=10 * i), v) for i, v in
            enumerate([1.0, 0.0, 3.0, 0.0])]
    ts_p = spark.createDataFrame(rows, "station_id int, timestamp timestamp, filled double")
    ts_p_d = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 8.0)], "station_id int, timestamp date, raw double"
    )
    out = {r["timestamp"]: r["corr_base"] for r in daily_adjust_p(ts_p, ts_p_d).collect()}
    assert out[base] == 2.0
    # 3.0 at 6:20 sits between two zeros: scaling to 6.0 would create a
    # new isolated peak, so it is capped at 5 mm (tsb.filled = 0 AND
    # tsa.filled = 0 -> LEAST(filled*coef, 5mm), StationP.py:705-710)
    assert out[base + dt.timedelta(minutes=20)] == 5.0
    assert out[base + dt.timedelta(minutes=10)] == 0.0  # zeros untouched


def test_richter_class_bins(spark):
    df = spark.createDataFrame(
        [(0.0,), (2.9,), (3.0,), (6.9,), (7.0,), (11.9,), (12.0,), (25.0,)], "h double"
    )
    out = [r[0] for r in df.select(richter_class(F.col("h"))).collect()]
    assert out == [
        "no-protection", "no-protection", "little-protection", "little-protection",
        "protected", "protected", "heavy-protection", "heavy-protection",
    ]


def test_precipitation_type(spark):
    df = spark.createDataFrame(
        [(5.0, 6), (5.0, 12), (-1.0, 1), (1.0, 1)], "t double, m int"
    )
    out = [r[0] for r in df.select(precipitation_type(F.col("t"), F.col("m"))).collect()]
    assert out == ["precip_summer", "precip_winter", "snow", "mix"]


def test_richter_correct_formula(spark):
    # one station, one day, summer, temp 10 -> precip_summer, class
    # no-protection: delta = 0.345 * (2.0 ** 0.38); two wet intervals
    base = dt.datetime(2024, 6, 1, 0, 0)
    rows = [(1, base, 1.5), (1, base + dt.timedelta(minutes=10), 0.5),
            (1, base + dt.timedelta(minutes=20), 0.0)]
    ts_p = spark.createDataFrame(rows, "station_id int, timestamp timestamp, filled double")
    ts_t = spark.createDataFrame(
        [(1, dt.date(2024, 6, 1), 10.0)], "station_id int, timestamp date, filled double"
    )
    meta = spark.createDataFrame([(1, "no-protection")], "station_id int, richter_class string")
    out = richter_correct(ts_p, ts_t, meta, richter_parameters_df(spark))
    got = {r["timestamp"]: r["corr"] for r in out.collect()}
    delta = 0.345 * (2.0 ** 0.38)
    assert got[base] == pytest.approx(round(1.5 + delta / 2, 2))
    assert got[base + dt.timedelta(minutes=20)] == 0.0  # corr only where filled > 0


def test_rank_fill_seasonal_coefs(spark):
    # P winter/summer coefficients differ (StationBases.py:1406-1425)
    knn = _knn_line(spark, 2, k=1)
    ma = spark.createDataFrame(
        [(1, "wihy", 200.0), (1, "suhy", 100.0), (2, "wihy", 100.0), (2, "suhy", 100.0)],
        "station_id int, term string, value double",
    )
    rows = [
        (1, dt.date(2024, 1, 10), None),  # winter -> coef 200/100 = 2
        (1, dt.date(2024, 7, 10), None),  # summer -> coef 1
        (2, dt.date(2024, 1, 10), 3.0),
        (2, dt.date(2024, 7, 10), 3.0),
    ]
    facts = spark.createDataFrame(rows, "station_id int, timestamp date, qc double")
    out = {
        (r["station_id"], r["timestamp"]): r["filled"]
        for r in rank_fill(facts, knn, ma, coef_sign="mult", seasonal_ma=True).collect()
    }
    assert out[(1, dt.date(2024, 1, 10))] == 6.0
    assert out[(1, dt.date(2024, 7, 10))] == 3.0


def test_adjust_series_seasonal_p(spark):
    from weatherdb_spark.operators.aggregate import adjust_series_seasonal

    # two full years, one value per month; suhy months 4-9
    rows = []
    for y in (2020, 2021):
        for m in range(1, 13):
            rows.append((1, dt.date(y, m, 15), 2.0))
    df = spark.createDataFrame(rows, "station_id int, timestamp date, filled double")
    sma = spark.createDataFrame(
        [(1, "wihy", 24.0), (1, "suhy", 6.0)],
        "station_id int, term string, value double",
    )
    out = adjust_series_seasonal(df, sma, min_count=6).collect()
    # yearly sums per term = 12.0 -> pstat = 12; wihy: x*24/12 = 2x,
    # suhy: x*6/12 = x/2
    for r in out:
        if r.timestamp.month in (4, 5, 6, 7, 8, 9):
            assert r.term == "suhy" and r.adj == 1.0
        else:
            assert r.term == "wihy" and r.adj == 4.0

    # min_count above the data -> no qualifying year -> adj NULL
    out2 = adjust_series_seasonal(df, sma, min_count=7).collect()
    assert all(r.adj is None for r in out2)


def test_adjust_series_truncates_partial_years(spark):
    from weatherdb_spark.operators.aggregate import adjust_series

    # 2020 full (Jan 1 - Dec 31 present), 2021 partial (starts May ->
    # stats year only 2020); series values: 2020 constant 10, 2021
    # constant 99 (which must NOT pollute the period statistic)
    rows = [(1, dt.date(2020, 1, 1), 10.0), (1, dt.date(2020, 12, 20), 10.0)]
    rows += [(1, dt.date(2021, 5, 1), 99.0), (1, dt.date(2021, 6, 1), 99.0)]
    df = spark.createDataFrame(rows, "station_id int, timestamp date, filled double")
    ma = spark.createDataFrame([(1, 40.0)], "station_id int, value double")
    out = {
        (r.timestamp.year, r.timestamp.month): r.adj
        for r in adjust_series(
            df, ma, coef_sign="mult", agg_fun="sum", min_count=1,
            truncate_years=True,
        ).collect()
    }
    # pstat = sum(2020) = 20 (2021 truncated: series max is 2021-06-01 <
    # Dec 15 -> last full year is 2020); adj = v * 40 / 20 = 2v
    assert out[(2020, 1)] == 20.0
    assert out[(2021, 5)] == 198.0  # adjustment still applies to all rows


# ------------------------------------------------------------- S5 CRS

def test_crs_roundtrip_and_invariants(spark):
    """wgs84_to_utm/utm_to_wgs84 (S5 meta transform twin of the
    reference's PostGIS 4326<->25832, StationsBase.py:147-222). Checked
    against projection invariants plus an independent geodesic
    cross-check (planar UTM distance vs haversine)."""
    import math

    from weatherdb_spark.functions.spatial import utm_to_wgs84, wgs84_to_utm

    pts = [
        (9.0, 48.0),      # central meridian of zone 32
        (7.8522, 47.9959),  # Freiburg
        (10.8978, 48.3705),
        (6.1, 51.0),
        (11.9, 54.1),
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    x, y = wgs84_to_utm(F.col("lon"), F.col("lat"))
    df = df.withColumn("x", x).withColumn("y", y)
    lon2, lat2 = utm_to_wgs84(F.col("x"), F.col("y"))
    rows = df.withColumn("lon2", lon2).withColumn("lat2", lat2).collect()

    for r in rows:
        # roundtrip closes to ~1e-9 deg (series is sub-mm inside a zone)
        assert abs(r.lon2 - r.lon) < 1e-7 and abs(r.lat2 - r.lat) < 1e-7
        assert 5_200_000 < r.y < 6_100_000  # Germany northings
    # on the central meridian the easting is exactly the 500 km offset
    assert abs(rows[0].x - 500_000.0) < 1e-3

    # independent check 1: northing on the central meridian must equal
    # k0 * meridian arc length, with the arc computed from the CLASSIC
    # sin(2kφ) series (a different published expansion than the Krueger
    # xi/eta series under test)
    a_ax, n = 6378137.0, (1 / 298.257222101) / (2 - 1 / 298.257222101)
    phi = math.radians(48.0)
    arc = a_ax / (1 + n) * (
        (1 + n**2 / 4 + n**4 / 64) * phi
        - 1.5 * (n - n**3 / 8) * math.sin(2 * phi)
        + 15 / 16 * (n**2 - n**4 / 4) * math.sin(4 * phi)
        - 35 / 48 * n**3 * math.sin(6 * phi)
    )
    assert abs(rows[0].y - 0.9996 * arc) < 0.01

    # independent check 2: planar UTM distance vs spherical haversine.
    # Loose tolerance: the sphere-vs-ellipsoid model gap alone is up to
    # ~0.3%, dwarfing the UTM scale error (<=0.04%).
    (a, b) = rows[1], rows[2]
    planar = math.hypot(a.x - b.x, a.y - b.y)
    R = 6371008.8
    ph1, ph2 = math.radians(a.lat), math.radians(b.lat)
    dph, dlm = ph2 - ph1, math.radians(b.lon - a.lon)
    h = math.sin(dph / 2) ** 2 + math.cos(ph1) * math.cos(ph2) * math.sin(dlm / 2) ** 2
    hav = 2 * R * math.asin(math.sqrt(h))
    assert abs(planar - hav) / hav < 5e-3


def test_update_meta_derives_utm_and_wgs(spark, tmp_path):
    """S5: update_meta fills in whichever coordinate pair is missing."""
    from weatherdb_spark.broker import Broker

    b = Broker(spark, str(tmp_path / "wh"))
    b.update_meta(spark.createDataFrame(
        [(1, "p", 9.0, 48.0)], "station_id int, parameter string, lon double, lat double"
    ))
    m = b.read("meta").first()
    assert abs(m.x_utm - 500_000.0) < 0.01
    assert m.y_utm > 5_000_000

    b2 = Broker(spark, str(tmp_path / "wh2"))
    b2.update_meta(spark.createDataFrame(
        [(1, "p", 500_000.0, 5_316_000.0)],
        "station_id int, parameter string, x_utm double, y_utm double",
    ))
    m2 = b2.read("meta").first()
    assert abs(m2.lon - 9.0) < 1e-4


def test_hole_census_sentinel_bounds(spark):
    """A5: explicit period bounds count leading/trailing holes via
    sentinel rows (StationBases.py:2008-2014); the default (crop) sees
    only interior gaps; meta_period bounds per station."""
    import datetime as dt

    from weatherdb_spark.operators.aggregate import hole_census

    rows = [
        (1, dt.datetime(2024, 1, 10) + dt.timedelta(hours=i), 1.0)
        for i in range(241)  # Jan 10 .. Jan 20, hourly, no interior gaps
    ]
    df = spark.createDataFrame(rows, "station_id int, timestamp timestamp, raw double")

    crop = hole_census(df, gap_thresholds=("1 day",)).first()
    assert crop["holes_ge_1_day"] == 0

    bounded = hole_census(
        df, gap_thresholds=("1 day",),
        period=("2024-01-01 00:00:00", "2024-02-01 00:00:00"),
    ).first()
    assert bounded["holes_ge_1_day"] == 2  # 9-day lead + 12-day tail

    mp = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 25))],
        "station_id int, period_from timestamp, period_until timestamp",
    )
    metabound = hole_census(df, gap_thresholds=("1 day",), meta_period=mp).first()
    assert metabound["holes_ge_1_day"] == 2  # 5-day lead + 5-day tail

    # bounds tighter than the data crop observations too
    tight = hole_census(
        df, gap_thresholds=("12 hours",),
        period=("2024-01-12 00:00:00", "2024-01-14 00:00:00"),
    ).first()
    assert tight["holes_ge_12_hours"] == 0


def test_qc_p_qn_gate_on_run_head(spark):
    """qn != 3 gates the run HEAD only (StationP.py:152-166): members
    2-3 with qn=3 are still flagged when the head has qn!=3, and a run
    whose head has qn=3 survives unless a later head qualifies."""
    # run A (i=1..3): head qn=1, members qn=3 -> ALL flagged
    # run B (i=5..7): all qn=3 -> no qualifying head -> kept
    vals = [0.0, 0.5, 0.5, 0.5, 0.0, 0.7, 0.7, 0.7, 0.2]
    qns = [1, 1, 3, 3, 1, 3, 3, 3, 1]
    rows = [(1, _ts(i), float(v), q) for i, (v, q) in enumerate(zip(vals, qns))]
    ts_p = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double, qn smallint"
    )
    ts_p_d = spark.createDataFrame(
        [(1, dt.date(2023, 12, 31), sum(vals))],
        "station_id int, timestamp date, raw double",
    )
    out = {r["timestamp"]: r["qc"] for r in qc_p(ts_p, ts_p_d).collect()}
    assert out[_ts(1)] is None and out[_ts(2)] is None and out[_ts(3)] is None
    assert out[_ts(5)] == 0.7 and out[_ts(6)] == 0.7 and out[_ts(7)] == 0.7


def test_qc_et_inversion_gate(spark):
    """QC-ET: stations above 800 m keep high winter readings (only the
    lower test applies, StationET.py:72-85); in summer both tests apply."""
    knn = _knn_line(spark, 6)
    ma = spark.createDataFrame(
        [(i, 5.0) for i in range(1, 7)], "station_id int, value double"
    )
    meta_high = _meta(spark, 6, elev=[900, 100, 100, 100, 100, 100])

    def run(d):
        rows = [(1, d, 5.0)] + [(i, d, 2.0) for i in range(2, 7)]
        ts_et = spark.createDataFrame(rows, "station_id int, timestamp date, raw double")
        return {r["station_id"]: r["qc"] for r in
                qc_et(ts_et, knn, ma, meta_high).collect()}

    winter = run(dt.date(2024, 1, 15))
    assert winter[1] == 5.0  # upper test disabled above 800 m in winter
    summer = run(dt.date(2024, 6, 15))
    assert summer[1] is None  # upper test applies in summer
    # low-elevation station keeps both tests in winter
    meta_low = _meta(spark, 6)
    rows = [(1, dt.date(2024, 1, 15), 5.0)] + [
        (i, dt.date(2024, 1, 15), 2.0) for i in range(2, 7)
    ]
    ts_et = spark.createDataFrame(rows, "station_id int, timestamp date, raw double")
    low = {r["station_id"]: r["qc"] for r in qc_et(ts_et, knn, ma, meta_low).collect()}
    assert low[1] is None


def test_qc_p_chunked_window_exact_at_year_boundary(spark):
    """qc_p's lag/lead windows partition by (station, year) with 2-row
    boundary context (skew guard) — a 3-run and an isolated peak
    straddling midnight Dec 31 -> Jan 1 must flag exactly as with a
    station-wide window."""
    import datetime as dt

    from weatherdb_spark.operators.qc import qc_p

    start = dt.datetime(2023, 12, 31, 22, 0)
    rows = []
    for i in range(48):  # 22:00 Dec 31 .. 05:50 Jan 1
        ts = start + dt.timedelta(minutes=10 * i)
        # 3-run of equal values 23:50, 00:00, 00:10 (qn=1 -> flagged);
        # isolated peak at 02:00 Jan 1 (0 neighbors)
        if ts in (dt.datetime(2023, 12, 31, 23, 50),
                  dt.datetime(2024, 1, 1, 0, 0),
                  dt.datetime(2024, 1, 1, 0, 10)):
            v = 0.7
        elif ts == dt.datetime(2024, 1, 1, 2, 0):
            v = 9.0
        else:
            v = 0.0
        rows.append((1, ts, v, 1))
    ts_p = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double, qn short"
    )
    ts_p_d = spark.createDataFrame(
        [], "station_id int, timestamp timestamp, raw double"
    )
    out = {r["timestamp"]: r["qc"] for r in qc_p(ts_p, ts_p_d).collect()}
    assert len(out) == 48
    # all three run members flagged, including across the boundary
    assert out[dt.datetime(2023, 12, 31, 23, 50)] is None
    assert out[dt.datetime(2024, 1, 1, 0, 0)] is None
    assert out[dt.datetime(2024, 1, 1, 0, 10)] is None
    # isolated peak flagged; plain zeros survive
    assert out[dt.datetime(2024, 1, 1, 2, 0)] is None
    assert out[dt.datetime(2024, 1, 1, 1, 0)] == 0.0


def test_hole_census_chunked_gaps_across_empty_years(spark):
    """hole_census partitions its gap window by (station, year) with a
    per-year min/max summary supplying the cross-chunk gaps — a gap
    spanning a wholly-empty year must still count once, exactly."""
    import datetime as dt

    from weatherdb_spark.operators.aggregate import hole_census

    rows = [
        # observations in 2020, nothing in 2021, resume mid-2022:
        # one interior gap 2020-06-10 .. 2022-03-01 (~630 days)
        (1, dt.datetime(2020, 6, 1), 1.0),
        (1, dt.datetime(2020, 6, 10), 1.0),
        (1, dt.datetime(2022, 3, 1), 1.0),
        (1, dt.datetime(2022, 3, 2), 1.0),
        # within-year gap of 20 days in 2022
        (1, dt.datetime(2022, 3, 22), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double"
    )
    out = hole_census(
        df, gap_thresholds=("2 weeks", "4 weeks", "600 days")
    ).first()
    assert out["holes_ge_2_weeks"] == 2      # 630d + 20d
    assert out["holes_ge_4_weeks"] == 1      # 630d only
    assert out["holes_ge_600_days"] == 1     # counted exactly once
