"""Deep-fillup semantics: the full distance-bounded candidate set, the
cascade optimization's exactness, and the reference invariant that no hole
survives while ANY candidate station has data at that timestamp
(reference tests/test_initDB.py:146-219 'no NAs in filled')."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.operators.fillup import median_fill, rank_fill
from weatherdb_spark.operators.neighbors import knn_stations


def _meta(spark, n=8):
    # stations on a line, 1 km apart: station i's nearest donors are its
    # line neighbors, so nulling stations 1..6 starves station 0's top-5
    rows = [(i, float(i * 1000), 0.0, 100.0) for i in range(n)]
    return spark.createDataFrame(
        rows, "station_id int, x_utm double, y_utm double, stationshoehe double"
    )


def _facts(spark, n=8, days=4):
    # station 0: always NULL (the station to fill)
    # stations 1..6 (its 6 nearest): NULL on day 0, data otherwise
    # station 7 (farthest): always has data
    rows = []
    for s in range(n):
        for d in range(days):
            ts = dt.date(2024, 1, 1) + dt.timedelta(days=d)
            if s == 0 or (1 <= s <= 6 and d == 0):
                val = None
            else:
                val = float(10 * s + d)
            rows.append((s, ts, val))
    return spark.createDataFrame(rows, "station_id int, timestamp date, qc double")


def _ma(spark, n=8):
    return spark.createDataFrame(
        [(i, 50.0) for i in range(n)], "station_id int, value double"
    )


@pytest.fixture(scope="module")
def starved(spark):
    return _meta(spark), _facts(spark), _ma(spark)


def test_rank_fill_draws_beyond_k5_when_starved(spark, starved):
    meta, facts, ma = starved
    knn_all = knn_stations(meta, k=None, elevation_weighted=False)
    out = rank_fill(facts, knn_all, ma, coef_sign="mult", base_col="qc",
                    round_digits=None).collect()
    day0 = [r for r in out if r.station_id == 0 and r.timestamp.day == 1][0]
    # stations 1..6 are null on day 0 -> the only donor is station 7
    assert day0.filled == 70.0
    assert day0.filled_by == 7
    # other days: nearest donor (station 1) wins
    day1 = [r for r in out if r.station_id == 0 and r.timestamp.day == 2][0]
    assert day1.filled_by == 1
    # reference invariant: no NAs in filled while any station has data
    assert all(r.filled is not None for r in out)


def test_rank_fill_cascade_equals_unbounded(spark, starved):
    meta, facts, ma = starved
    knn_all = knn_stations(meta, k=None, elevation_weighted=False)
    kw = dict(coef_sign="mult", base_col="qc", round_digits=None)
    full = rank_fill(facts, knn_all, ma, **kw)
    for k in (1, 2, 5, 100):
        casc = rank_fill(facts, knn_all, ma, cascade_k=k, **kw)
        a = sorted(map(tuple, full.collect()))
        b = sorted(map(tuple, casc.collect()))
        assert a == b, f"cascade_k={k} diverges from unbounded"


def test_median_fill_deep_and_near_far(spark, starved):
    meta, facts, ma = starved
    knn_all = knn_stations(meta, k=None, elevation_weighted=False)
    out = median_fill(
        facts, knn_all, ma, n_donors=5, base_col="qc", value_cols=("qc",),
        out_cols=("filled",), round_digits=None,
    ).collect()
    day0 = [r for r in out if r.station_id == 0 and r.timestamp.day == 1][0]
    # only donor on day 0 is station 7 -> median of one
    assert day0.filled == 70.0
    assert list(day0.filled_by) == [7]
    day1 = [r for r in out if r.station_id == 0 and r.timestamp.day == 2][0]
    # donors 1..5 in rank order (6 & 7 beyond the 5-donor quota)
    assert list(day1.filled_by) == [1, 2, 3, 4, 5]
    assert day1.filled == 31.0  # median of 11,21,31,41,51 (+0 coef diff)

    # near/far: with near_dist_m = 2.5 km, station 0's near donors are 1..2;
    # on day 0 both are null -> falls back to the single nearest far donor
    out_nf = median_fill(
        facts, knn_all, ma, n_donors=5, base_col="qc", value_cols=("qc",),
        out_cols=("filled",), round_digits=None, near_dist_m=2500.0,
    ).collect()
    d0 = [r for r in out_nf if r.station_id == 0 and r.timestamp.day == 1][0]
    assert list(d0.filled_by) == [7]
    d1 = [r for r in out_nf if r.station_id == 0 and r.timestamp.day == 2][0]
    # near donors only: stations 1 and 2
    assert list(d1.filled_by) == [1, 2]
    assert d1.filled == 16.0  # median of 11, 21


def test_median_fill_cascade_equals_unbounded(spark, starved):
    meta, facts, ma = starved
    knn_all = knn_stations(meta, k=None, elevation_weighted=False)
    kw = dict(n_donors=5, base_col="qc", value_cols=("qc",),
              out_cols=("filled",), round_digits=None, near_dist_m=2500.0)
    full = median_fill(facts, knn_all, ma, **kw)

    def norm(df):
        return sorted(
            (r.station_id, r.timestamp, r.filled,
             tuple(r.filled_by) if r.filled_by is not None else None)
            for r in df.collect()
        )

    a = norm(full)
    for k in (1, 3, 6, 100):
        b = norm(median_fill(facts, knn_all, ma, cascade_k=k, **kw))
        assert a == b, f"cascade_k={k} diverges from unbounded"


def test_median_fill_overwrites_extra_cols_on_base_null(spark):
    # StationT.py:138-143: where filled (=qc) is NULL the after-loop UPDATE
    # sets filled_min from donor medians even if raw_min itself is present
    meta = _meta(spark, n=3)
    ma = _ma(spark, n=3)
    rows = [
        (0, dt.date(2024, 1, 1), None, 5.0),   # qc null but raw_min present
        (1, dt.date(2024, 1, 1), 20.0, 18.0),
        (2, dt.date(2024, 1, 1), 30.0, 28.0),
    ]
    facts = spark.createDataFrame(
        rows, "station_id int, timestamp date, qc double, raw_min double"
    )
    knn_all = knn_stations(meta, k=None, elevation_weighted=False)
    out = median_fill(
        facts, knn_all, ma, n_donors=5, base_col="qc",
        value_cols=("qc", "raw_min"), out_cols=("filled", "filled_min"),
        round_digits=None,
    ).collect()
    r0 = [r for r in out if r.station_id == 0][0]
    assert r0.filled == 25.0        # median of donors 20, 30
    assert r0.filled_min == 23.0    # median of donor raw_min 18, 28 — NOT 5.0
    r1 = [r for r in out if r.station_id == 1][0]
    assert r1.filled_min == 18.0    # base non-null: keeps its own raw_min


def test_daily_adjust_chunked_window_exact_at_year_boundary(spark):
    """daily_adjust_p's lag/lead window partitions by (station, year)
    with boundary-row duplication (skew guard: a station-only window
    puts a century of 10-min history in one task). The chunking must be
    invisible: a peak test straddling midnight Dec 31 -> Jan 1 sees the
    same adjacent rows as a station-wide window."""
    import datetime as dt

    from weatherdb_spark.operators.fillup import daily_adjust_p

    start = dt.datetime(2023, 12, 31, 20, 0)
    rows = []
    for i in range(72):  # 20:00 Dec 31 .. 07:50 Jan 1, crosses midnight
        ts = start + dt.timedelta(minutes=10 * i)
        # isolated peaks at the last slot of 2023 and the first of 2024:
        # the peak cap must see the 0 neighbors ACROSS the year boundary
        if ts == dt.datetime(2023, 12, 31, 23, 50):
            v = 4.0
        elif ts == dt.datetime(2024, 1, 1, 0, 10):
            v = 6.0
        else:
            v = 0.0
        rows.append((1, ts, v))
    ts_p = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, filled double"
    )
    # both shifted days (5h50 grouping) get a daily value -> coef != 1
    ts_p_d = spark.createDataFrame(
        [(1, dt.datetime(2023, 12, 31), 20.0),
         (1, dt.datetime(2024, 1, 1), 30.0)],
        "station_id int, timestamp timestamp, raw double",
    )
    out = {r["timestamp"]: r["corr_base"]
           for r in daily_adjust_p(ts_p, ts_p_d).collect()}
    assert len(out) == 72  # context duplicates dropped
    # shifted day of both peaks is 2023-12-31 (22:00..05:40 window):
    # day sum = 10.0, coef = 20/10 = 2 -> scaled = 8.0/12.0, but both are
    # isolated peaks (0 on each side, across the boundary) -> cap at 5.0
    assert out[dt.datetime(2023, 12, 31, 23, 50)] == 5.0
    assert out[dt.datetime(2024, 1, 1, 0, 10)] == 5.0
    # a zero row keeps its value (0 * coef = 0)
    assert out[dt.datetime(2024, 1, 1, 0, 0)] == 0.0


def test_interpolate_gaps_chunked_window_exact_at_year_boundary(spark):
    """interpolate_gaps partitions its bracket windows by (station, year)
    with max_gap context overlap — a hole straddling midnight Dec 31 ->
    Jan 1 must interpolate exactly as with a station-wide window, and a
    bracket wider than max_gap must stay unfilled."""
    import datetime as dt

    from weatherdb_spark.operators.fillup import interpolate_gaps

    start = dt.datetime(2023, 12, 31, 22, 0)
    rows = []
    for i in range(48):  # 22:00 Dec 31 .. 05:50 Jan 1
        ts = start + dt.timedelta(minutes=10 * i)
        # hole 23:40 .. 00:10 (4 slots) bracketed by 23:30=3.0, 00:20=8.0
        # (span 50 min <= 1 hour) and a WIDE hole 01:00..02:50 (span 2h)
        if dt.datetime(2023, 12, 31, 23, 40) <= ts <= dt.datetime(2024, 1, 1, 0, 10):
            v = None
        elif dt.datetime(2024, 1, 1, 1, 0) <= ts <= dt.datetime(2024, 1, 1, 2, 50):
            v = None
        elif ts == dt.datetime(2023, 12, 31, 23, 30):
            v = 3.0
        elif ts == dt.datetime(2024, 1, 1, 0, 20):
            v = 8.0
        else:
            v = 1.0
        rows.append((1, ts, v))
    facts = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, filled double"
    )
    out = {r["timestamp"]: (r["filled"], r["filled_by"])
           for r in interpolate_gaps(facts, max_gap="1 hour").collect()}
    assert len(out) == 48
    # linear 3.0 -> 8.0 over 5 steps across the boundary, filled_by = -1
    assert out[dt.datetime(2023, 12, 31, 23, 40)] == (4.0, -1)
    assert out[dt.datetime(2023, 12, 31, 23, 50)] == (5.0, -1)
    assert out[dt.datetime(2024, 1, 1, 0, 0)] == (6.0, -1)
    assert out[dt.datetime(2024, 1, 1, 0, 10)] == (7.0, -1)
    # the 2-hour hole exceeds max_gap: stays NULL
    assert out[dt.datetime(2024, 1, 1, 2, 0)] == (None, None)


def test_hole_semi_modes_identical_and_autosized(spark, starved):
    """hole_semi True / False / auto produce identical fills (the semi
    join is an optimization, never a semantic change), and the auto probe
    picks the semi join exactly when the measured hole fraction is at or
    below the documented threshold."""
    from weatherdb_spark.operators.fillup import (
        HOLE_SEMI_MAX_FRACTION,
        _resolve_hole_semi,
    )

    meta, facts, ma = starved
    knn_all = knn_stations(meta, k=None, elevation_weighted=False)
    kw = dict(coef_sign="mult", base_col="qc", round_digits=None, cascade_k=2)
    outs = [
        sorted(map(tuple, rank_fill(facts, knn_all, ma, hole_semi=hs, **kw).collect()))
        for hs in (True, False, None)
    ]
    assert outs[0] == outs[1] == outs[2]

    mkw = dict(n_donors=5, base_col="qc", value_cols=("qc",),
               out_cols=("filled",), round_digits=None, near_dist_m=2500.0)
    mouts = [
        sorted(
            (r.station_id, r.timestamp, r.filled,
             tuple(r.filled_by) if r.filled_by is not None else None)
            for r in median_fill(facts, knn_all, ma, hole_semi=hs, **mkw).collect()
        )
        for hs in (True, False, None)
    ]
    assert mouts[0] == mouts[1] == mouts[2]

    # the starved fixture is 10/32 holes (31%) -> under the 35% threshold
    assert _resolve_hole_semi(facts, "qc", None) is True
    # explicit values bypass the probe entirely
    assert _resolve_hole_semi(facts, "qc", False) is False
    # an all-holes frame must not semi join
    all_null = facts.withColumn("qc", F.lit(None).cast("double"))
    assert _resolve_hole_semi(all_null, "qc", None) is False
    assert 0.0 < HOLE_SEMI_MAX_FRACTION < 1.0


def test_interpolate_gaps_long_max_gap_spans_multiple_years(spark):
    """max_gap beyond 365 days falls back to the plain per-station
    window: a bracket spanning two year boundaries still interpolates
    (the one-chunk context of the skew-guard path could not see it)."""
    import datetime as dt

    from weatherdb_spark.operators.fillup import interpolate_gaps

    rows = [
        (1, dt.datetime(2022, 12, 1), 10.0),
        # holes clear through 2023 into 2024
        (1, dt.datetime(2023, 6, 1), None),
        (1, dt.datetime(2024, 1, 10), None),
        (1, dt.datetime(2024, 2, 4), 20.0),  # 430 days after the prev value
    ]
    facts = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, filled double"
    )
    out = {
        r.timestamp: r.filled
        for r in interpolate_gaps(facts, max_gap="500 days").collect()
    }
    assert out[dt.datetime(2023, 6, 1)] is not None
    assert out[dt.datetime(2024, 1, 10)] is not None
    assert 10.0 < out[dt.datetime(2023, 6, 1)] < out[dt.datetime(2024, 1, 10)] < 20.0
    # and a SHORT max_gap must not fill a 430-day bracket
    strict = {
        r.timestamp: r.filled
        for r in interpolate_gaps(facts, max_gap="2 days").collect()
    }
    assert strict[dt.datetime(2023, 6, 1)] is None


def test_median_fill_near_cascade_equals_unbounded(spark, starved):
    """The NEAR-side cascade (nearest near_cascade_k ranks first, full
    near set only for timestamps below the donor quota) is value-
    identical to the one-pass near aggregation at every k — the rank-
    contiguity argument, exercised where near donors are dense (day>0:
    6 near donors for station 0) AND sparse (day 0: none near, far
    fallback) AND partially present."""
    meta, facts, ma = starved
    knn_all = knn_stations(meta, k=None, elevation_weighted=False)
    for near_dist in (2500.0, 6500.0):
        kw = dict(n_donors=3, base_col="qc", value_cols=("qc",),
                  out_cols=("filled",), round_digits=None,
                  near_dist_m=near_dist)
        def norm(df):
            return sorted(
                (r.station_id, r.timestamp, r.filled,
                 tuple(r.filled_by) if r.filled_by is not None else None)
                for r in df.collect()
            )
        a = norm(median_fill(facts, knn_all, ma, **kw))
        for k in (1, 2, 4, 50, "auto"):
            for hole_semi in (True, False):
                b = norm(median_fill(facts, knn_all, ma,
                                     near_cascade_k=k, hole_semi=hole_semi,
                                     **kw))
                assert a == b, (
                    f"near_cascade_k={k} hole_semi={hole_semi} "
                    f"near_dist={near_dist} diverges"
                )


def test_near_cascade_k_without_near_dist_raises(spark, starved):
    """An explicit int near_cascade_k only exists inside the near branch;
    silently ignoring it hides a misconfiguration — it must raise.
    'auto' stays a no-op (the gate has nothing to decide without a near
    radius) and bad values fail loudly."""
    meta, facts, ma = starved
    knn_all = knn_stations(meta, k=None, elevation_weighted=False)
    kw = dict(base_col="qc", value_cols=("qc",), out_cols=("filled",))
    with pytest.raises(ValueError, match="near_dist_m"):
        median_fill(facts, knn_all, ma, near_cascade_k=4, **kw)
    with pytest.raises(ValueError, match="positive int"):
        median_fill(facts, knn_all, ma, near_cascade_k="many", **kw)
    with pytest.raises(ValueError, match="positive int"):
        median_fill(facts, knn_all, ma, near_cascade_k=0,
                    near_dist_m=5000.0, **kw)
    # 'auto' without a near radius: valid, decides nothing, still fills
    out = median_fill(facts, knn_all, ma, near_cascade_k="auto", **kw)
    assert out.filter(F.col("filled").isNotNull()).count() > 0


def test_near_cascade_k_rejects_bool(spark, starved):
    """bool is an int subclass: True must not silently configure a
    degenerate rank<=1 cascade head."""
    meta, facts, ma = starved
    knn_all = knn_stations(meta, k=None, elevation_weighted=False)
    with pytest.raises(ValueError, match="positive int"):
        median_fill(facts, knn_all, ma, near_cascade_k=True,
                    near_dist_m=5000.0, base_col="qc",
                    value_cols=("qc",), out_cols=("filled",))
