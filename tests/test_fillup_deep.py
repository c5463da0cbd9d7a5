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
