"""Property-based equivalence proofs (SURVEY.md §7.4 'known hard parts').

The reference fills gaps with an iterative PL/pgSQL loop: per neighbor in
distance order, UPDATE every still-NULL timestamp
(StationBases.py:1573-1638). Our engine re-derives this declaratively as
"first non-null regionalized donor in rank order" (operators/fillup.py).
These tests pit the Spark operators against straightforward Python loop
implementations of the reference semantics on randomized gap-heavy
fixtures — plus TimestampPeriod algebra laws.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from weatherdb_spark.period import TimestampPeriod

# ------------------------------------------------------------ TimestampPeriod

_bound = st.one_of(
    st.none(),
    st.datetimes(min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2030, 1, 1)),
)


def _periods():
    return st.builds(TimestampPeriod, _bound, _bound)


@given(_periods(), _periods())
def test_period_union_commutative(a, b):
    for how in ("outer", "inner"):
        assert a.union(b, how) == b.union(a, how)


@given(_periods(), _periods())
def test_period_inner_inside_outer(a, b):
    inner = a.union(b, "inner")
    outer = a.union(b, "outer")
    if not inner.is_empty() and not inner.has_NaT() and not outer.has_NaT():
        assert inner.inside(outer)


@given(_periods(), _periods())
def test_period_comparison_duality(a, b):
    # containment comparisons mirror: a < b iff b > a, and both agree
    # with inside/contains (TimestampPeriod.py:173-184)
    assert (a < b) == (b > a) == a.inside(b)
    assert (a <= b) == (b >= a)
    # copies compare equal and mutate independently
    c = a.copy()
    assert c == a and (c != a) is False
    c["start"] = dt.datetime(1970, 1, 1)
    assert c.start != a.start or a.start == dt.datetime(1970, 1, 1)
    # interval/middle bracket the bounds on fully-bounded ORDERED periods
    # (the constructor, like the reference's, does not forbid start > end)
    if not a.has_NaT() and a.start <= a.end:
        mid = a.get_middle()
        assert a.start <= mid <= a.end
        assert a.get_interval() == a.end - a.start


# ------------------------------------------------------- scaled-int units

@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.one_of(
        st.none(),
        st.floats(min_value=-9999.99, max_value=9999.99,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=1, max_size=30,
))
def test_units_roundtrip_within_half_storage_ulp(spark, values):
    """to_db_unit -> from_db_unit must stay within half a storage step
    (0.5/decimals) of the original for any representable value, and keep
    NULLs (reference scaled-int storage, StationBases.py:1080-1082)."""
    from weatherdb_spark.functions.units import from_db_unit, to_db_unit

    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=i), v)
         for i, v in enumerate(values)],
        "station_id int, timestamp timestamp, raw double",
    )
    back = {
        r["station_id"]: r["raw"]
        for r in from_db_unit(to_db_unit(df, "p"), "p").collect()
    }
    for i, v in enumerate(values):
        if v is None:
            assert back[i] is None
        else:
            assert abs(back[i] - v) <= 0.5 / 100 + 1e-9, (v, back[i])


@given(_periods())
def test_period_union_idempotent(a):
    # degenerate start == end collapses to empty (reference start >= end
    # check); otherwise union with self is identity
    for how in ("outer", "inner"):
        got = a.union(a, how)
        if a.start is not None and a.end is not None and a.start >= a.end:
            assert got.is_empty()
        else:
            assert got == a


# ----------------------------------------------------- fillup loop equivalence

N_STATIONS = 4
N_TS = 12


def _r(x: float, digits: int) -> float:
    """HALF_UP rounding — Spark's F.round (and PostgreSQL's round), NOT
    Python's round-half-even."""
    import decimal

    q = decimal.Decimal(10) ** -digits
    return float(decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP))


def _naive_rank_fill(vals, knn, ma, coef_sign="mult", round_digits=2):
    """The reference's iterative semantics, verbatim: walk neighbors in
    rank order, fill every still-NULL timestamp from that neighbor
    (StationBases.py:1573-1638)."""
    filled = {k: v for k, v in vals.items()}
    filled_by = {}
    for s in range(N_STATIONS):
        for nb in knn.get(s, []):
            for t in range(N_TS):
                if filled.get((s, t)) is None:
                    donor = vals.get((nb, t))
                    if donor is not None:
                        if coef_sign == "mult":
                            reg = donor * ma[s] / ma[nb]
                        else:
                            reg = donor + (ma[s] - ma[nb])
                        filled[(s, t)] = _r(reg, round_digits)
                        filled_by[(s, t)] = nb
    return filled, filled_by


@st.composite
def _fixtures(draw):
    vals = {}
    for s in range(N_STATIONS):
        for t in range(N_TS):
            if draw(st.integers(0, 2)) == 0:  # ~1/3 holes
                vals[(s, t)] = None
            else:
                vals[(s, t)] = draw(st.integers(0, 50)) / 2.0
    # neighbor lists: random subsets in random order (rank = list position)
    knn = {}
    for s in range(N_STATIONS):
        others = [x for x in range(N_STATIONS) if x != s]
        knn[s] = draw(st.permutations(others))[: draw(st.integers(1, N_STATIONS - 1))]
    ma = {s: float(draw(st.integers(40, 60))) for s in range(N_STATIONS)}
    return vals, knn, ma


@pytest.mark.parametrize("coef_sign", ["mult", "add"])
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=_fixtures())
def test_rank_fill_matches_reference_loop(spark, coef_sign, data):
    from pyspark.sql import functions as F

    from weatherdb_spark.operators.fillup import rank_fill

    vals, knn, ma = data
    base = dt.datetime(2024, 1, 1)
    facts = spark.createDataFrame(
        [(s, base + dt.timedelta(days=t), v) for (s, t), v in vals.items()],
        "station_id int, timestamp timestamp, qc double",
    )
    knn_df = spark.createDataFrame(
        [(s, nb, r + 1) for s, nbs in knn.items() for r, nb in enumerate(nbs)],
        "station_id int, nb_station_id int, rank int",
    )
    ma_df = spark.createDataFrame(
        [(s, v) for s, v in ma.items()], "station_id int, value double"
    )
    out = rank_fill(
        facts, knn_df, ma_df, coef_sign=coef_sign, base_col="qc", round_digits=2
    )
    got = {
        (r["station_id"], (r["timestamp"] - base).days): (r["filled"], r["filled_by"])
        for r in out.collect()
    }
    exp_fill, exp_by = _naive_rank_fill(vals, knn, ma, coef_sign)
    for key in vals:
        g_fill, g_by = got[key]
        assert g_fill == exp_fill[key], (key, g_fill, exp_fill[key])
        assert (g_by if g_by is not None else None) == exp_by.get(key), key


def _naive_qc_p(rows, daily):
    """QC-P rules applied row-by-row in plain Python
    (StationP.py:83-187): failed-day daily comparison, 3-consecutive-run
    membership, isolated peak, bounds. ``rows``: per station an ordered
    list of (ts, raw, qn); ``daily``: {(station, date): raw_d}."""
    out = {}
    # daily 10-min sums on the 6h-shifted date
    sums: dict = {}
    for s, series in rows.items():
        for ts, raw, _qn in series:
            day = (ts - dt.timedelta(hours=6)).date()
            cur = sums.get((s, day))
            if raw is not None:
                sums[(s, day)] = (cur if cur is not None else 0.0) + raw
            elif (s, day) not in sums:
                sums[(s, day)] = None  # SQL sum over all-NULL day is NULL
    failed_days = set()
    for (s, day), sum10 in sums.items():
        raw_d = daily.get((s, day))
        if sum10 is None:
            continue
        if (sum10 == 0 and raw_d is not None and raw_d != 0) or (
            sum10 >= 10 and raw_d is not None and sum10 >= 2 * raw_d
        ):
            failed_days.add((s, day))
    for s, series in rows.items():
        vals = [r for _, r, _ in series]
        qns = [q for _, _, q in series]
        for i, (ts, raw, qn) in enumerate(series):
            v1 = vals[i - 1] if i >= 1 else None
            v2 = vals[i - 2] if i >= 2 else None
            vn = vals[i + 1] if i + 1 < len(vals) else None
            vn2 = vals[i + 2] if i + 2 < len(vals) else None
            q1 = qns[i - 1] if i >= 1 else None
            q2 = qns[i - 2] if i >= 2 else None
            day = (ts - dt.timedelta(hours=6)).date()
            fail = (s, day) in failed_days
            if raw is not None:
                # qn != 3 gates the run HEAD only (StationP.py:152-166):
                # tail -> head at i-2, middle -> head at i-1, head -> itself
                run3 = (
                    (v1 == raw and v2 == raw and q2 is not None and q2 != 3)
                    or (v1 == raw and vn == raw and q1 is not None and q1 != 3)
                    or (vn == raw and vn2 == raw and qn != 3)
                )
                if raw > 0.1 and run3:
                    fail = True
                if raw > 5 and v1 == 0 and vn == 0:
                    fail = True
                if raw < 0 or raw >= 50:
                    fail = True
            out[(s, ts)] = None if fail or raw is None else raw
    return out


_RAW_CHOICES = [None, 0.0, 0.0, 0.2, 0.2, 5.5, 12.0, 49.0, 55.0, -1.0]


@st.composite
def _qc_fixtures(draw):
    rows = {}
    base = dt.datetime(2024, 1, 1)
    for s in range(2):
        series = []
        for i in range(36):  # 6 hours of 10-min slots across a day boundary
            ts = base + dt.timedelta(minutes=10 * i)
            raw = draw(st.sampled_from(_RAW_CHOICES))
            qn = draw(st.sampled_from([1, 3]))
            series.append((ts, raw, qn))
        rows[s] = series
    daily = {}
    for s in range(2):
        for d in (dt.date(2023, 12, 31), dt.date(2024, 1, 1)):
            v = draw(st.sampled_from([None, 0.0, 1.0, 30.0]))
            if v is not None:
                daily[(s, d)] = v
    return rows, daily


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=_qc_fixtures())
def test_qc_p_matches_reference_rules(spark, data):
    from weatherdb_spark.operators.qc import qc_p

    rows, daily = data
    ts_p = spark.createDataFrame(
        [(s, ts, raw, qn) for s, series in rows.items() for ts, raw, qn in series],
        "station_id int, timestamp timestamp, raw double, qn short",
    )
    ts_p_d = spark.createDataFrame(
        [(s, dt.datetime(d.year, d.month, d.day), v) for (s, d), v in daily.items()],
        "station_id int, timestamp timestamp, raw double",
    )
    got = {
        (r["station_id"], r["timestamp"]): r["qc"]
        for r in qc_p(ts_p, ts_p_d).collect()
    }
    exp = _naive_qc_p(rows, daily)
    assert got == exp


def _naive_median_fill(vals, knn, ma, n_donors=3, round_digits=1):
    """T semantics: median of the first n non-null regionalized donors in
    rank order (StationBases.py:1436-1480, StationT.py:122-143)."""
    import statistics

    filled = dict(vals)
    donors_used = {}
    for s in range(N_STATIONS):
        for t in range(N_TS):
            if filled.get((s, t)) is None:
                regs, used = [], []
                for nb in knn.get(s, []):
                    donor = vals.get((nb, t))
                    if donor is not None:
                        regs.append(_r(donor + (ma[s] - ma[nb]), round_digits))
                        used.append(nb)
                    if len(regs) == n_donors:
                        break
                if regs:
                    filled[(s, t)] = _r(statistics.median(regs), round_digits)
                    donors_used[(s, t)] = sorted(used)
    return filled, donors_used


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=_fixtures())
def test_median_fill_matches_reference_loop(spark, data):
    from weatherdb_spark.operators.fillup import median_fill

    vals, knn, ma = data
    base = dt.datetime(2024, 1, 1)
    facts = spark.createDataFrame(
        [(s, base + dt.timedelta(days=t), v) for (s, t), v in vals.items()],
        "station_id int, timestamp timestamp, qc double",
    )
    knn_df = spark.createDataFrame(
        [(s, nb, r + 1) for s, nbs in knn.items() for r, nb in enumerate(nbs)],
        "station_id int, nb_station_id int, rank int",
    )
    ma_df = spark.createDataFrame(
        [(s, v) for s, v in ma.items()], "station_id int, value double"
    )
    out = median_fill(
        facts, knn_df, ma_df, n_donors=3, base_col="qc",
        value_cols=("qc",), out_cols=("filled",), round_digits=1,
    )
    got = {
        (r["station_id"], (r["timestamp"] - base).days): (
            r["filled"],
            sorted(r["filled_by"]) if r["filled_by"] is not None else None,
        )
        for r in out.collect()
    }
    exp_fill, exp_used = _naive_median_fill(vals, knn, ma)
    for key in vals:
        g_fill, g_used = got[key]
        assert g_fill == exp_fill[key], (key, g_fill, exp_fill[key])
        assert g_used == exp_used.get(key), key


# ------------------------------------------- daily adjustment (fillup step 7)

def _spark_round(x: float, digits: int = 2) -> float:
    """Spark's F.round semantics: HALF_UP on BigDecimal.valueOf(double),
    i.e. on the SHORTEST DECIMAL representation of the double (same as
    Python's repr). Python's built-in round is banker's on the binary
    value, so the two disagree on exact .xx5 ties — hypothesis found
    coef 1.9/4.0 = 0.475, where Spark (and the DuckDB oracle) give 0.48
    and round() gives 0.47. The model must mirror the engine."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP
        )
    )


def _spark_bround(x: float, digits: int = 2) -> float:
    """Spark's F.bround semantics: HALF_EVEN on the double's shortest
    decimal representation — what daily_adjust_p uses (the reference's
    implicit float->int cast rounds ties to even, fillup.py's bround
    comment). Distinct from :func:`_spark_round` (HALF_UP) on exact
    .xx5 ties: hypothesis drew coef 1/8 where 1.0 * 0.125 must give
    0.12 (even), not 0.13."""
    from decimal import ROUND_HALF_EVEN, Decimal

    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-digits), rounding=ROUND_HALF_EVEN
        )
    )


def _naive_daily_adjust(vals, daily_raw, peak=5.0, add=10.0, hard=50.0):
    """Literal Python transcription of the reference CASE expression
    (StationP.py:701-740): coef per shifted day where daily raw present,
    10-min sum > 0 and coef != 1; peak cap when both adjacent filled = 0."""
    out = []
    s = sum(v for v in vals if v is not None)
    coef = None
    if daily_raw is not None and s > 0 and daily_raw / s != 1:
        coef = daily_raw / s
    for i, v in enumerate(vals):
        if v is None or coef is None:
            out.append(v)
            continue
        pf = vals[i - 1] if i > 0 else None
        nf = vals[i + 1] if i < len(vals) - 1 else None
        if pf == 0 and nf == 0:
            adj = min(v * coef, peak)
        elif (v * coef - v) <= add:
            adj = min(v * coef, hard)
        else:
            adj = min(v + add, hard)
        out.append(_spark_bround(adj, 2))
    return out


@st.composite
def _adjust_fixtures(draw):
    n = draw(st.integers(min_value=3, max_value=24))
    vals = draw(st.lists(
        st.one_of(
            st.none(),
            st.just(0.0),
            st.floats(min_value=0.1, max_value=40.0).map(lambda x: round(x, 1)),
        ),
        min_size=n, max_size=n,
    ))
    daily = draw(st.one_of(
        st.none(),
        st.floats(min_value=0.0, max_value=300.0).map(lambda x: round(x, 1)),
    ))
    return vals, daily


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=_adjust_fixtures())
def test_daily_adjust_p_matches_reference_case(spark, data):
    from weatherdb_spark.operators.fillup import daily_adjust_p

    vals, daily = data
    # all rows inside one shifted day (06:00.. keeps date(ts - 5h50m) fixed)
    base = dt.datetime(2024, 3, 1, 6, 0)
    rows = [
        (1, base + dt.timedelta(minutes=10 * i), v) for i, v in enumerate(vals)
    ]
    ts_p = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, filled double"
    )
    ts_p_d = spark.createDataFrame(
        [(1, dt.date(2024, 3, 1), daily)],
        "station_id int, timestamp date, raw double",
    )
    got = {
        r["timestamp"]: r["corr_base"]
        for r in daily_adjust_p(ts_p, ts_p_d).collect()
    }
    want = _naive_daily_adjust(vals, daily)
    for i, w in enumerate(want):
        g = got[base + dt.timedelta(minutes=10 * i)]
        if w is None:
            assert g is None, f"row {i}: got {g}, want None"
        else:
            assert g == pytest.approx(w, abs=1e-9), f"row {i}: got {g}, want {w}"


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # station
        st.integers(min_value=0, max_value=1500),         # day offset
        st.one_of(st.none(), st.floats(0, 50, allow_nan=False, width=16)),
    ),
    min_size=1, max_size=60, unique_by=lambda t: (t[0], t[1]),
))
def test_year_chunked_windows_equal_unchunked(spark, data):
    """Property: lag/lead over year_chunked(context_rows=n) chunks equals
    the same window over plain per-station partitions, for random sparse
    multi-year grids (the boundary-context duplication is exact)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from weatherdb_spark.functions.partitioning import year_chunked

    rows = [
        (s, dt.datetime(2020, 1, 1) + dt.timedelta(days=d), v)
        for s, d, v in data
    ]
    df = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, val double"
    )

    def lagged(frame, part_cols):
        w = W.partitionBy(*part_cols).orderBy("timestamp")
        return frame.select(
            "station_id", "timestamp",
            F.lag("val", 2).over(w).alias("_l2"),
            F.lag("val", 1).over(w).alias("_l1"),
            F.lead("val", 1).over(w).alias("_n1"),
            F.lead("val", 2).over(w).alias("_n2"),
        )

    plain = lagged(df, ("station_id",))
    chunked = (
        lagged(year_chunked(df, context_rows=2), ("station_id", "_chunk"))
        .filter(~F.col("_ctx"))
        .drop("_chunk", "_ctx")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, chunked.collect())
    )


def test_year_chunked_exact_across_empty_and_sparse_years(spark):
    """Deterministic pin of the two shapes the naive year+-1 context
    shift got wrong: a station skipping a whole calendar year (lag/lead
    adjacency spans two boundaries) and a single-row year (lag(2) must
    reach through it into the year before)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from weatherdb_spark.functions.partitioning import year_chunked

    rows = [
        # station 1: 2021 entirely empty
        (1, dt.datetime(2020, 12, 30), 1.0),
        (1, dt.datetime(2020, 12, 31), 2.0),
        (1, dt.datetime(2022, 1, 1), 3.0),
        # station 2: 2023 has a single row; lag(2) from 2024's first row
        # must reach into 2022
        (2, dt.datetime(2022, 6, 1), 10.0),
        (2, dt.datetime(2023, 6, 1), 20.0),
        (2, dt.datetime(2024, 6, 1), 30.0),
    ]
    df = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, val double"
    )
    wp = W.partitionBy("station_id").orderBy("timestamp")
    plain = df.select(
        "station_id", "timestamp",
        F.lag("val", 2).over(wp).alias("_l2"),
        F.lead("val", 1).over(wp).alias("_n1"),
    )
    wc = W.partitionBy("station_id", "_chunk").orderBy("timestamp")
    chunked = (
        year_chunked(df, context_rows=2)
        .select(
            "station_id", "timestamp", "_ctx",
            F.lag("val", 2).over(wc).alias("_l2"),
            F.lead("val", 1).over(wc).alias("_n1"),
        )
        .filter(~F.col("_ctx"))
        .drop("_ctx")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, chunked.collect())
    )


def test_year_chunked_rejects_over_year_time_context(spark):
    """context_seconds beyond 365 days would be silently inexact (a
    bracket can span two year boundaries) -> the helper refuses."""
    import pytest as _pytest

    from weatherdb_spark.functions.partitioning import year_chunked

    df = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1), 1.0)],
        "station_id int, timestamp timestamp, val double",
    )
    with _pytest.raises(ValueError, match="365"):
        year_chunked(df, context_seconds=400 * 86400)
    with _pytest.raises(ValueError, match="exactly one"):
        year_chunked(df)
