"""Aggregation operators (SURVEY.md §2.4).

All are single groupBy passes — map-side partial aggregation happens
automatically, so at 100 TB each is one shuffle keyed on
(station_id, truncated-ts); no driver-side loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from weatherdb_spark.config import COVERAGE_GATE, MA_COVERAGE_GATE
from weatherdb_spark.functions.temporal import trunc_expr

_AGG_FUNS = {"sum": F.sum, "avg": F.avg, "mean": F.avg, "min": F.min, "max": F.max}


def coverage_gated_agg(
    df: DataFrame,
    kinds: Sequence[str],
    agg_to: str,
    agg_fun: str = "sum",
    ts_col: str = "timestamp",
    group_cols: Sequence[str] = ("station_id",),
    coverage: float | None = None,
    filled_share: bool = False,
    na_share_kinds: Sequence[str] = (),
    round_digits: int | None = None,
) -> DataFrame:
    """A1 — resample to ``agg_to`` with the reference's 80% coverage gate.

    Per group and truncated timestamp, aggregate each kind with ``agg_fun``
    (``*_min``/``*_max`` kinds use MIN/MAX) but emit NULL unless
    ``count(kind)/count(*) > coverage``; optionally add
    ``filled_share`` (% of rows filled by a donor) and per-kind
    ``{kind}_na_share`` (% NULL rows).

    Reference: weatherdb/station/StationBases.py:2544-2616 (SQL assembly),
    agg funcs StationBases.py:95 / StationT.py:40.
    ``coverage=None`` resolves through the user config
    ([aggregation] coverage_gate, default COVERAGE_GATE).
    """
    if coverage is None:
        from weatherdb_spark.config import user_setting

        coverage = user_setting("aggregation", "coverage_gate", COVERAGE_GATE)
    bucket = trunc_expr(F.col(ts_col), agg_to).alias(ts_col)
    n_all = F.count(F.lit(1))

    aggs: list[Column] = []
    for kind in kinds:
        if kind.endswith("_min"):
            fun = F.min
        elif kind.endswith("_max"):
            fun = F.max
        else:
            fun = _AGG_FUNS[agg_fun]
        val = fun(F.col(kind))
        if round_digits is not None:
            val = F.round(val, round_digits)
        gated = F.when(F.count(F.col(kind)) / n_all > coverage, val)
        aggs.append(gated.alias(kind))
    if filled_share:
        aggs.append(
            F.round(F.count(F.col("filled_by")) * 100.0 / n_all, 2).alias("filled_share")
        )
    for kind in na_share_kinds:
        aggs.append(
            F.round((n_all - F.count(F.col(kind))) * 100.0 / n_all, 2)
            .alias(f"{kind}_na_share")
        )
    return df.groupBy(*group_cols, bucket).agg(*aggs)


def yearly_ma(
    df: DataFrame,
    kinds: Sequence[str],
    agg_fun: str = "sum",
    ts_col: str = "timestamp",
    group_cols: Sequence[str] = ("station_id",),
    coverage: float | None = None,
) -> DataFrame:
    """A2 — multi-annual mean of a timeserie.

    Per year: ``sum(kind)/count(kind)*count(*)`` (gap-scaled yearly total;
    plain mean for avg parameters) kept only where coverage > 0.9; then
    average across years. Feeds ``station_ma_timeserie``.
    ``coverage=None`` resolves through the user config
    ([aggregation] ma_coverage_gate, default MA_COVERAGE_GATE).

    Reference: weatherdb/station/StationBases.py:940-958.
    """
    if coverage is None:
        from weatherdb_spark.config import user_setting

        coverage = user_setting(
            "aggregation", "ma_coverage_gate", MA_COVERAGE_GATE
        )
    year = F.year(F.col(ts_col)).alias("_year")
    n_all = F.count(F.lit(1))
    per_year = df.groupBy(*group_cols, year).agg(
        *[
            F.when(
                F.count(F.col(k)) / n_all > coverage,
                (F.sum(F.col(k)) / F.count(F.col(k)) * n_all)
                if agg_fun == "sum"
                else F.avg(F.col(k)),
            ).alias(k)
            for k in kinds
        ]
    )
    return per_year.groupBy(*group_cols).agg(
        *[F.avg(F.col(k)).alias(k) for k in kinds]
    )


def qc_dropped_share(
    df: DataFrame,
    raw_col: str = "raw",
    qc_col: str = "qc",
    group_cols: Sequence[str] = ("station_id",),
) -> DataFrame:
    """A4 — % of raw values dropped by quality control, per station
    (StationBases.py:1316-1323)."""
    return df.groupBy(*group_cols).agg(
        F.round(
            (F.count(F.col(raw_col)) - F.count(F.col(qc_col)))
            * 100.0
            / F.count(F.col(raw_col)),
            2,
        ).alias("qc_dropped")
    )


def hole_census(
    df: DataFrame,
    gap_thresholds: Sequence[str] = ("2 weeks", "4 weeks"),
    ts_col: str = "timestamp",
    value_col: str = "raw",
    group_cols: Sequence[str] = ("station_id",),
    period: tuple | None = None,
    meta_period: DataFrame | None = None,
) -> DataFrame:
    """A5 — count gaps >= each threshold per station.

    Gap = ts - lag(ts) over rows where the value is present; one window
    pass then conditional counts (StationBases.py:1981-2029).

    ``period`` = explicit (min_tstp, max_tstp) bounds: observations are
    cropped to them AND both bounds join the timestamp stream as sentinel
    rows, so leading/trailing holes count (the reference UNIONs
    ``{min_tstp}``/``{max_tstp}`` into the scan, StationBases.py:2008-2014).
    ``None`` reproduces the reference's ``crop_period=True`` default — the
    bounds collapse onto each station's own first/last observation and
    only interior gaps count.

    ``meta_period`` = per-group bounds dim (``between_meta_period=True``):
    group_cols + ``period_from``/``period_until`` columns; rows are
    additionally bounded by them and the bounds join the sentinel set.
    Duplicate timestamps from sentinels that coincide with observations
    produce 0-second gaps, which no threshold counts — so no distinct is
    needed (the reference's UNION dedup is cosmetic here).

    Skew guard: the gap window partitions by (group, year) — a
    station-only window would put its full observation history in one
    task. Gaps may span years (including wholly-empty ones), so the
    cross-chunk gaps come from a per-(group, year) min/max summary
    (dim-sized: groups x years) whose lag runs over consecutive
    NON-EMPTY chunks — together with the within-chunk gaps this is
    exactly the set of consecutive-observation gaps.
    """
    present = df.filter(F.col(value_col).isNotNull()).select(*group_cols, ts_col)
    ts_type = dict(present.dtypes)[ts_col]
    # Half-open periods crop (and sentinel) only the given bound; a
    # NULL-cast bound would turn ``between`` into an all-NULL filter and
    # silently return an empty census.
    lo = hi = None
    if period is not None:
        lo, hi = (
            F.lit(b).cast(ts_type) if b is not None else None for b in period
        )
    if lo is not None:
        present = present.filter(F.col(ts_col) >= lo)
    if hi is not None:
        present = present.filter(F.col(ts_col) <= hi)
    if meta_period is not None:
        mp = meta_period.select(
            *group_cols,
            F.col("period_from").cast(ts_type).alias("period_from"),
            F.col("period_until").cast(ts_type).alias("period_until"),
        )
        # With BOTH bound sets the effective range is their intersection:
        # sentinels outside it would count the station's non-existence
        # before meta period_from (or after period_until) as giant holes.
        if lo is not None:
            mp = mp.withColumn("period_from", F.greatest("period_from", lo))
        if hi is not None:
            mp = mp.withColumn("period_until", F.least("period_until", hi))
        # an EMPTY intersection (meta period disjoint from the requested
        # period) inverts the clamped bounds; its two sentinels would
        # then register the whole disjoint span as one phantom hole —
        # the station simply has no census rows in that period
        mp = mp.filter(F.col("period_from") <= F.col("period_until"))
        present = (
            present.join(F.broadcast(mp), list(group_cols))
            .filter(F.col(ts_col).between(F.col("period_from"), F.col("period_until")))
            .select(*group_cols, ts_col)
        )
        sentinels = [
            mp.select(*group_cols, F.col(b).alias(ts_col))
            for b in ("period_from", "period_until")
        ]
    elif lo is not None or hi is not None:
        groups = present.select(*group_cols).distinct()
        sentinels = [
            groups.select(*group_cols, b.alias(ts_col))
            for b in (lo, hi) if b is not None
        ]
    else:
        sentinels = []
    for s in sentinels:
        present = present.unionByName(s)
    chunked = present.withColumn("_chunk", F.year(ts_col))
    wc = W.partitionBy(*group_cols, "_chunk").orderBy(ts_col)
    within = chunked.withColumn(
        "_gap_s",
        F.unix_timestamp(F.col(ts_col))
        - F.unix_timestamp(F.lag(ts_col).over(wc)),
    ).select(*group_cols, "_gap_s")
    summary = chunked.groupBy(*group_cols, "_chunk").agg(
        F.min(ts_col).alias("_mn"), F.max(ts_col).alias("_mx")
    )
    ws = W.partitionBy(*group_cols).orderBy("_chunk")
    cross = summary.withColumn(
        "_gap_s",
        F.unix_timestamp(F.col("_mn"))
        - F.unix_timestamp(F.lag("_mx").over(ws)),
    ).select(*group_cols, "_gap_s")
    gapped = within.unionByName(cross)

    def _secs(th: str) -> int:
        n, unit = th.split()
        mult = {"weeks": 604800, "week": 604800, "days": 86400, "day": 86400,
                "hours": 3600, "hour": 3600}[unit]
        return int(n) * mult

    return gapped.groupBy(*group_cols).agg(
        *[
            F.count(F.when(F.col("_gap_s") >= _secs(th), 1)).alias(
                "holes_ge_" + th.replace(" ", "_")
            )
            for th in gap_thresholds
        ]
    )


def filled_period(
    df: DataFrame,
    kind: str,
    ts_col: str = "timestamp",
    group_cols: Sequence[str] = ("station_id",),
) -> DataFrame:
    """A8 — min/max timestamp where ``kind`` is not NULL
    (StationBases.py:2121-2131)."""
    return (
        df.filter(F.col(kind).isNotNull())
        .groupBy(*group_cols)
        .agg(F.min(ts_col).alias(f"{kind}_from"), F.max(ts_col).alias(f"{kind}_until"))
    )


def full_year_bounds(
    df: DataFrame,
    ts_col: str = "timestamp",
    group_cols: Sequence[str] = ("station_id",),
) -> DataFrame:
    """Per-group first/last FULL year (StationBases.py:3108-3122): a
    series starting after Jan 15 drops its first year; one ending before
    Dec 15 drops its last. (The reference's tstp_max branch compares
    against ``tstp_min.year`` and reassigns tstp_min — an apparent bug;
    this implements the documented intent 'truncate to full years'.)

    Returns (group_cols..., _year_from, _year_until)."""
    b = df.groupBy(*group_cols).agg(
        F.min(ts_col).alias("_mn"), F.max(ts_col).alias("_mx")
    )
    start_y = F.when(
        F.to_date("_mn") > F.make_date(F.year("_mn"), F.lit(1), F.lit(15)),
        F.year("_mn") + 1,
    ).otherwise(F.year("_mn"))
    end_y = F.when(
        F.to_date("_mx") < F.make_date(F.year("_mx"), F.lit(12), F.lit(15)),
        F.year("_mx") - 1,
    ).otherwise(F.year("_mx"))
    return b.select(
        *group_cols, start_y.alias("_year_from"), end_y.alias("_year_until")
    )


def adjust_series(
    df: DataFrame,
    ma: DataFrame,
    coef_sign: str = "mult",
    value_col: str = "filled",
    ts_col: str = "timestamp",
    agg_fun: str = "sum",
    min_count: int = 345,
    round_digits: int = 2,
    truncate_years: bool = False,
) -> DataFrame:
    """A7 — ``get_adj``: scale the series so its multi-annual mean equals
    the station's MA target (StationBases.py:2763-2793, 3094-3122,
    3136-3184; T additive StationT.py:152-161, ET multiplicative
    StationET.py:102-111).

    1. yearly ``agg_fun`` of ``value_col`` per station, keeping only years
       with >= ``min_count`` present values (e.g. 345 days for ET);
       with ``truncate_years``, additionally only FULL years
       (StationBases.py:3108-3122 — used by T and ET, not P);
    2. the station's period statistic = mean over qualifying years;
    3. multiplicative: ``adj = value * ma / period_stat``;
       additive: ``adj = value + (ma - period_stat)``.
    Adjustment applies to ALL rows (truncation only restricts which years
    feed the statistic). Returns df + ``adj`` (NULL where the station has
    no qualifying year or no MA value). ``ma``: (station_id, value)."""
    yearly = (
        df.groupBy("station_id", F.year(ts_col).alias("_y"))
        .agg(
            getattr(F, agg_fun)(value_col).alias("_ystat"),
            F.count(value_col).alias("_n"),
        )
        .filter(F.col("_n") >= min_count)
    )
    if truncate_years:
        bounds = full_year_bounds(df, ts_col=ts_col)
        yearly = yearly.join(F.broadcast(bounds), "station_id").filter(
            F.col("_y").between(F.col("_year_from"), F.col("_year_until"))
        )
    period_stat = yearly.groupBy("station_id").agg(F.avg("_ystat").alias("_pstat"))
    target = ma.select("station_id", F.col("value").alias("_ma"))
    dims = period_stat.join(target, "station_id")
    out = df.join(F.broadcast(dims), "station_id", "left")
    if coef_sign == "mult":
        adj = F.col(value_col) * F.col("_ma") / F.col("_pstat")
    elif coef_sign == "add":
        adj = F.col(value_col) + (F.col("_ma") - F.col("_pstat"))
    else:
        raise ValueError(f"coef_sign {coef_sign!r} not in ('mult', 'add')")
    return out.withColumn("adj", F.round(adj, round_digits)).drop("_pstat", "_ma")


SUHY_MONTHS = (4, 5, 6, 7, 8, 9)  # summer half-year, StationBases.py:3153


def adjust_series_seasonal(
    df: DataFrame,
    ma_seasonal: DataFrame,
    value_col: str = "filled",
    ts_col: str = "timestamp",
    min_count: int = 172,
    round_digits: int = 2,
) -> DataFrame:
    """A7 for P — separate winter/summer adjustment factors
    (StationPBase.get_adj, StationBases.py:3136-3184).

    Rows split by month into suhy (Apr-Sep) / wihy half-years; per
    (station, term) the period statistic is the mean of yearly sums over
    years with >= ``min_count`` present values (365//2 - 10 days at daily
    resolution, x 24*6 at 10 min — the reference's pandas
    ``sum(min_count=...)``); each row scales by its term's
    ``ma / period_stat``. P does NOT truncate to full calendar years
    (StationPBase unpacks the 3-tuple, skipping main_df_tr) — the
    min_count gate drops partial half-years instead.

    ``ma_seasonal``: (station_id, term, value) with term in
    ('wihy', 'suhy'). Returns df + ``term``, ``adj``."""
    with_term = df.withColumn(
        "term",
        F.when(F.month(ts_col).isin(*SUHY_MONTHS), F.lit("suhy")).otherwise(
            F.lit("wihy")
        ),
    )
    yearly = (
        with_term.groupBy("station_id", "term", F.year(ts_col).alias("_y"))
        .agg(
            F.sum(value_col).alias("_ysum"),
            F.count(value_col).alias("_n"),
        )
        .filter(F.col("_n") >= min_count)
    )
    period_stat = yearly.groupBy("station_id", "term").agg(
        F.avg("_ysum").alias("_pstat")
    )
    target = ma_seasonal.select("station_id", "term", F.col("value").alias("_ma"))
    dims = period_stat.join(target, ["station_id", "term"])
    out = with_term.join(F.broadcast(dims), ["station_id", "term"], "left")
    adj = F.col(value_col) * F.col("_ma") / F.col("_pstat")
    return out.withColumn("adj", F.round(adj, round_digits)).drop("_pstat", "_ma")
