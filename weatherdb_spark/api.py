"""Read path — the engine equivalent of ``Station*.get_df``.

Reference lifecycle (weatherdb/station/StationBases.py:2463-2649): kind
validation -> period resolution -> agg_to lattice check -> SELECT assembly ->
pandas post-processing. Here the whole path is one declarative
select/filter/groupBy chain; Catalyst pushes the period predicate and the
kind projection into the parquet scan (verify via
``df.explain('formatted')`` -> PushedFilters / ReadSchema).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weatherdb_spark.config import AGGREGATIONS, PARAMETERS
from weatherdb_spark.operators.aggregate import coverage_gated_agg


def _check_kinds(parameter: str, kinds: Sequence[str]) -> list[str]:
    """Kind validation (StationBases.py:170-283): unknown kinds raise,
    'best' resolves to the parameter's best kind."""
    valid = PARAMETERS[parameter]["kinds"]
    out = []
    for k in kinds:
        k = PARAMETERS[parameter]["best_kind"] if k == "best" else k
        if k not in valid:
            raise ValueError(f"kind {k!r} invalid for parameter {parameter!r}; valid: {valid}")
        if k not in out:
            out.append(k)
    return out


def _check_agg_to(parameter: str, agg_to: str | None) -> None:
    """Aggregation lattice check (StationBases.py:365-376): agg_to must be in
    the ordered list and >= the parameter's minimum granularity."""
    if agg_to is None:
        return
    if agg_to not in AGGREGATIONS:
        raise ValueError(f"agg_to {agg_to!r} not in {AGGREGATIONS[1:]}")
    min_agg = PARAMETERS[parameter]["min_agg_to"]
    if AGGREGATIONS.index(agg_to) < AGGREGATIONS.index(min_agg):
        raise ValueError(
            f"agg_to {agg_to!r} finer than parameter {parameter!r} minimum {min_agg!r}"
        )


def get_df(
    ts: DataFrame,
    parameter: str,
    kinds: Sequence[str] = ("best",),
    period: tuple[str | None, str | None] = (None, None),
    sql_add_where: str | None = None,
    agg_to: str | None = None,
    stids: Sequence[int] | None = None,
    filled_share: bool = False,
    na_share: bool = False,
    ts_col: str = "timestamp",
    db_unit: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Select kinds over a period with optional resampling.

    - F1 kind projection (StationBases.py:2600-2616)
    - F2 period predicate  (StationBases.py:2604)
    - F3 arbitrary extra predicate via ``sql_add_where``
      (StationBases.py:2506-2598)
    - F8 stid filter (StationsBase.py:320-334)
    - A1 coverage-gated resampling when ``agg_to`` is set

    A table in scaled-int storage (integral kind columns, see
    functions/units.py) is divided back to the physical unit before any
    aggregation unless ``db_unit=True`` returns the stored integers
    verbatim (reference get_df's parameter of the same name,
    StationBases.py:2638-2643).
    """
    from weatherdb_spark.functions.units import from_db_unit

    kinds = _check_kinds(parameter, kinds)
    _check_agg_to(parameter, agg_to)
    cfg = PARAMETERS[parameter]

    out = ts
    # Stage columns the pipeline has not produced yet (qc before
    # quality-check, corr before richter-correct) materialize as typed
    # NULLs: the reference's Postgres schema carries every stage column
    # from day one, NULL until its stage runs (db/models.py) — a parquet
    # warehouse only gains columns per stage, so reads pin the declared
    # schema here instead of failing on a valid-but-unbuilt kind.
    from weatherdb_spark import schemas

    declared = getattr(schemas, f"TS_{parameter.upper()}", None)
    if declared is not None:
        types = {f.name: f.dataType for f in declared.fields}
        for k in kinds:
            if k not in out.columns and k in types:
                out = out.withColumn(k, F.lit(None).cast(types[k]))
    if not db_unit:
        out = from_db_unit(out, parameter, value_cols=[
            k for k in kinds
            if k in out.columns and k not in ("qn", "filled_by")
        ])
    if stids is not None and "station_bucket" in out.columns:
        # partition PRUNING: Catalyst cannot derive the bucket directory
        # from a station_id predicate (bucket = pmod(station_id, N)), so
        # compute the bucket set on the driver — a warehouse read for a
        # few stations then lists only those bucket dirs instead of all N.
        # ``n_buckets`` must be the modulus the warehouse was WRITTEN
        # with (Broker.bucket_count) — the facade threads it through;
        # direct callers fall back to the shipped default.
        from weatherdb_spark.broker import N_STATION_BUCKETS

        buckets = sorted({
            s % (n_buckets or N_STATION_BUCKETS) for s in stids
        })
        out = out.filter(F.col("station_bucket").isin(buckets))
    if stids is not None:
        out = out.filter(F.col("station_id").isin(list(stids)))
    start, end = period
    if start is not None:
        out = out.filter(F.col(ts_col) >= F.lit(start).cast("timestamp"))
    if end is not None:
        out = out.filter(F.col(ts_col) <= F.lit(end).cast("timestamp"))
    if sql_add_where:
        out = out.filter(F.expr(sql_add_where))

    if agg_to is not None:
        return coverage_gated_agg(
            out,
            kinds=[k for k in kinds if k not in ("qn", "filled_by")],
            agg_to=agg_to,
            agg_fun=cfg["agg_fun"],
            ts_col=ts_col,
            filled_share=filled_share,
            na_share_kinds=kinds if na_share else (),
        ).orderBy("station_id", ts_col)

    cols = ["station_id", ts_col, *kinds]
    if filled_share and "filled_by" not in kinds:
        cols.append("filled_by")
    return out.select(*cols).orderBy("station_id", ts_col)
