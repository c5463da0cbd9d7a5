"""Partition-layout helpers.

A scan of a small parquet file yields one input split, so any CPU-heavy
per-row expansion (shingling, hashing, decode) that follows it serializes
onto a single core even on a 32-core local mode / 1000-executor cluster.
``spread`` widens such inputs *only when needed*: at production scale the
scan already has many splits and this is a no-op (the check runs before any
shuffle is added). Repartitioning is keyed when key columns are given, so a
downstream ``groupBy(key)`` reuses the exchange (HashPartitioning on the
same keys satisfies the aggregation's ClusteredDistribution — no second
shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _plan_num_partitions(df: DataFrame) -> int | None:
    """Partition count of the df's physical plan WITHOUT ``df.rdd``:
    the rdd property plans the query a second time (a separate
    QueryExecution with a row deserializer) on every access, while
    ``queryExecution.executedPlan`` is the cached plan the later action
    reuses — probing it costs nothing extra. Returns None for adaptive
    plans: AQE wraps any plan containing an exchange, its final width is
    only known at runtime, and ``execute()`` on the wrapper would
    actually run the query stages — but an exchange also means the data
    was already shuffled to a configured width, so spread has no job to
    do there."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        return None
    return plan.execute().getNumPartitions()


def spread(df: DataFrame, *key_cols: str, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to at least ``target`` (default: cluster default
    parallelism) partitions if — and only if — its current plan produces
    fewer. Pass key columns to make the shuffle reusable by downstream
    per-key aggregations."""
    sc = df.sparkSession.sparkContext
    tgt = target or sc.defaultParallelism
    n = _plan_num_partitions(df)
    if n is None or n >= tgt:
        return df
    if key_cols:
        return df.repartition(tgt, *[F.col(c) for c in key_cols])
    return df.repartition(tgt)


def year_chunked(
    df: DataFrame,
    ts_col: str = "timestamp",
    group_col: str = "station_id",
    context_rows: int | None = None,
    context_seconds: int | None = None,
) -> DataFrame:
    """Split a per-``group_col`` timeseries into (group, year) chunks
    for skew-safe window functions, duplicating boundary rows into the
    neighboring chunk as context.

    A window partitioned by station alone puts a station's entire
    multi-decade history (~5M rows/century at 10-min resolution) in ONE
    task; most QC/fill windows only reach a bounded distance — a fixed
    number of adjacent rows (lag/lead) or a bounded time span — so the
    window can run per (station, year) instead, with each chunk seeded
    by just enough neighboring-chunk context to make the chunked result
    EXACT:

    - ``context_rows=n``: each chunk's first/last ``n`` rows are
      duplicated into the previous/next chunk — exact for windows whose
      frame reaches at most ``n`` rows either way, on arbitrary time
      grids (the context rows ARE the globally adjacent ones).
    - ``context_seconds=s``: rows within ``s`` of a year boundary are
      duplicated — exact for windows whose *effect* is bounded to
      brackets of span <= ``s`` (s must stay <= one year so a bracket
      crosses at most the one duplicated boundary).

    Returns ``df`` plus ``_chunk`` (partition the window on
    ``(group_col, "_chunk")``) and ``_ctx`` (True on duplicated context
    rows — filter them out AFTER the window functions, then drop both
    columns).
    """
    from pyspark.sql import Window as W

    if (context_rows is None) == (context_seconds is None):
        raise ValueError("pass exactly one of context_rows/context_seconds")
    chunked = df.withColumn("_chunk", F.year(ts_col))
    if context_rows is not None:
        w_asc = W.partitionBy(group_col, "_chunk").orderBy(ts_col)
        w_desc = W.partitionBy(group_col, "_chunk").orderBy(
            F.col(ts_col).desc()
        )
        marked = chunked.withColumn(
            "_rn_a", F.row_number().over(w_asc)
        ).withColumn("_rn_d", F.row_number().over(w_desc))
        first = F.col("_rn_a") <= context_rows
        last = F.col("_rn_d") <= context_rows
    else:
        year_start = F.unix_timestamp(
            F.make_date(F.year(ts_col), F.lit(1), F.lit(1)).cast("timestamp")
        )
        next_year_start = F.unix_timestamp(
            F.make_date(F.year(ts_col) + 1, F.lit(1), F.lit(1)).cast("timestamp")
        )
        ts_s = F.unix_timestamp(F.col(ts_col))
        marked = chunked
        first = ts_s - year_start < context_seconds
        last = next_year_start - ts_s <= context_seconds
    real = marked.withColumn("_ctx", F.lit(False))
    ctx_up = marked.filter(last).withColumn(
        "_chunk", F.col("_chunk") + 1
    ).withColumn("_ctx", F.lit(True))
    ctx_down = marked.filter(first).withColumn(
        "_chunk", F.col("_chunk") - 1
    ).withColumn("_ctx", F.lit(True))
    union = real.unionByName(ctx_up).unionByName(ctx_down)
    if context_rows is not None:
        union = union.drop("_rn_a", "_rn_d")
    return union
