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

    - ``context_rows=n``: each chunk additionally receives the ``n``
      rows globally preceding its first row and following its last —
      exact for windows whose frame reaches at most ``n`` rows either
      way, on arbitrary time grids, INCLUDING stations that skip whole
      years or have years with fewer than ``n`` rows (the context rows
      are located through a per-station edge dim, not a naive year+-1
      shift that would lose adjacency across empty years).
    - ``context_seconds=s``: rows within ``s`` of a year boundary are
      duplicated into the neighboring year — exact for windows whose
      *effect* is bounded to brackets of span <= ``s`` (s must stay <=
      one year: a wider bracket, including any bracket across an empty
      year, can then never take effect, so missing context is harmless).

    Returns ``df`` plus ``_chunk`` (partition the window on
    ``(group_col, "_chunk")``) and ``_ctx`` (True on duplicated context
    rows — filter them out AFTER the window functions, then drop both
    columns).
    """
    from pyspark.sql import Window as W

    if (context_rows is None) == (context_seconds is None):
        raise ValueError("pass exactly one of context_rows/context_seconds")
    if context_seconds is not None and context_seconds > 365 * 86400:
        # the one-chunk time context covers at most one year-boundary
        # crossing; beyond that the chunked result would silently differ
        # from a plain per-station window — callers with a wider bound
        # must use that window directly (data that coarse cannot skew)
        raise ValueError(
            "context_seconds must stay <= 365 days for the (group, year) "
            "chunking to be exact; use a plain per-group window instead"
        )
    chunked = df.withColumn("_chunk", F.year(ts_col))
    if context_rows is not None:
        n = context_rows
        w_asc = W.partitionBy(group_col, "_chunk").orderBy(ts_col)
        # rank-from-the-end derives from the chunk size instead of a
        # second row_number over DESCENDING order — the unordered count
        # window reuses the ascending sort's partitioning, saving a full
        # extra sort pass of the fact table
        w_all = W.partitionBy(group_col, "_chunk")
        marked = chunked.withColumn(
            "_rn_a", F.row_number().over(w_asc)
        ).withColumn(
            "_rn_d", F.count(F.lit(1)).over(w_all) - F.col("_rn_a") + 1
        )
        # Edge set: each chunk's first/last n rows. Every row within n
        # global steps of a chunk boundary is in here (fewer than n rows
        # can sit between it and the boundary, so it is among the
        # first/last n of its own chunk) — so consecutive positions in
        # the edge set's per-station order ARE consecutive global rows
        # around boundaries, and a per-station window over it is safe:
        # the edge set is 2n x chunks per station, dim-sized.
        edges = marked.filter(
            (F.col("_rn_a") <= n) | (F.col("_rn_d") <= n)
        ).drop("_rn_a", "_rn_d")
        eidx = edges.withColumn(
            "_eidx", F.row_number().over(W.partitionBy(group_col).orderBy(ts_col))
        )
        bounds = eidx.groupBy(group_col, "_chunk").agg(
            F.min("_eidx").alias("_first"), F.max("_eidx").alias("_last")
        )
        # chunk c needs the edge rows at positions [first(c)-n, first(c))
        # and (last(c), last(c)+n] — emit one (target chunk, position)
        # row per needed slot and equi-join the edge rows to it
        slots = F.array(
            *[F.col("_first") - k for k in range(1, n + 1)],
            *[F.col("_last") + k for k in range(1, n + 1)],
        )
        targets = bounds.select(
            group_col,
            F.col("_chunk").alias("_tchunk"),
            F.explode(slots).alias("_eidx"),
        )
        ctx = (
            eidx.withColumnRenamed("_chunk", "_schunk")
            .join(targets, [group_col, "_eidx"])
            .withColumn("_chunk", F.col("_tchunk"))
            .drop("_schunk", "_tchunk", "_eidx")
            .withColumn("_ctx", F.lit(True))
        )
        real = marked.drop("_rn_a", "_rn_d").withColumn("_ctx", F.lit(False))
        return real.unionByName(ctx)

    year_start = F.unix_timestamp(
        F.make_date(F.year(ts_col), F.lit(1), F.lit(1)).cast("timestamp")
    )
    next_year_start = F.unix_timestamp(
        F.make_date(F.year(ts_col) + 1, F.lit(1), F.lit(1)).cast("timestamp")
    )
    ts_s = F.unix_timestamp(F.col(ts_col))
    real = chunked.withColumn("_ctx", F.lit(False))
    ctx_up = chunked.filter(next_year_start - ts_s <= context_seconds).withColumn(
        "_chunk", F.col("_chunk") + 1
    ).withColumn("_ctx", F.lit(True))
    ctx_down = chunked.filter(ts_s - year_start < context_seconds).withColumn(
        "_chunk", F.col("_chunk") - 1
    ).withColumn("_ctx", F.lit(True))
    return real.unionByName(ctx_up).unionByName(ctx_down)
