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
