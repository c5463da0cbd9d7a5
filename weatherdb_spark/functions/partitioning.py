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


def spread(df: DataFrame, *key_cols: str, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to at least ``target`` (default: cluster default
    parallelism) partitions if — and only if — its current plan produces
    fewer. Pass key columns to make the shuffle reusable by downstream
    per-key aggregations."""
    sc = df.sparkSession.sparkContext
    tgt = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= tgt:
        return df
    if key_cols:
        return df.repartition(tgt, *[F.col(c) for c in key_cols])
    return df.repartition(tgt)
