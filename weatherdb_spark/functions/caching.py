"""Scoped persist tracking — cache hygiene for multi-action stages.

Operators like :func:`weatherdb_spark.operators.fillup.median_fill` persist
fact-adjacent intermediates (donor pairs, per-timestamp best sets) because
one run consumes them from several actions (probe + write). The persist is
correct *within* a stage, but a long-lived cluster session running many
stages (``Broker.update_db`` calls fillup once per parameter) would
accumulate dead blocks that squeeze the executor storage pool and evict
useful cache.

:func:`scoped_persist` is a drop-in ``df.persist()`` that additionally
registers the DataFrame with the innermost active :func:`cache_scope`;
the scope unpersists everything it saw on exit (including on error). With
no scope active it degrades to a plain persist — callers that manage the
cache themselves (bench.py clears the whole cache between queries, the
round driver tears the session down) lose nothing.

The reference never needs this: its stages are single PostgreSQL
statements with no cross-statement materialized state
(StationBases.py:1346-1669).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_local = threading.local()


def scope_active() -> bool:
    """True when a :func:`cache_scope` is active on this thread — for
    callers whose persist is a pure reuse optimization: inside a scope
    the block is released on exit, outside one the caller should skip
    the persist (recompute once) rather than leak a never-unpersisted
    block into a long-lived session."""
    return bool(getattr(_local, "stack", None))


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` that the innermost :func:`cache_scope` will
    unpersist on exit. Plain persist when no scope is active."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    stack = getattr(_local, "stack", None)
    if stack:
        stack[-1].append(df)
    return df


@contextmanager
def cache_scope():
    """Unpersist every :func:`scoped_persist`-ed DataFrame on exit.

    Scopes nest: an inner scope releases only its own registrations.
    ``unpersist(blocking=False)`` — block eviction is async, the pool
    pressure is gone either way and the stage must not wait on it.
    """
    stack = getattr(_local, "stack", None)
    if stack is None:
        stack = _local.stack = []
    entry: list[DataFrame] = []
    stack.append(entry)
    try:
        yield entry
    finally:
        stack.pop()
        for df in entry:
            try:
                df.unpersist()
            except Exception:
                # a stopped session during teardown must not mask the
                # stage's own outcome
                pass
