"""S4/S5 — upsert sinks (reference StationBases.py:525-587 raw upsert,
StationsBase.py:147-222 meta upsert).

The reference batches 1000-row ``INSERT .. ON CONFLICT DO UPDATE``
statements with ``IS DISTINCT FROM`` guards so unchanged rows are not
rewritten (StationBases.py:1310, StationP.py:626). On Spark the same
semantics are a keyed full-outer merge expressed declaratively; with Delta
Lake this maps 1:1 to ``MERGE INTO`` — here we implement the engine-level
merge as a pure DataFrame function plus a parquet partition-overwrite
writer, so the storage backend stays pluggable.

Scale: the merge is one shuffle on the key columns; with both sides
bucketed by the same key (our tall tables are) it is co-located. The
change-detection predicate prunes the write set exactly like the
reference's ``IS DISTINCT FROM`` guard.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keyed upsert: rows in ``updates`` replace/insert into ``current``.

    Matches the reference's ON CONFLICT DO UPDATE: update columns come
    from ``updates`` where matched, inserts keep update values, unmatched
    current rows pass through. Returns the merged DataFrame with
    ``current``'s column order plus a ``_merge_action`` column in
    ('insert', 'update', 'keep') — 'update' only when some value column
    actually changed (IS DISTINCT FROM semantics), else 'keep'.
    """
    value_cols = list(value_cols or [c for c in updates.columns if c not in keys])
    cur = current.alias("cur")
    upd = updates.alias("upd")
    cond = [F.col(f"cur.{k}").eqNullSafe(F.col(f"upd.{k}")) for k in keys]
    joined = cur.join(upd, cond, "full_outer")

    matched = F.col(f"upd.{keys[0]}").isNotNull() & F.col(f"cur.{keys[0]}").isNotNull()
    inserted = F.col(f"cur.{keys[0]}").isNull()
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))

    out_cols = []
    for c in current.columns:
        if c in keys:
            out_cols.append(F.coalesce(F.col(f"cur.{c}"), F.col(f"upd.{c}")).alias(c))
        elif c in value_cols:
            out_cols.append(
                F.when(matched | inserted, F.col(f"upd.{c}"))
                .otherwise(F.col(f"cur.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"cur.{c}").alias(c))
    action = (
        F.when(inserted, F.lit("insert"))
        .when(matched & changed, F.lit("update"))
        .otherwise(F.lit("keep"))
    )
    return joined.select(*out_cols, action.alias("_merge_action"))


def write_merged(
    merged: DataFrame,
    path: str,
    partition_cols: Sequence[str] = (),
) -> None:
    """Persist a merge result as parquet. With ``partition_cols`` the write
    uses dynamic partition overwrite so only touched partitions rewrite —
    the parquet-level analog of the reference's per-station UPDATE."""
    w = merged.drop("_merge_action").write.mode("overwrite")
    if partition_cols:
        w = w.option("partitionOverwriteMode", "dynamic").partitionBy(*partition_cols)
    w.parquet(path)
