"""Reader-safe table snapshots: Broker.write lands each rewrite in a
fresh ``_vNNNNN`` dir and flips a one-file manifest pointer, so a reader
that planned its scan before a rewrite keeps its files (the writer never
deletes the immediately previous snapshot; only vacuum reclaims all
superseded ones). The old rmtree+rename swap had a no-table window for
concurrent readers, who don't hold the broker mutex."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker


def _fact(spark, n_rows: int, value: float):
    return spark.range(n_rows).select(
        (F.col("id") % 5 + 1).cast("int").alias("station_id"),
        (F.lit("2024-01-01").cast("timestamp")
         + (F.col("id") / 5).cast("int") * F.expr("INTERVAL 1 DAY")
         ).alias("timestamp"),
        F.lit(value).alias("raw"),
    )


def _versions(b: Broker, table: str) -> list[str]:
    return sorted(
        e for e in os.listdir(b.path(table))
        if e.startswith("_v") and e[2:].isdigit()
    )


def test_write_creates_snapshot_and_keeps_previous(spark, tmp_path):
    # retention 0 = the bare rotation mechanics; the default time-based
    # retention is pinned by test_snapshot_retention_protects_slow_readers
    b = Broker(spark, str(tmp_path / "wh"), snapshot_retention=0)
    b.write("ts_p", _fact(spark, 50, 1.0), bucket_by_station=True)
    assert b.table_version("ts_p") == 1
    assert _versions(b, "ts_p") == ["_v00001"]
    b.write("ts_p", _fact(spark, 60, 2.0), bucket_by_station=True)
    # previous snapshot survives for in-flight readers
    assert b.table_version("ts_p") == 2
    assert _versions(b, "ts_p") == ["_v00001", "_v00002"]
    assert b.read("ts_p").count() == 60
    b.write("ts_p", _fact(spark, 70, 3.0), bucket_by_station=True)
    # only current + previous are retained by the write path
    assert _versions(b, "ts_p") == ["_v00002", "_v00003"]
    assert b.read("ts_p").count() == 70


def test_snapshot_retention_protects_slow_readers(spark, tmp_path):
    """DEFAULT brokers apply time-based snapshot retention (the Delta
    VACUUM model): a superseded snapshot is reclaimed only once its
    SUPERSEDER is older than the retention window, because a reader's
    file listing can outlive any number of later writes — keep-previous
    alone protects exactly one write of history (the r9 concurrency
    stress lost a probe's files to append+compact+vacuum). Backdating
    the superseder dirs proves it is the age check, not the floor, that
    releases them."""
    b = Broker(spark, str(tmp_path / "wh"))  # default retention
    for n in (1, 2, 3):
        b.write("meta", spark.createDataFrame(
            [(s, "p") for s in range(n)], "station_id int, parameter string"))
    # v1 is below the write-path floor but its superseder (v2) is
    # seconds old: retained for in-flight readers
    assert _versions(b, "meta") == ["_v00001", "_v00002", "_v00003"]
    b.vacuum()
    assert _versions(b, "meta") == ["_v00001", "_v00002", "_v00003"]
    # age the superseders past the window -> vacuum reclaims v1 and v2
    old = time.time() - b.snapshot_retention - 60
    for v in ("_v00002", "_v00003"):
        os.utime(os.path.join(b.path("meta"), v), (old, old))
    b.vacuum()
    assert _versions(b, "meta") == ["_v00003"]
    assert b.read("meta").count() == 3


def test_concurrent_reader_survives_rewrite(spark, tmp_path):
    """A scan planned before a rewrite completes on its snapshot while
    the writer swaps the table underneath; a post-swap read sees the new
    snapshot. With the old rmtree+rename layout the slow scan would hit
    deleted files."""
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 200, 1.0), bucket_by_station=True)

    scan = b.read("ts_p")  # resolves the _v00001 file listing

    def slow(batches):
        for pdf in batches:
            time.sleep(1.5)
            yield pdf

    slow_df = scan.mapInPandas(slow, scan.schema)
    result: dict = {}

    def run():
        try:
            result["n"] = slow_df.count()
        except Exception as exc:  # pragma: no cover - the failure mode
            result["err"] = exc

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.5)  # let the slow scan start reading _v00001
    b.write("ts_p", _fact(spark, 10, 2.0), bucket_by_station=True)
    t.join(timeout=120)
    assert "err" not in result, f"concurrent reader failed: {result.get('err')}"
    assert result["n"] == 200  # the reader's snapshot, not the new one
    assert b.read("ts_p").count() == 10  # post-swap read sees v2


def test_legacy_flat_layout_migrates(spark, tmp_path):
    """A warehouse written before versioning (flat parquet in the table
    root) reads as-is, counts as snapshot 0 on the first versioned
    write, and is reclaimed once superseded twice."""
    b = Broker(spark, str(tmp_path / "wh"), snapshot_retention=0)
    flat = b.path("ts_p")
    _fact(spark, 40, 1.0).write.parquet(flat)  # pre-versioning layout
    assert b.table_version("ts_p") is None
    assert b.exists("ts_p")
    assert b.read("ts_p").count() == 40
    b.write("ts_p", _fact(spark, 50, 2.0), bucket_by_station=True)
    # legacy files are the "previous snapshot": still on disk for readers
    assert any(f.endswith(".parquet") for f in os.listdir(flat))
    assert b.read("ts_p").count() == 50
    b.write("ts_p", _fact(spark, 60, 3.0), bucket_by_station=True)
    # superseded twice -> legacy layout reclaimed, _v00001 kept
    assert not any(f.endswith(".parquet") for f in os.listdir(flat))
    assert _versions(b, "ts_p") == ["_v00001", "_v00002"]
    assert b.read("ts_p").count() == 60


def test_vacuum_reclaims_superseded_snapshots(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"), snapshot_retention=0)
    b.write("meta", spark.createDataFrame(
        [(1, "p")], "station_id int, parameter string"))
    b.write("meta", spark.createDataFrame(
        [(1, "p"), (2, "p")], "station_id int, parameter string"))
    assert _versions(b, "meta") == ["_v00001", "_v00002"]
    b.vacuum()
    assert _versions(b, "meta") == ["_v00002"]
    assert b.read("meta").count() == 2


def test_small_dim_writes_are_versioned(spark, tmp_path):
    """pipeline_state / dropped_stations go through the same manifest
    flip (driver-side single-file snapshots)."""
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 20, 1.0), bucket_by_station=True)
    b._mark("p", "raw", "ts_p")
    assert b.table_version("pipeline_state") == 1
    b._mark("p", "qc", "ts_p")
    assert b.table_version("pipeline_state") == 2
    assert b.state().count() == 2
    b.drop_station(1, "p")
    assert b.table_version("dropped_stations") == 1
    assert b.read("dropped_stations").count() == 1


def test_layout_upgrade_and_downgrade_roundtrip(spark, tmp_path):
    """Alembic-twin migrations (reference supports downgrade too,
    tests/test_emptyDB.py:38-53): upgrade moves a flat (layout-1) table
    into a _v00001 snapshot behind a manifest; downgrade flattens the
    current snapshot back so an older engine reads the warehouse
    directly. Content preserved both ways."""
    b = Broker(spark, str(tmp_path / "wh"))
    _fact(spark, 40, 1.0).write.parquet(b.path("ts_p"))  # flat layout 1
    assert b.table_version("ts_p") is None
    b.upgrade_db_schema()
    # rung 2 snapshotted the flat files (v1), rung 3 rewrote them into
    # year-partitioned leaves (v2)
    assert b.table_version("ts_p") == 2
    assert b.get_setting("layout") == str(b.LAYOUT_VERSION)
    assert b._is_year_partitioned("ts_p")
    assert b.read("ts_p").count() == 40
    # a write on the upgraded layout makes another snapshot
    b.write("ts_p", _fact(spark, 50, 2.0), bucket_by_station=True)
    assert b.table_version("ts_p") == 3
    b.downgrade_db_schema(target=1)  # walk all rungs back down
    assert b.table_version("ts_p") is None
    assert b.get_setting("layout") == "1"
    assert not any(e.startswith("_v") for e in os.listdir(b.path("ts_p")))
    assert b.read("ts_p").count() == 50  # current snapshot survived


def test_merge_scoped_schema_change_falls_back_to_full_rewrite(spark, tmp_path):
    """A scoped stage result that ADDS a column (e.g. the first-ever
    fillup) cannot hard-link untouched buckets — per-bucket files must
    not diverge in schema — so _merge_scoped falls back to one full
    rewrite: touched stations carry the new values, untouched ones get
    NULL in the new column, nothing is lost."""
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 50, 1.0), bucket_by_station=True)
    out = (
        b.read("ts_p").drop("station_bucket")
        .filter(F.col("station_id") == 1)
        .withColumn("qc", F.col("raw"))
    )
    b._merge_scoped("ts_p", out, [1])
    df = b.read("ts_p")
    assert "qc" in df.columns
    assert df.count() == 50
    assert df.filter((F.col("station_id") == 1)
                     & (F.col("qc") != F.col("raw"))).count() == 0
    assert df.filter((F.col("station_id") == 1)
                     & F.col("qc").isNull()).count() == 0
    assert df.filter((F.col("station_id") != 1)
                     & F.col("qc").isNotNull()).count() == 0


def test_crashed_write_leftover_is_overwritten(spark, tmp_path):
    """A writer that died after materializing its snapshot dir but
    before flipping the manifest leaves an orphan _vNNNNN; the next
    write computes the same target version and mode=overwrite clears
    the leftover — no manual cleanup, readers never saw the orphan."""
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 30, 1.0), bucket_by_station=True)
    orphan = os.path.join(b.path("ts_p"), "_v00002")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as fh:
        fh.write("not parquet")
    assert b.table_version("ts_p") == 1  # manifest never flipped
    assert b.read("ts_p").count() == 30
    b.write("ts_p", _fact(spark, 40, 2.0), bucket_by_station=True)
    assert b.table_version("ts_p") == 2
    assert b.read("ts_p").count() == 40  # junk gone, snapshot clean


def test_time_travel_read_previous_snapshot(spark, tmp_path):
    """read(table, version=N) pins a snapshot still on disk — the write
    path retains the previous one until vacuum, so a stage's output can
    be diffed against its input."""
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 30, 1.0), bucket_by_station=True)
    b.write("ts_p", _fact(spark, 45, 2.0), bucket_by_station=True)
    assert b.read("ts_p").count() == 45
    assert b.read("ts_p", version=1).count() == 30
    assert b.read("ts_p", version=2).count() == 45
    # the on-disk candidates for a pinned read, ascending
    assert b.table_versions("ts_p") == [1, 2]
    assert b.table_versions("no_such_table") == []


def test_downgrade_with_legacy_leftovers_and_crashed_upgrade(spark, tmp_path):
    """Two migration edge cases: (a) downgrading a table whose root still
    holds pre-versioning 'snapshot 0' leftovers (kept by the write path
    for in-flight readers) must clear them first — otherwise the flatten
    collides on bucket dirs or unions duplicate part-files; (b) an
    upgrade over a partial _v00001 left by a crashed write must clear
    the orphan, not merge legacy rows with partial ones."""
    b = Broker(spark, str(tmp_path / "wh"))
    # (a) legacy flat table + ONE versioned write -> legacy kept as v0
    _fact(spark, 40, 1.0).write.parquet(b.path("ts_p"))
    b.write("ts_p", _fact(spark, 50, 2.0), bucket_by_station=True)
    assert any(f.endswith(".parquet") for f in os.listdir(b.path("ts_p")))
    # the snapshot is year-partitioned, so the un-stamped warehouse
    # detects as rung 3; walk all the way down to the flat layout
    b.downgrade_db_schema(target=1)
    assert b.table_version("ts_p") is None
    assert b.read("ts_p").count() == 50  # no legacy duplicates

    # (b) crashed write: orphan _v00001 beside a flat layout
    c = Broker(spark, str(tmp_path / "wh2"))
    _fact(spark, 30, 1.0).write.parquet(c.path("ts_d"))
    orphan = os.path.join(c.path("ts_d"), "_v00001")
    os.makedirs(orphan)
    _fact(spark, 99, 9.0).write.mode("overwrite").parquet(orphan)
    c.upgrade_db_schema()
    # rung 2 cleared the orphan and snapshotted the legacy rows (v1);
    # rung 3 rewrote them year-partitioned (v2)
    assert c.table_version("ts_d") == 2
    assert c.read("ts_d").count() == 30  # legacy rows only, orphan gone


def test_layout_migration_registry_walks_rungs_in_order(spark, tmp_path):
    """The ladder is additive (VERDICT r4 #5): a third rung registers via
    register_layout_migration and the walkers apply/unwind it in strict
    order — v1 -> v2 -> v3(dummy) -> v2 -> v1 — with one layout-settings
    flip per rung (the engine twin of the reference's alembic chain,
    alembic/versions/*)."""
    import os

    from weatherdb_spark.broker import (
        LAYOUT_MIGRATIONS,
        LayoutMigration,
        register_layout_migration,
    )

    marker = "_LAYOUT4_MARKER"

    def up4(broker):
        for t in broker._data_tables():
            open(os.path.join(broker.path(t), marker), "w").write("4")

    def down4(broker):
        for t in broker._data_tables():
            p = os.path.join(broker.path(t), marker)
            if os.path.exists(p):
                os.remove(p)

    # out-of-order registration is rejected (rung 5 before 4)
    with pytest.raises(ValueError, match="out of order"):
        register_layout_migration(LayoutMigration(5, "skip", up4, down4))

    register_layout_migration(LayoutMigration(4, "dummy marker", up4, down4))
    try:
        b = Broker(spark, str(tmp_path / "wh"))
        _fact(spark, 30, 1.0).write.parquet(b.path("ts_p"))  # flat layout 1
        assert b.LAYOUT_VERSION == 4
        assert b._layout_revision() == 1

        b.upgrade_db_schema()  # walks 1 -> 2 -> 3 -> 4
        assert b.get_setting("layout") == "4"
        assert b.table_version("ts_p") == 2  # rung 2 snapshotted, rung 3 rewrote
        assert b._is_year_partitioned("ts_p")  # rung 3 ran
        assert os.path.exists(os.path.join(b.path("ts_p"), marker))  # rung 4 ran
        assert b.read("ts_p").count() == 30

        b.downgrade_db_schema()  # one rung: 4 -> 3
        assert b.get_setting("layout") == "3"
        assert not os.path.exists(os.path.join(b.path("ts_p"), marker))
        assert b.table_version("ts_p") == 2  # snapshots intact

        b.downgrade_db_schema(target=1)  # 3 -> 2 -> 1
        assert b.get_setting("layout") == "1"
        assert b.table_version("ts_p") is None
        assert b.read("ts_p").count() == 30

        # bounded upgrade: stop at 2, not head
        b.upgrade_db_schema(target=2)
        assert b.get_setting("layout") == "2"
        assert not os.path.exists(os.path.join(b.path("ts_p"), marker))
    finally:
        LAYOUT_MIGRATIONS.pop(4, None)


def test_downgrade_unwinds_versioned_tables_despite_flat_straggler(spark, tmp_path):
    """A flat legacy table elsewhere in the warehouse pulls the
    EFFECTIVE revision back to 1 (so upgrades re-run over it), but a
    downgrade must still walk from the STAMPED revision and unwind the
    versioned tables — otherwise it silently no-ops and an older engine
    sees them as empty."""
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 50, 2.0), bucket_by_station=True)
    b.set_setting("layout", str(b.LAYOUT_VERSION))
    # straggler: a second table still in the pre-versioning flat layout
    _fact(spark, 20, 1.0).write.parquet(b.path("ts_et"))
    assert b._layout_revision() == 1  # pulled back by the straggler

    b.downgrade_db_schema(target=1)
    assert b.table_version("ts_p") is None  # actually flattened
    assert b.read("ts_p").count() == 50
    assert b.read("ts_et").count() == 20  # straggler passed through
    assert b.get_setting("layout") == "1"


def test_migration_target_out_of_range_raises(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 10, 1.0), bucket_by_station=True)
    with pytest.raises(ValueError, match="outside the registered range"):
        b.upgrade_db_schema(target=99)
    with pytest.raises(ValueError, match="outside the registered range"):
        b.downgrade_db_schema(target=0)


def test_create_db_schema_ignore_stamps_actual_layout_rung(spark, tmp_path):
    """create_db_schema(if_exists='ignore') must stamp the layout the
    kept tables actually have: a versioned bucket-only (rung 2) fact
    table is NOT rung 3, and stamping 3 would make upgrade_db_schema()
    skip the year-split rewrite it still needs."""
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("ts_p", _fact(spark, 50, 1.0), bucket_by_station=True)
    assert b._is_year_partitioned("ts_p")
    b.downgrade_db_schema(target=2)  # back to bucket-only snapshots
    assert not b._is_year_partitioned("ts_p")

    b.create_db_schema(if_exists="ignore")
    assert b.get_setting("layout") == "2"
    b.upgrade_db_schema()  # now actually walks rung 3
    assert b._is_year_partitioned("ts_p")
    assert b.get_setting("layout") == str(b.LAYOUT_VERSION)


def test_downgrade_rejects_newer_than_engine_layout(spark, tmp_path):
    """A warehouse stamped by a newer engine (layout revision above this
    engine's registered range) gets the interop story, not a KeyError
    from the migration walk."""
    b = Broker(spark, str(tmp_path / "wh"))
    b.set_setting("layout", str(b.LAYOUT_VERSION + 1))
    with pytest.raises(ValueError, match="newer than this engine"):
        b.downgrade_db_schema()


def test_cli_versions_command(spark, tmp_path, capsys):
    from weatherdb_spark.cli import main

    wh = str(tmp_path / "wh")
    b = Broker(spark, wh)
    b.write("ts_p", _fact(spark, 10, 1.0), bucket_by_station=True)
    b.write("ts_p", _fact(spark, 12, 2.0), bucket_by_station=True)
    assert main(["versions", "--warehouse", wh]) == 0
    assert "'ts_p': [1, 2]" in capsys.readouterr().out


def test_data_fix_migration_rung(spark, tmp_path):
    """A DataFixMigration rung repairs table CONTENTS through the normal
    snapshot write path: values transform up and back down, tables not
    named in the fix stay byte-identical across the whole walk, and a
    re-run (crashed-walk resume) never double-applies the fix."""
    import hashlib

    from pyspark.sql import functions as F

    from weatherdb_spark.broker import (
        LAYOUT_MIGRATIONS,
        DataFixMigration,
        register_layout_migration,
    )

    def _tree_hash(root):
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                p = os.path.join(dirpath, fn)
                h.update(os.path.relpath(p, root).encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
        return h.hexdigest()

    register_layout_migration(DataFixMigration(
        4, "exemplar value repair: raw doubles (and halves back)",
        {"ts_p": (
            lambda df: df.withColumn("raw", F.col("raw") * 2),
            lambda df: df.withColumn("raw", F.col("raw") / 2),
        )},
    ))
    try:
        b = Broker(spark, str(tmp_path / "wh"))
        _fact(spark, 30, 1.5).write.parquet(b.path("ts_p"))
        _fact(spark, 20, 7.0).write.parquet(b.path("ts_t"))
        b.upgrade_db_schema(target=3)     # layout rungs only
        untouched_before = _tree_hash(b.path("ts_t"))

        b.upgrade_db_schema()             # the data-fix rung
        assert b.get_setting("layout") == "4"
        assert b.read("ts_p").agg(F.min("raw"), F.max("raw")).first() == (3.0, 3.0)
        # the fix is a NEW snapshot (previous retained for readers)...
        assert b.table_version("ts_p") == 3
        # ...and the un-named table was never rewritten: byte-identical
        assert _tree_hash(b.path("ts_t")) == untouched_before
        # applied-ness is a sentinel INSIDE the snapshot dir, committed
        # atomically with the data by the manifest flip
        assert os.path.exists(os.path.join(
            b.path("ts_p"), b._version_dirname(3), "_DATAFIX_4"))

        # crashed-walk resume: re-running the rung must not double-apply
        LAYOUT_MIGRATIONS[4].upgrade(b)
        assert b.read("ts_p").agg(F.max("raw")).first()[0] == 3.0

        b.downgrade_db_schema()           # 4 -> 3: values restored
        assert b.get_setting("layout") == "3"
        assert b.read("ts_p").agg(F.min("raw"), F.max("raw")).first() == (1.5, 1.5)
        v = b.table_version("ts_p")
        assert not os.path.exists(os.path.join(
            b.path("ts_p"), b._version_dirname(v), "_DATAFIX_4"))
        assert _tree_hash(b.path("ts_t")) == untouched_before
        assert b.read("ts_t").count() == 20
    finally:
        LAYOUT_MIGRATIONS.pop(4, None)


def test_data_fix_rung_crash_windows(spark, tmp_path):
    """The sentinel-file datafix state must survive every crash window:
    (a) crash AFTER the manifest flip — resume must NOT double-apply the
    (non-idempotent) fix; (b) crash BEFORE the flip — resume applies it
    exactly once; (c) an UNRELATED routine write between a crash and the
    re-run is not mistaken for the fix (the version-number-proxy failure
    mode), while a routine write AFTER the fix propagates the sentinel
    and stays done; (d) crash mid-DOWNGRADE followed by an upgrade
    re-enters the stamped-but-incomplete rung; (e) a table dropped and
    re-created after the fix starts sentinel-less and is re-fixed."""
    from pyspark.sql import functions as F

    from weatherdb_spark.broker import (
        LAYOUT_MIGRATIONS,
        DataFixMigration,
        register_layout_migration,
    )

    fix = lambda df: df.withColumn("raw", F.col("raw") * 2)
    unfix = lambda df: df.withColumn("raw", F.col("raw") / 2)
    register_layout_migration(DataFixMigration(
        4, "crash-window exemplar", {"ts_p": (fix, unfix), "ts_t": (fix, unfix)},
    ))
    try:
        b = Broker(spark, str(tmp_path / "wh"))
        _fact(spark, 20, 1.0).write.parquet(b.path("ts_p"))
        _fact(spark, 20, 5.0).write.parquet(b.path("ts_t"))

        def mx(t):
            return b.read(t).agg(F.max("raw")).first()[0]

        # (c-pre) unrelated write BEFORE the fix ever ran: no sentinel
        # to propagate, so the rung still sees the table as un-fixed
        b.upgrade_db_schema(target=3)
        b.write("ts_p", b.read("ts_p").drop("station_bucket"),
                bucket_by_station=True)
        assert LAYOUT_MIGRATIONS[4].incomplete(b)

        b.upgrade_db_schema()
        assert mx("ts_p") == 2.0 and mx("ts_t") == 10.0

        # (a) crash after the flip (fix + sentinel landed, layout stamp
        # or later bookkeeping lost): re-running must not double-apply
        LAYOUT_MIGRATIONS[4].upgrade(b)
        assert mx("ts_p") == 2.0, "flip-then-crash resume double-applied"

        # (c-post) routine write of a FIXED table propagates the
        # sentinel: still done, still no double-apply
        b.write("ts_p", b.read("ts_p").drop("station_bucket"),
                bucket_by_station=True)
        assert not LAYOUT_MIGRATIONS[4].incomplete(b)
        LAYOUT_MIGRATIONS[4].upgrade(b)
        assert mx("ts_p") == 2.0, "unrelated write was mistaken for un-fixed"

        # (b)+(d mirror) crash mid-downgrade: ts_p un-fixed and
        # sentinel-less behind the layout-4 stamp; an UPGRADE must
        # converge on just that table
        b.write("ts_p", unfix(b.read("ts_p").drop("station_bucket")),
                bucket_by_station=True, drop_markers=["_DATAFIX_4"])
        assert b.get_setting("layout") == "4"
        assert LAYOUT_MIGRATIONS[4].incomplete(b)
        b.upgrade_db_schema()
        assert mx("ts_p") == 2.0, "stamped-incomplete rung was not re-entered"
        assert mx("ts_t") == 10.0, "completed sibling was double-applied"

        # (e) drop + re-create: the fresh table has no sentinel and the
        # next walk re-fixes it (no stale state anywhere to mislead)
        import shutil
        shutil.rmtree(b.path("ts_p"))
        b.write("ts_p", _fact(spark, 20, 3.0), bucket_by_station=True)
        assert LAYOUT_MIGRATIONS[4].incomplete(b)
        b.upgrade_db_schema()
        assert mx("ts_p") == 6.0, "re-created table was not re-fixed"

        # full downgrade still round-trips and clears every sentinel
        b.downgrade_db_schema()
        assert mx("ts_p") == 3.0 and mx("ts_t") == 5.0
        for t in ("ts_p", "ts_t"):
            v = b.table_version(t)
            assert not os.path.exists(os.path.join(
                b.path(t), b._version_dirname(v), "_DATAFIX_4"))
    finally:
        LAYOUT_MIGRATIONS.pop(4, None)

def test_data_fix_rung_honors_legacy_settings_record(spark, tmp_path):
    """The sentinel format replaced an earlier bookkeeping format that
    recorded per-table completion as a ``datafix_<v>`` settings key (a
    JSON list of done tables). A warehouse whose fix was applied under
    the OLD format has no sentinels — without conversion the next walk
    would re-apply the non-idempotent fix (double-apply corruption).
    The first state query must stamp sentinels for the legacy record's
    done tables, leave NOT-listed tables to be fixed, and drop the
    stale key."""
    import json as _json

    from pyspark.sql import functions as F

    from weatherdb_spark.broker import (
        LAYOUT_MIGRATIONS,
        DataFixMigration,
        register_layout_migration,
    )

    fix = lambda df: df.withColumn("raw", F.col("raw") * 2)
    unfix = lambda df: df.withColumn("raw", F.col("raw") / 2)
    register_layout_migration(DataFixMigration(
        4, "legacy-format exemplar", {"ts_p": (fix, unfix), "ts_t": (fix, unfix)},
    ))
    try:
        b = Broker(spark, str(tmp_path / "wh"))
        # a warehouse where the OLD engine already fixed ts_p (values
        # ARE doubled) and recorded it in the settings key, then died
        # before reaching ts_t
        _fact(spark, 10, 2.0).write.parquet(b.path("ts_p"))  # 1.0 fixed
        _fact(spark, 10, 5.0).write.parquet(b.path("ts_t"))  # un-fixed
        b.upgrade_db_schema(target=3)
        b.set_setting("datafix_4", _json.dumps(["ts_p"]))
        b.set_setting("layout", "3")

        def mx(t):
            return b.read(t).agg(F.max("raw")).first()[0]

        b.upgrade_db_schema()
        assert mx("ts_p") == 2.0, "legacy-done table was double-applied"
        assert mx("ts_t") == 10.0, "legacy-undone table was not fixed"
        assert b.get_setting("datafix_4") is None, "stale key lingers"
        # the conversion stamped a real sentinel: later walks stay done
        v = b.table_version("ts_p")
        assert os.path.exists(os.path.join(
            b.path("ts_p"), b._version_dirname(v), "_DATAFIX_4"))
        LAYOUT_MIGRATIONS[4].upgrade(b)
        assert mx("ts_p") == 2.0 and mx("ts_t") == 10.0

        # and the downgrade unwinds BOTH tables symmetrically
        b.downgrade_db_schema()
        assert mx("ts_p") == 1.0 and mx("ts_t") == 5.0
    finally:
        LAYOUT_MIGRATIONS.pop(4, None)


def test_data_fix_legacy_record_covers_flat_tables(spark, tmp_path):
    """A legacy-record table that is currently FLAT (manifest-less —
    e.g. rolled back below the snapshots rung) cannot carry a sentinel
    in place: the first WALK must VERSION it with a content-identical
    write whose atomic flip carries the sentinel — one step, no window
    where a stale record can mark later data done — never re-apply the
    non-idempotent fix, and drop a record entry whose table is gone
    (re-created data starts un-fixed). The state predicates read the
    record WITHOUT converting (querying state never writes)."""
    import json as _json

    from pyspark.sql import functions as F

    from weatherdb_spark.broker import (
        LAYOUT_MIGRATIONS,
        DataFixMigration,
        register_layout_migration,
    )

    fix = lambda df: df.withColumn("raw", F.col("raw") * 2)
    unfix = lambda df: df.withColumn("raw", F.col("raw") / 2)
    register_layout_migration(DataFixMigration(
        4, "flat-legacy exemplar", {"ts_p": (fix, unfix)},
    ))
    try:
        b = Broker(spark, str(tmp_path / "wh"))
        # a FLAT ts_p whose values the old engine already fixed, plus a
        # record also naming a since-dropped table
        _fact(spark, 10, 2.0).write.parquet(b.path("ts_p"))  # 1.0 fixed
        b.set_setting("datafix_4", _json.dumps(["ts_p", "ts_gone"]))

        def mx():
            return b.read("ts_p").agg(F.max("raw")).first()[0]

        rung = LAYOUT_MIGRATIONS[4]
        # state queries are READ-ONLY: the record covers the table, so
        # the rung reports done — but nothing is converted or written
        assert not rung.incomplete(b)
        assert rung.partially_applied(b)
        assert b.get_setting("datafix_4") is not None
        assert b.table_version("ts_p") is None  # still flat

        # the first WALK converts: the flat table is versioned
        # content-identically WITH the sentinel, the key is gone — and
        # the record-covered table is NOT double-applied
        rung.upgrade(b)
        assert b.get_setting("datafix_4") is None
        v = b.table_version("ts_p")
        assert v is not None and os.path.exists(os.path.join(
            b.path("ts_p"), b._version_dirname(v), "_DATAFIX_4"))
        assert mx() == 2.0, "flat-but-fixed table was double-applied"

        # symmetric unwind rides the proven sentinel machinery
        rung.downgrade(b)
        assert mx() == 1.0
        v = b.table_version("ts_p")
        assert not os.path.exists(os.path.join(
            b.path("ts_p"), b._version_dirname(v), "_DATAFIX_4"))
        # and a re-entered downgrade does not double-unfix
        rung.downgrade(b)
        assert mx() == 1.0
    finally:
        LAYOUT_MIGRATIONS.pop(4, None)


def test_downgrade_unwinds_partially_applied_rung_above_stamp(spark, tmp_path):
    """Crash window mirror of the upgrade re-entry: an upgrade of rung 4
    that dies AFTER fixing ts_p but BEFORE stamping layout=4 leaves
    fixed contents behind a layout-3 stamp. downgrade_db_schema must
    unwind the partial rung first — otherwise the 'content-preserving'
    contract breaks and a later upgrade (marker says done) never
    reconciles ts_p either."""
    from pyspark.sql import functions as F

    from weatherdb_spark.broker import (
        LAYOUT_MIGRATIONS,
        Broker,
        DataFixMigration,
        register_layout_migration,
    )

    class _Boom(Exception):
        pass

    def _explode(df):
        raise _Boom()

    register_layout_migration(DataFixMigration(
        4, "two-table repair whose second table crashes",
        {"ts_p": (
            lambda df: df.withColumn("raw", F.col("raw") * 2),
            lambda df: df.withColumn("raw", F.col("raw") / 2),
        ), "ts_t": (_explode, _explode)},
    ))
    try:
        b = Broker(spark, str(tmp_path / "wh"))
        _fact(spark, 10, 1.5).write.parquet(b.path("ts_p"))
        _fact(spark, 10, 7.0).write.parquet(b.path("ts_t"))
        b.upgrade_db_schema(target=3)

        with pytest.raises(_Boom):
            b.upgrade_db_schema()         # fixes ts_p, dies on ts_t
        assert b.get_setting("layout") == "3"        # stamp never moved
        assert b.read("ts_p").agg(F.max("raw")).first()[0] == 3.0  # but fixed
        assert LAYOUT_MIGRATIONS[4].partially_applied(b)

        b.downgrade_db_schema(target=3)   # no rung walk — just the unwind
        assert b.get_setting("layout") == "3"
        assert b.read("ts_p").agg(F.max("raw")).first()[0] == 1.5
        assert not LAYOUT_MIGRATIONS[4].partially_applied(b)
        assert b.read("ts_t").agg(F.max("raw")).first()[0] == 7.0
    finally:
        LAYOUT_MIGRATIONS.pop(4, None)
