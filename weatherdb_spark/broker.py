"""Broker — the maintenance-pipeline orchestrator (reference
weatherdb/broker.py:514-545, cli entry cli.py:160-164).

The reference loops four ``Stations*`` collections, dispatching per-station
SQL through a process pool; each stage flips ``last_imp_*`` flags in meta.
Spark-first: every stage is ONE DataFrame job over the tall fact table of a
parameter — the per-station parallel loop is the partitioning, the flags
become a ``pipeline_state`` watermark table
(models.py:100-110, StationBases.py:969-1018).

Storage is a parquet warehouse directory; each table is a set of
versioned snapshots behind a one-file manifest pointer (see the io
section — readers never observe a half-swapped table)::

    warehouse/
      meta/            station dim (one row per station+parameter)
        _MANIFEST.json     current-snapshot pointer (atomic flip)
        _v00001/ ...       snapshot dirs (previous kept for readers)
      ts_p/ ts_p_d/ ts_t/ ts_et/     tall fact tables (same layout,
                                     partitioned by station bucket)
      station_ma_raster/             multi-annual dim
      pipeline_state/                stage watermarks

Stage order (broker.py:514-545): update_meta -> update_raw ->
quality_check (p needs p_d filled first, broker.py:412-442) -> fillup ->
richter_correct. ``update_db`` runs all of them.

Scale notes: fact tables write partitioned by a station bucket so stage
jobs shuffle within buckets only; every dim join (meta, MA, kNN, Richter
params) is broadcast; stage jobs are pure DataFrame pipelines that AQE
re-plans at runtime.
"""

from __future__ import annotations

import atexit
import json
import os
import re
from collections.abc import Sequence
from contextlib import contextmanager
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weatherdb_spark.config import PARAMETERS
from weatherdb_spark.functions.caching import cache_scope, scoped_persist
from weatherdb_spark.operators.fillup import (
    daily_adjust_p,
    interpolate_gaps,
    median_fill,
    rank_fill,
)
from weatherdb_spark.operators.neighbors import knn_stations
from weatherdb_spark.operators.qc import qc_et, qc_p, qc_t
from weatherdb_spark.operators.richter import (
    richter_class,
    richter_correct,
    richter_parameters_df,
)
from weatherdb_spark.operators.timeline import expand_timeline

N_STATION_BUCKETS = 16  # partition count for fact-table writes

# ---------------------------------------------------------------- schema memo
# Every schema-less ``spark.read.parquet`` runs a driver-side footer-
# inference job BEFORE the query proper — over a many-leaf snapshot
# (epoch-partitioned corpus, bucketed facts) that is a 32-task job per
# read call, and one append/stage reads the same tables several times
# (profiled: ~10 inference jobs, up to ~0.9 s each, per corpus append).
# Snapshot dirs are immutable once their manifest flip lands (writes
# always create a NEW ``_vNNNNN`` dir), so the schema inferred on a
# snapshot's FIRST read is (a) memoized in-process and (b) persisted as
# ``_SPARK_SCHEMA.json`` inside the snapshot dir (underscore-prefixed:
# Spark's file discovery ignores it). The leaf-append/merge write paths
# carry the file forward to the snapshot they create — their column
# contract (enforced upfront) means the inferred schema cannot change —
# so a store that appends forever pays the inference job once, not once
# per read per version. Full rewrites (write()) do NOT carry it: their
# schema may legitimately change, and the next read re-infers once.
# Only ``_vNNNNN`` dirs get the file; legacy flat roots are mutable and
# always infer. Partition-column discovery (the ``ingest_epoch=N``
# dirs) still runs — only the footer read is skipped; the scan plan is
# otherwise identical.
_SCHEMA_MEMO: "dict[tuple[str, int], object]" = {}
_SCHEMA_MEMO_MAX = 512
_SCHEMA_FILE = "_SPARK_SCHEMA.json"


def _memo_put(key, schema) -> None:
    if len(_SCHEMA_MEMO) >= _SCHEMA_MEMO_MAX:
        _SCHEMA_MEMO.clear()
    _SCHEMA_MEMO[key] = schema


def _schema_memo_read(spark: SparkSession, path: str) -> DataFrame:
    from pyspark.sql.types import StructType

    try:
        apath = os.path.abspath(path)
        key = (apath, os.stat(path).st_mtime_ns)
    except OSError:
        return spark.read.parquet(path)
    schema = _SCHEMA_MEMO.get(key)
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    is_snapshot = os.path.basename(apath).startswith("_v")
    sfile = os.path.join(apath, _SCHEMA_FILE)
    if is_snapshot:
        try:
            with open(sfile) as fh:
                schema = StructType.fromJson(json.load(fh))
        except (OSError, ValueError, KeyError, TypeError):
            schema = None
        if schema is not None:
            _memo_put(key, schema)
            return spark.read.schema(schema).parquet(path)
    df = spark.read.parquet(path)
    schema = df.schema
    if is_snapshot:
        # best-effort persist for the next reader/process; the dir's
        # mtime bump just re-keys the in-process memo entry below
        try:
            tmp = sfile + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(schema.jsonValue(), fh)
            os.replace(tmp, sfile)
            key = (apath, os.stat(apath).st_mtime_ns)
        except OSError:
            pass
    _memo_put(key, schema)
    return df


def _carry_schema_file(prev_dir: str | None, new_dir: str) -> None:
    """Copy a snapshot's persisted schema into the snapshot that a
    leaf-append/merge derived from it (same columns by contract)."""
    if prev_dir is None:
        return
    src = os.path.join(prev_dir, _SCHEMA_FILE)
    dst = os.path.join(new_dir, _SCHEMA_FILE)
    try:
        if os.path.isfile(src) and not os.path.exists(dst):
            import shutil

            shutil.copyfile(src, dst)
    except OSError:
        pass


class LayoutMigration:
    """One rung of the warehouse layout ladder — the engine twin of an
    alembic revision (reference weatherdb/alembic/versions/*, e.g.
    V1.0.5_fix-ma-raster-values.py:1-152: every revision ships upgrade()
    AND downgrade()). ``upgrade(broker)`` takes every table from layout
    ``version - 1`` to ``version``; ``downgrade(broker)`` reverses it.
    Both must be idempotent per table (skip tables already in the target
    shape) so a crashed walk can re-run. The walkers own the broker
    mutex and the ``layout`` settings flips — rungs only move files."""

    def __init__(self, version: int, description: str, upgrade, downgrade):
        self.version = version
        self.description = description
        self.upgrade = upgrade
        self.downgrade = downgrade


#: ordered registry of layout rungs, keyed by the revision they reach
LAYOUT_MIGRATIONS: dict[int, LayoutMigration] = {}


def register_layout_migration(migration: LayoutMigration) -> None:
    """Append a rung to the ladder. Revisions must stay contiguous from 2
    (rung N upgrades FROM N-1), so the walk can never skip a revision."""
    expected = max(LAYOUT_MIGRATIONS, default=1) + 1
    if migration.version != expected:
        raise ValueError(
            f"layout migration {migration.version} out of order; "
            f"expected {expected}"
        )
    LAYOUT_MIGRATIONS[migration.version] = migration


def _snapshots_upgrade(broker: "Broker") -> None:
    """Layout 1 -> 2: flat table dirs move into a ``_v00001`` snapshot
    behind an atomically-flipped manifest pointer."""
    import shutil

    for table in broker._data_tables():
        if broker.table_version(table) is not None:
            continue
        root = broker.path(table)
        entries = broker._flat_entries(table)
        if not entries:
            continue
        vdir = os.path.join(root, broker._version_dirname(1))
        # a crashed write may have left a partial _v00001 with no
        # manifest flip — clear it, or its part-files would merge
        # with the legacy rows and double-count
        if os.path.isdir(vdir):
            shutil.rmtree(vdir)
        os.makedirs(vdir)
        for e in entries:
            os.rename(os.path.join(root, e), os.path.join(vdir, e))
        broker._flip_manifest(table, 1)


def _snapshots_downgrade(broker: "Broker") -> None:
    """Layout 2 -> 1: the current snapshot's files move up into the flat
    table root; manifests and superseded snapshots are removed."""
    import shutil

    for table in broker._data_tables():
        v = broker.table_version(table)
        if v is None:
            continue
        root = broker.path(table)
        vdir = broker.data_path(table, v)
        # pre-versioning "snapshot 0" leftovers (kept by the
        # write path for in-flight readers) are superseded —
        # clear them first, or the flatten would collide on
        # bucket dirs / union duplicate part-files into the root
        broker._cleanup_versions(table, v, keep_previous=False,
                                 retention=0)
        for e in os.listdir(vdir):
            os.rename(os.path.join(vdir, e), os.path.join(root, e))
        for e in os.listdir(root):
            p = os.path.join(root, e)
            if e.startswith("_v") and e[2:].isdigit():
                shutil.rmtree(p, ignore_errors=True)
            elif e.startswith(broker._MANIFEST):
                os.remove(p)


register_layout_migration(LayoutMigration(
    2, "flat table dirs -> versioned snapshots + manifest pointer",
    _snapshots_upgrade, _snapshots_downgrade,
))


def _year_partition_upgrade(broker: "Broker") -> None:
    """Layout 2 -> 3: rewrite fact tables into (station_bucket, ts_year)
    leaves so window-bounded incremental merges rewrite only touched
    years. A Spark rewrite (one pass per table), not a file move —
    optional as ever: the write path produces the new layout on the next
    full-stage write anyway, and year-less snapshots read fine."""
    for table in broker._data_tables():
        if not table.startswith("ts_"):
            continue
        if not broker.exists(table) or broker._is_year_partitioned(table):
            continue
        broker.write(
            table, broker.read(table).drop("station_bucket"),
            bucket_by_station=True,
        )


def _year_partition_downgrade(broker: "Broker") -> None:
    """Layout 3 -> 2: rewrite fact tables bucket-only (for engines that
    predate the year split — their scoped merges link whole bucket dirs
    and expect the files directly inside)."""
    for table in broker._data_tables():
        if not table.startswith("ts_"):
            continue
        if not broker.exists(table) or not broker._is_year_partitioned(table):
            continue
        df = broker.read(table).drop("station_bucket").withColumn(
            "station_bucket",
            F.pmod(F.col("station_id"), broker.bucket_count),
        ).sortWithinPartitions("station_bucket", "station_id", "timestamp")
        new = broker.table_version(table) + 1
        vdir = os.path.join(broker.path(table), broker._version_dirname(new))
        df.write.mode("overwrite").partitionBy("station_bucket").parquet(vdir)
        broker._flip_manifest(table, new)
        broker._cleanup_versions(table, new)


register_layout_migration(LayoutMigration(
    3, "fact tables gain ts_year partition leaves under each bucket",
    _year_partition_upgrade, _year_partition_downgrade,
))


class DataFixMigration(LayoutMigration):
    """A rung that repairs table CONTENTS instead of moving files — the
    engine twin of the reference's pure data-repair revisions (its
    alembic chain carries both layout changes and value fixes, e.g.
    alembic/versions/V1.0.5_fix-ma-raster-values.py:1-152, which
    rescales stored MA raster values in place).

    ``fixes`` maps table name -> ``(fix, unfix)``, two DataFrame ->
    DataFrame transforms; ``upgrade`` applies ``fix`` and ``downgrade``
    ``unfix``. Each rewrite goes through the normal MVCC write path —
    new snapshot dir, atomic manifest flip, previous snapshot retained
    for in-flight readers — and tables NOT named in ``fixes`` are never
    rewritten, so their snapshot files stay byte-identical across the
    walk.

    Unlike the file-move rungs, re-applying a value fix is NOT naturally
    idempotent (rescaling twice is a new corruption), so applied-ness is
    recorded as a ``_DATAFIX_<version>`` SENTINEL FILE inside the
    snapshot directory itself, committed atomically WITH the data by the
    manifest flip (the sentinel is written into the new snapshot dir
    before the flip; Spark ignores ``_``-prefixed files). The sentinel
    is ground truth in every crash window:

    - crash before the flip: the current snapshot (data AND sentinel
      state) is unchanged — the walk re-runs the table.
    - crash after the flip: data and sentinel landed together — the walk
      skips the table, no double-apply.
    - an UNRELATED write between a crash and the re-run cannot be
      mistaken for the fix (the failure mode of a version-number
      comparison): routine snapshot writes PROPAGATE existing sentinels
      forward (``Broker._flip_manifest``) — data derived from fixed data
      is fixed — while a write that happened instead of the crashed fix
      carries no sentinel, so the fix re-runs.
    - a dropped and re-created table starts sentinel-less and is
      re-fixed on the next walk.

    The walkers re-enter an incomplete rung at the stamped revision (see
    :meth:`Broker.upgrade_db_schema` / ``downgrade_db_schema``), so a
    crash mid-walk in either direction converges instead of stranding
    half-fixed tables behind a stamped layout.
    """

    def __init__(self, version: int, description: str, fixes: dict):
        self.fixes = dict(fixes)
        super().__init__(version, description, self._upgrade, self._downgrade)

    @property
    def marker(self) -> str:
        return f"_DATAFIX_{self.version}"

    @property
    def _setting_key(self) -> str:
        return f"datafix_{self.version}"

    def _convert_legacy(self, broker: "Broker") -> None:
        """One-time upgrade of the PRIOR bookkeeping format: early
        engines recorded per-table completion as a ``datafix_<version>``
        settings key holding the JSON list of done tables. A warehouse
        carrying that record has no sentinel files, so without this
        conversion :meth:`incomplete` would report its done tables
        un-applied and the next walk would RE-APPLY the non-idempotent
        fix (double-apply corruption).

        Conversion is record -> sentinel, completed HERE for every
        listed table: a versioned table gets the sentinel stamped into
        its current snapshot; a FLAT (manifest-less) table gets a
        content-identical versioning write whose atomic manifest flip
        CARRIES the sentinel — so in every crash window either the old
        flat state + record survive intact (re-run converges) or the
        sentinel is already authoritative. The record never outlives
        the first conversion, closing the window where a stale record
        could mark later data done. Dropped tables leave the record
        (re-created data starts un-fixed — though a table dropped and
        re-created FLAT before the first conversion is indistinguishable
        from the recorded one by name alone; an operator who did that
        must remove the record entry by hand, as with any pre-sentinel
        bookkeeping). Runs at the start of every WALK (the mutation
        path) and is a no-op once the key is gone; the state predicates
        :meth:`incomplete` / :meth:`partially_applied` instead READ the
        record (:meth:`_legacy_done`) without converting — merely
        querying migration state must never write the warehouse."""
        raw = broker.get_setting(self._setting_key)
        if raw is None:
            return
        for table in json.loads(raw):
            if not broker.exists(table):
                continue
            v = broker.table_version(table)
            if v is None:
                df = broker.read(table)
                if "station_bucket" in df.columns:
                    df = df.drop("station_bucket")
                broker.write(
                    table, df,
                    bucket_by_station=table.startswith("ts_"),
                    add_markers=[self.marker],
                )
                continue
            vdir = os.path.join(broker.path(table), broker._version_dirname(v))
            if os.path.isdir(vdir):
                open(os.path.join(vdir, self.marker), "a").close()
        broker.drop_setting(self._setting_key)

    def _is_done(self, broker: "Broker", table: str) -> bool:
        v = broker.table_version(table)
        if v is None:
            return False
        return os.path.exists(os.path.join(
            broker.path(table), broker._version_dirname(v), self.marker
        ))

    def _legacy_done(self, broker: "Broker") -> set:
        """Tables the PRIOR bookkeeping format records as fixed — the
        read-only view of the record :meth:`_convert_legacy` retires.
        The state predicates consult it instead of converting, so a
        caller merely querying migration state never mutates the
        warehouse; the conversion itself happens on the next walk."""
        raw = broker.get_setting(self._setting_key)
        return set(json.loads(raw)) if raw else set()

    def incomplete(self, broker: "Broker") -> bool:
        """True when some existing fixable table lacks the sentinel
        (and the legacy record doesn't cover it) — the walker re-enters
        the rung at the stamped revision. Read-only."""
        legacy = self._legacy_done(broker)
        return any(
            broker.exists(t)
            and not (self._is_done(broker, t) or t in legacy)
            for t in self.fixes
        )

    def partially_applied(self, broker: "Broker") -> bool:
        """True when ANY table carries the sentinel (or the legacy
        record marks it done) — the downgrade mirror of
        :meth:`incomplete`: an upgrade that crashed after fixing some
        tables but before stamping the layout leaves their contents at
        the HIGHER revision behind the lower stamp, and
        :meth:`Broker.downgrade_db_schema` must unwind this rung first
        or the rolled-back warehouse keeps half-fixed values.
        Read-only."""
        legacy = self._legacy_done(broker)
        return any(
            broker.exists(t)
            and (self._is_done(broker, t) or t in legacy)
            for t in self.fixes
        )

    def _walk(self, broker: "Broker", up: bool) -> None:
        self._convert_legacy(broker)
        for table, (fix, unfix) in self.fixes.items():
            if up == self._is_done(broker, table) or not broker.exists(table):
                continue
            df = broker.read(table)
            if "station_bucket" in df.columns:
                df = df.drop("station_bucket")
            broker.write(
                table, (fix if up else unfix)(df),
                bucket_by_station=table.startswith("ts_"),
                add_markers=[self.marker] if up else None,
                drop_markers=None if up else [self.marker],
            )

    def _upgrade(self, broker: "Broker") -> None:
        self._walk(broker, up=True)

    def _downgrade(self, broker: "Broker") -> None:
        self._walk(broker, up=False)


def _with_mutex(fn):
    """Run a Broker stage under the warehouse mutex — the reference wraps
    every public stage in ``with self.activate():`` and checks the schema
    first (broker.py:291-512)."""
    from functools import wraps

    @wraps(fn)
    def inner(self, *args, **kwargs):
        self.check_db_schema()
        with self.activate():
            return fn(self, *args, **kwargs)

    return inner


class Broker:
    """Stage-ordered pipeline over a parquet warehouse."""

    #: Time-based snapshot retention (the Delta-Lake VACUUM model, at a
    #: local-filesystem scale): a superseded table snapshot is reclaimed
    #: only once the snapshot that REPLACED it is at least this many
    #: seconds old, because a reader plans a file listing against the
    #: then-current snapshot and may scan it long after several further
    #: writes land — keep-previous alone protects exactly one write of
    #: history, and the r9 concurrency stress showed a probe losing its
    #: files to a rapid append+compact+vacuum sequence. 300 s covers any
    #: in-flight scan on this box (the heaviest sf0.1 query is < 60 s);
    #: a cluster deployment would raise it to hours the same way Delta
    #: defaults to 7 days. Reclamation-mechanics tests pass
    #: ``snapshot_retention=0`` to get the old eager behavior.
    DEFAULT_SNAPSHOT_RETENTION = 300.0

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str | None = None,
        lock_backend=None,
        snapshot_retention: float | None = None,
    ):
        if warehouse_dir is None:
            # user-config default (reference connects via the configured
            # database; here the warehouse dir is the analog knob)
            from weatherdb_spark.userconfig import get_config

            warehouse_dir = get_config().get("engine", "warehouse_dir")
        self.spark = spark
        self.dir = warehouse_dir
        self.snapshot_retention = (
            self.DEFAULT_SNAPSHOT_RETENTION if snapshot_retention is None
            else float(snapshot_retention)
        )
        os.makedirs(warehouse_dir, exist_ok=True)
        self._active = False
        self._lock_backend = lock_backend

    @property
    def lock_backend(self):
        """The warehouse-mutex backend: constructor override, else the
        ``[engine] lock_backend`` user-config knob (``posix`` default, a
        ``module:attr`` path for object-store deployments — see
        :mod:`weatherdb_spark.functions.locking`)."""
        if self._lock_backend is None:
            from weatherdb_spark.functions.locking import resolve_lock_backend
            from weatherdb_spark.userconfig import get_config

            cfg = get_config()
            spec = (
                cfg.get("engine", "lock_backend", fallback="posix")
                if cfg.has_section("engine") else "posix"
            )
            self._lock_backend = resolve_lock_backend(spec)
        return self._lock_backend

    # ------------------------------------------------- settings + version
    # The reference keeps a key-value ``settings`` table in the database
    # (broker.py:553-590: get_setting/set_setting with ON CONFLICT upsert).
    # Here it is a JSON file in the warehouse, replaced atomically.

    @property
    def _settings_path(self) -> str:
        return os.path.join(self.dir, "settings.json")

    def get_setting(self, key: str) -> str | None:
        try:
            with open(self._settings_path) as fh:
                return json.load(fh).get(key)
        except FileNotFoundError:
            return None

    def set_setting(self, key: str, value: str) -> None:
        try:
            with open(self._settings_path) as fh:
                settings = json.load(fh)
        except FileNotFoundError:
            settings = {}
        settings[key] = value
        tmp = self._settings_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(settings, fh, indent=1)
        os.replace(tmp, self._settings_path)

    def drop_setting(self, key: str) -> None:
        try:
            with open(self._settings_path) as fh:
                settings = json.load(fh)
        except FileNotFoundError:
            return
        if settings.pop(key, None) is not None:
            tmp = self._settings_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(settings, fh, indent=1)
            os.replace(tmp, self._settings_path)

    @staticmethod
    def _parse_version(v: str) -> tuple[int, ...]:
        return tuple(int(x) for x in re.findall(r"\d+", v))

    def get_db_version(self) -> str | None:
        """The package version the warehouse state was computed with
        (reference get_db_version, broker.py:592-603)."""
        return self.get_setting("version")

    def set_db_version(self, version: str | None = None) -> None:
        from weatherdb_spark import __version__

        self.set_setting("version", version or __version__)

    @property
    def bucket_count(self) -> int:
        """Station-bucket count of this warehouse's fact tables. PINNED in
        settings.json on first use: read-path bucket pruning derives the
        bucket from the station id, so the modulus must stay what the
        data was written with — the user-config [engine] n_station_buckets
        only seeds NEW warehouses."""
        cached = getattr(self, "_bucket_count", None)
        if cached is not None:
            return cached
        pinned = self.get_setting("n_station_buckets")
        if pinned is not None:
            self._bucket_count = int(pinned)
            return self._bucket_count
        if self._has_bucketed_tables():
            # pre-pinning warehouse: its fact tables were written with
            # the shipped default modulus — pin THAT, never the user
            # knob, or reads would prune against the wrong buckets and
            # scoped merges would mix moduli
            n = N_STATION_BUCKETS
        else:
            from weatherdb_spark.config import user_setting

            n = user_setting(
                "engine", "n_station_buckets", N_STATION_BUCKETS, cast=int
            )
        self.set_setting("n_station_buckets", str(n))
        self._bucket_count = n
        return n

    def _has_bucketed_tables(self) -> bool:
        """True when any fact table already holds station_bucket
        partition dirs (in its current snapshot or the flat legacy
        layout) — the bucket modulus is then a property of the data, not
        of configuration."""
        for table in os.listdir(self.dir) if os.path.isdir(self.dir) else []:
            if not table.startswith("ts_"):
                continue
            data = self.data_path(table)
            if os.path.isdir(data) and any(
                e.startswith("station_bucket=") for e in os.listdir(data)
            ):
                return True
        return False

    def _needs_reinitiation(self) -> bool:
        """True when the warehouse was computed by an older package
        version (or never stamped) — the reference then recomputes the
        whole database (broker.py:535-537)."""
        from weatherdb_spark import __version__

        db_v = self.get_db_version()
        return db_v is None or self._parse_version(__version__) > self._parse_version(db_v)

    # ------------------------------------------------------- broker mutex
    # The reference serializes concurrent brokers through a
    # ``broker_active`` settings flag guarded by ``activate()``
    # (broker.py:619-677): a second broker raises while the first runs.
    # A JSON read-modify-write is racy, so the flag goes through the
    # pluggable LockBackend (functions/locking.py): O_EXCL lock file by
    # default (atomic on POSIX), a conditional-put / lease backend on
    # object stores via the [engine] lock_backend knob.

    @property
    def lock_path(self) -> str:
        return os.path.join(self.dir, "broker.lock")

    @property
    def is_any_active(self) -> bool:
        """Whether any broker (this or another process) holds the lock."""
        return self.lock_backend.held(self.lock_path)

    @property
    def is_active(self) -> bool:
        return self._active

    def _deactivate(self) -> None:
        if self._active:
            self._active = False
            self.lock_backend.release(self.lock_path)

    @contextmanager
    def activate(self):
        """Hold the warehouse mutex for a pipeline run (reference
        ``Broker.activate``, broker.py:655-668). Reentrant within one
        broker so staged methods can nest under ``update_db``; a second
        broker raises RuntimeError like the reference. A crashed holder
        leaves the lock behind — clear it with
        :meth:`force_deactivate_all` (broker.py:670-677)."""
        if self._active:
            yield self
            return
        payload = json.dumps(
            {"pid": os.getpid(),
             "since": datetime.now(timezone.utc).isoformat()},
        )
        if not self.lock_backend.acquire(self.lock_path, payload):
            raise RuntimeError(
                "Another Broker is active and therefore this broker is "
                f"not allowed to run (lock: {self.lock_path}; clear a "
                "stale lock with force_deactivate_all())."
            )
        self._active = True
        atexit.register(self._deactivate)
        try:
            yield self
        finally:
            self._deactivate()
            atexit.unregister(self._deactivate)

    def force_deactivate_all(self) -> None:
        """Forcefully clear the active-broker lock, e.g. after a crashed
        run (reference force_deactivate_all, broker.py:670-677)."""
        self._deactivate()
        self.lock_backend.release(self.lock_path)

    # ------------------------------------------------------- schema check
    # Required key columns per warehouse table — the engine's twin of the
    # reference's alembic schema check (_check_db_schema, broker.py:
    # 207-237): every stage validates before running and points the user
    # at upgrade_db_schema on a mismatch.
    _SCHEMA_KEYS: dict[str, set[str]] = {
        "meta": {"station_id", "parameter"},
        "station_ma_raster": {"station_id", "parameter", "term", "value"},
        "station_ma_timeserie": {"station_id", "parameter", "kind", "value"},
        "pipeline_state": {"parameter", "stage", "watermark_from",
                           "watermark_until"},
        "dropped_stations": {"station_id", "parameter"},
        "raw_files": {"filepath", "modtime"},
    }
    _TS_KEYS = {"station_id", "timestamp"}

    def _schema_problems(self) -> dict[str, list[str]]:
        """{table: missing key columns} for every present table whose
        layout does not match the expected keys. Only parquet footers are
        read — no jobs."""
        problems: dict[str, list[str]] = {}
        for table in sorted(os.listdir(self.dir)):
            if table.startswith("_tmp_") or not os.path.isdir(self.path(table)):
                continue
            required = (
                self._TS_KEYS if table.startswith("ts_")
                else self._SCHEMA_KEYS.get(table)
            )
            if required is None or not self.exists(table):
                continue
            missing = required - set(self.read(table).columns)
            if missing:
                problems[table] = sorted(missing)
        return problems

    def check_db_schema(self) -> bool:
        """Validate the present warehouse tables against the expected key
        columns; raises with an upgrade hint on a mismatch (reference
        _check_db_schema, broker.py:207-237). Caches the positive result
        per broker."""
        if getattr(self, "_db_schema_valid", False):
            return True
        problems = [
            f"{t}: missing columns {missing}"
            for t, missing in self._schema_problems().items()
        ]
        if problems:
            raise RuntimeError(
                "warehouse schema is not up to date: "
                + "; ".join(problems)
                + ". Run Broker.upgrade_db_schema() to migrate it."
            )
        self._db_schema_valid = True
        return True

    def _clear_invalid_tables(self) -> list[str]:
        """Delete tables whose layout fails the schema check so a full
        reinitiation can proceed — ``initiate_db`` rewrites every table,
        and an older layout must not make the stage-level schema check
        abort exactly the rebuild that would fix it (the reference's
        'older version -> full recompute' promise, broker.py:535-537)."""
        import shutil

        removed = sorted(self._schema_problems())
        for table in removed:
            shutil.rmtree(self.path(table))
        self._db_schema_valid = False
        return removed

    # Warehouse layout versions (the engine's alembic revision chain —
    # reference weatherdb/alembic/versions/*, five revisions each with
    # upgrade() AND downgrade()):
    #   1 = flat table dirs (parquet files directly in <table>/)
    #   2 = versioned snapshots (<table>/_vNNNNN/ + _MANIFEST.json)
    #   3 = fact snapshots partitioned (station_bucket, ts_year) so
    #       incremental merges rewrite only touched years
    # Reads handle all of them (data_path falls back to the root when no
    # manifest exists; year-less snapshots just skip year pruning), so
    # migration is optional — but explicit
    # upgrade/downgrade keeps old warehouses and old engine versions
    # interoperable. New rungs register via
    # :func:`register_layout_migration`; the walkers below apply them
    # strictly in order, one settings flip per rung, so a crash between
    # rungs resumes from the recorded revision.

    #: tables appended to in place (no snapshot swap) — never migrated
    _APPEND_ONLY = {"export_telemetry"}

    @property
    def LAYOUT_VERSION(self) -> int:  # noqa: N802 (public constant-ish)
        """Newest layout revision the installed engine knows."""
        return max(LAYOUT_MIGRATIONS, default=1)

    def _data_tables(self) -> list[str]:
        return sorted(
            t for t in os.listdir(self.dir)
            if os.path.isdir(self.path(t))
            and not t.startswith("_tmp_")
            and t not in self._APPEND_ONLY
        )

    def _flat_entries(self, table: str) -> list[str]:
        """Entries of a table root that belong to the flat (layout-1)
        format — anything that is not a snapshot dir or manifest."""
        return [e for e in os.listdir(self.path(table))
                if not e.startswith(("_v", self._MANIFEST))]

    def _layout_revision(self) -> int:
        """The warehouse's current layout rung.

        Primary source is the ``layout`` setting; warehouses created
        before the setting existed are detected from the manifests. A
        straggler flat table (a crashed migration, or ``create_db_schema
        (if_exists='ignore')`` keeping legacy dirs) pulls the effective
        rung back to 1 so an upgrade re-runs the snapshot migration over
        it — rung upgrades are idempotent per table."""
        s = self.get_setting("layout")
        if s is not None:
            rev = int(s)
        else:
            tables = self._data_tables()
            versioned = [t for t in tables if self.table_version(t) is not None]
            if not versioned:
                rev = 1
            elif any(self._is_year_partitioned(t) for t in versioned):
                rev = 3
            else:
                rev = 2
        if rev > 1 and any(
            self.table_version(t) is None and self._flat_entries(t)
            for t in self._data_tables()
        ):
            rev = 1
        return rev

    def upgrade_db_schema(self, target: int | None = None) -> None:
        """Migrate older warehouse layouts forward (reference
        upgrade-db-schema CLI / ``alembic upgrade head``): apply every
        registered rung above the current revision, in order, up to
        ``target`` (default: newest), then re-validate the key columns.

        Runs under the broker mutex (like :meth:`downgrade_db_schema`):
        migrations os.rename() files out of live table roots, which would
        yank them from under a stage another broker is running — exactly
        the mid-scan hazard the snapshot layer closes."""
        target = self.LAYOUT_VERSION if target is None else int(target)
        if not 1 <= target <= self.LAYOUT_VERSION:
            raise ValueError(
                f"layout target {target} outside the registered range "
                f"1..{self.LAYOUT_VERSION}"
            )
        with self.activate():
            cur = self._layout_revision()
            # a data-fix rung stamped as current may be INCOMPLETE (a
            # crash mid-downgrade leaves some tables un-fixed behind an
            # already-stamped layout, and re-running upgrade would
            # otherwise skip the rung entirely); re-enter it first —
            # data-fix upgrades are marker-idempotent, so this never
            # double-applies
            cur_rung = LAYOUT_MIGRATIONS.get(cur)
            if cur_rung is not None and getattr(
                cur_rung, "incomplete", lambda b: False
            )(self):
                cur_rung.upgrade(self)
            for v in range(cur + 1, target + 1):
                LAYOUT_MIGRATIONS[v].upgrade(self)
                self.set_setting("layout", str(v))
            # normalize a missing/stale setting even when no rung ran
            self.set_setting("layout", str(max(cur, target)))
        self._db_schema_valid = False
        self.check_db_schema()

    def downgrade_db_schema(self, target: int | None = None) -> None:
        """Roll the warehouse layout back to ``target`` (default: one
        revision — reference ``alembic downgrade -1``,
        tests/test_emptyDB.py:38-53), applying each rung's downgrade in
        reverse order. Content-preserving — an engine built for the
        target revision can then read the warehouse directly.

        The walk starts from the STAMPED revision, not the effective one:
        ``_layout_revision`` pulls the effective rung back to 1 when a
        legacy flat straggler exists (so upgrades re-run over it), but a
        downgrade must still unwind the versioned tables — each rung's
        downgrade is idempotent per table, so the straggler just passes
        through."""
        with self.activate():
            s = self.get_setting("layout")
            cur = int(s) if s is not None else self._layout_revision()
            if cur > self.LAYOUT_VERSION:
                # stamped by a newer engine (or a session with extra
                # registered rungs): fail with the interop story, not a
                # KeyError from the migration walk
                raise ValueError(
                    f"warehouse layout {cur} is newer than this engine's "
                    f"registered revisions (1..{self.LAYOUT_VERSION}) — "
                    "downgrade it with the engine that created it"
                )
            target = max(1, cur - 1) if target is None else int(target)
            if not 1 <= target <= self.LAYOUT_VERSION:
                raise ValueError(
                    f"layout target {target} outside the registered range "
                    f"1..{self.LAYOUT_VERSION}"
                )
            # mirror of the upgrade path's incomplete-rung re-entry: an
            # upgrade of rung cur+1 that crashed AFTER fixing some
            # tables but BEFORE stamping leaves those contents at the
            # higher revision behind the lower stamp — unwind that rung
            # first (its downgrade touches only tables marked done, so
            # un-applied tables pass through)
            above = LAYOUT_MIGRATIONS.get(cur + 1)
            if above is not None and getattr(
                above, "partially_applied", lambda b: False
            )(self):
                above.downgrade(self)
            for v in range(cur, target, -1):
                LAYOUT_MIGRATIONS[v].downgrade(self)
                self.set_setting("layout", str(v - 1))

    # ---------------------------------------------------------------- io
    # Tables are MVCC-lite: each rewrite lands in a fresh `_vNNNNN`
    # snapshot dir inside the table root, then a one-file manifest
    # pointer flips atomically (os.replace). Readers resolve through the
    # manifest, so a reader that planned its scan before a rewrite keeps
    # its snapshot's files — the writer never deletes the immediately
    # previous version (only vacuum() reclaims all superseded
    # snapshots). Writers are already serialized by the broker mutex;
    # this closes the other half: readers don't take the lock, and the
    # old rmtree+rename swap had a no-table window plus a
    # files-vanish-mid-scan hazard. Snapshot dirs start with `_` so any
    # legacy flat-layout reader ignores them during migration (Spark
    # skips `_`/`.`-prefixed paths in file discovery).

    _MANIFEST = "_MANIFEST.json"

    def path(self, table: str) -> str:
        """The table's root directory (contains snapshot dirs + manifest
        for versioned tables; raw files for legacy/append-only ones)."""
        return os.path.join(self.dir, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.path(table), self._MANIFEST)

    def table_version(self, table: str) -> int | None:
        """Current snapshot number, or None for a legacy/append-only
        (unversioned) table layout."""
        try:
            with open(self._manifest_path(table)) as fh:
                return int(json.load(fh)["version"])
        except (FileNotFoundError, NotADirectoryError):
            return None

    @staticmethod
    def _version_dirname(version: int) -> str:
        return f"_v{version:05d}"

    def table_versions(self, table: str) -> list[int]:
        """Snapshot numbers still on disk, ascending — the candidates for
        a time-travel ``read(table, version=...)`` (normally the current
        snapshot plus its predecessor; vacuum reclaims older ones)."""
        root = self.path(table)
        try:
            entries = os.listdir(root)
        except (FileNotFoundError, NotADirectoryError):
            return []
        return sorted(
            int(e[2:]) for e in entries
            if e.startswith("_v") and e[2:].isdigit()
        )

    def data_path(self, table: str, version: int | None = None) -> str:
        """The directory Spark scans for the table's current (or a
        pinned) snapshot."""
        root = self.path(table)
        v = version if version is not None else self.table_version(table)
        return root if v is None else os.path.join(root, self._version_dirname(v))

    def _flip_manifest(self, table: str, version: int,
                       add_markers=None, drop_markers=None) -> None:
        """Atomically point the table at snapshot ``version``.

        Before the flip, ``_DATAFIX_*`` sentinel files from the
        OUTGOING current snapshot are copied into the new one (minus
        ``drop_markers``, plus ``add_markers``): a data-fix rung's
        applied-ness travels WITH the data it applies to, so a routine
        rewrite of a fixed table stays marked fixed, while a snapshot
        that did not derive from the fix (fresh create) carries no
        sentinel — see :class:`DataFixMigration`. The copy happens
        pre-flip, so a crash here leaves the old snapshot current and
        the whole write re-runs."""
        vdir = os.path.join(self.path(table), self._version_dirname(version))
        prev = self.table_version(table)
        markers = set()
        if prev is not None and prev != version:
            pdir = os.path.join(self.path(table), self._version_dirname(prev))
            if os.path.isdir(pdir):
                markers = {f for f in os.listdir(pdir)
                           if f.startswith("_DATAFIX_")}
        markers -= set(drop_markers or ())
        markers |= set(add_markers or ())
        for m in markers:
            open(os.path.join(vdir, m), "a").close()
        mp = self._manifest_path(table)
        tmp = mp + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"version": version,
                 "written_at": datetime.now(timezone.utc).isoformat()},
                fh,
            )
        os.replace(tmp, mp)  # atomic pointer flip

    def _pinned_snapshot_versions(self, table: str) -> "set[int]":
        """Versions a live-reader contract pins beyond the floor/
        retention rules — never reclaimed while pinned. Base broker
        pins nothing; the IVF index broker pins the pair-manifest
        versions (``llm/similarity.py``)."""
        return set()

    def _cleanup_versions(self, table: str, current: int,
                          keep_previous: bool = True,
                          retention: float | None = None) -> None:
        """Reclaim superseded snapshots, subject to the broker's
        time-based retention: a snapshot below the floor is removed
        only once the snapshot that SUPERSEDED it (the next-higher
        version still on disk) is older than ``snapshot_retention``
        seconds — a reader's file listing can outlive any number of
        subsequent writes, and age of the superseder bounds how long
        ago the candidate stopped being readable-current. The write
        path additionally keeps the immediately previous snapshot
        regardless of age; vacuum passes keep_previous=False. Legacy
        flat-layout files count as snapshot 0. ``retention`` overrides
        the broker default for callers that must clear the floor NOW
        (the layout downgrade, which moves files into the table
        root)."""
        import shutil
        import time as _time

        if retention is None:
            retention = self.snapshot_retention
        pinned = self._pinned_snapshot_versions(table)
        root = self.path(table)
        floor = current - 1 if keep_previous else current
        entries = os.listdir(root)
        versions = sorted(
            int(e[2:]) for e in entries
            if e.startswith("_v") and e[2:].isdigit()
        )
        now = _time.time()

        def released(n: int) -> bool:
            if retention <= 0:
                return True
            # age check against the superseder; no successor dir on
            # disk means the supersession is the in-flight write
            # itself — just happened, keep
            succ = next((v for v in versions if v > n), None)
            if succ is None:
                return False
            try:
                mt = os.path.getmtime(
                    os.path.join(root, self._version_dirname(succ)))
            except OSError:
                return False
            return now - mt > retention

        for entry in entries:
            p = os.path.join(root, entry)
            if entry.startswith("_v") and entry[2:].isdigit():
                n = int(entry[2:])
                if n < floor and n not in pinned and released(n):
                    shutil.rmtree(p, ignore_errors=True)
            elif entry != self._MANIFEST and 0 < floor and released(0):
                # pre-versioning flat layout ("snapshot 0"), superseded
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    os.remove(p)

    def exists(self, table: str) -> bool:
        p = self.data_path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    # ------------------------------------------------- period memo cache
    # The reference memoizes resolved station periods for one minute
    # (StationBases.py:313-356 _check_period cache) so a chatty notebook
    # session doesn't pay one aggregation job per read. Entries are keyed
    # by table + query shape and pinned to the table's snapshot version —
    # any write flips the manifest, which invalidates the entry without
    # writer-side bookkeeping (correct across brokers too).

    PERIOD_CACHE_TTL = 60.0

    def cache_lookup(self, table: str, key: tuple):
        import time

        entry = getattr(self, "_memo_cache", {}).get((table, key))
        if entry is None:
            return None
        expires, version, value = entry
        if time.monotonic() > expires or version != self.table_version(table):
            del self._memo_cache[(table, key)]
            return None
        return value

    def cache_store(self, table: str, key: tuple, value) -> None:
        import time

        if not hasattr(self, "_memo_cache"):
            self._memo_cache = {}
        self._memo_cache[(table, key)] = (
            time.monotonic() + self.PERIOD_CACHE_TTL,
            self.table_version(table),
            value,
        )

    #: fact-table partition scheme: station bucket (scoped-stage merges,
    #: single-station reads) x calendar year (window-bounded incremental
    #: merges, period reads). At 100 TB a one-day import must not rewrite
    #: the table — with the year split it rewrites only the touched
    #: (bucket, year) leaves and hard-links the rest.
    _FACT_PARTITION_COLS = ("station_bucket", "ts_year")

    def _with_fact_partition_cols(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "station_bucket", F.pmod(F.col("station_id"), self.bucket_count)
        ).withColumn("ts_year", F.year("timestamp"))

    def read(self, table: str, version: int | None = None,
             years: "list[int] | None" = None) -> DataFrame:
        """Read the table's current snapshot, or — time-travel — a pinned
        ``version`` that is still on disk (the write path retains the
        immediately previous snapshot until vacuum; useful to diff a
        stage's output against its input).

        ``years`` restricts a fact table to the given calendar years via
        partition pruning — the scan never opens the other years' files.
        The ``ts_year`` partition column itself is derived (it equals
        year(timestamp)) and is dropped from the returned frame; legacy
        snapshots written before the year split ignore ``years``."""
        df = _schema_memo_read(self.spark, self.data_path(table, version))
        if "ts_year" in df.columns:
            if years is not None:
                df = df.filter(F.col("ts_year").isin([int(y) for y in years]))
            df = df.drop("ts_year")
        return df

    def write(
        self,
        table: str,
        df: DataFrame,
        bucket_by_station: bool = False,
        compact: bool = False,
        add_markers=None,
        drop_markers=None,
        partition_cols: "tuple[str, ...] | None" = None,
    ) -> None:
        """Write a new table snapshot and flip the manifest pointer.

        Stage outputs are lazy plans over the same table's current
        files, so a direct overwrite would delete its own input
        mid-scan; writing into a fresh snapshot dir side-steps that, and
        the manifest flip (one ``os.replace``) means concurrent readers
        either see the old snapshot or the new one — never a missing or
        half-written table. The previous snapshot stays on disk for
        in-flight readers; older ones are reclaimed here, the previous
        one by :meth:`vacuum`. ``compact=True`` shuffles to one file per
        station bucket (or one file total for dim tables) — the vacuum
        path. ``partition_cols`` writes a dim table with those leaf
        dirs (``df`` must carry the columns) — how vacuum preserves an
        epoch-partitioned table's layout (one file per leaf under
        compact) instead of flattening it."""
        if bucket_by_station:
            df = self._with_fact_partition_cols(df)
            if compact:
                # hash-partition on the bucket column: each bucket's rows
                # land in exactly one task -> one file per partition dir
                # (the year split then gives one file per (bucket, year))
                df = df.repartition(self.bucket_count, "station_bucket")
            # local sort (no shuffle) so each parquet row group covers a
            # narrow (station_id, timestamp) range: single-station and
            # period reads then skip row groups via footer min/max stats.
            # The partition columns lead the order so the writer's
            # required partition-column ordering is a satisfied prefix —
            # otherwise FileFormatWriter inserts its own sort (a second
            # pass) and the clustering survives only via sort stability,
            # an implementation detail.
            df = df.sortWithinPartitions(*self._FACT_PARTITION_COLS,
                                         "station_id", "timestamp")
        elif partition_cols:
            if compact:
                # each partition value lands in one task -> one file per
                # leaf dir; the leading sort satisfies the writer's
                # partition-column ordering (no second SortExec)
                df = df.repartition(*[F.col(c) for c in partition_cols])
            df = df.sortWithinPartitions(*partition_cols)
        elif compact:
            df = df.coalesce(1)
        new = (self.table_version(table) or 0) + 1
        target = os.path.join(self.path(table), self._version_dirname(new))
        w = df.write.mode("overwrite")  # overwrite clears crashed leftovers
        if bucket_by_station:
            w = w.partitionBy(*self._FACT_PARTITION_COLS)
        elif partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(target)
        self._flip_manifest(table, new, add_markers=add_markers,
                            drop_markers=drop_markers)
        self._cleanup_versions(table, new)

    def _n_parquet_files(self, table: str) -> int:
        n = 0
        for _root, _dirs, files in os.walk(self.data_path(table)):
            n += sum(f.endswith(".parquet") for f in files)
        return n

    def _max_files_per_leaf(self, table: str) -> int:
        """Most parquet files in any single leaf partition directory of
        the current snapshot. Fragmentation is a per-leaf property now
        that fact tables split into (station_bucket, ts_year) dirs — a
        perfectly compacted 50-year table legitimately holds
        buckets x 50 files, so a table-total threshold would declare it
        fragmented forever and turn every vacuum into a full rewrite."""
        mx = 0
        for _root, _dirs, files in os.walk(self.data_path(table)):
            mx = max(mx, sum(f.endswith(".parquet") for f in files))
        return mx

    # ------------- typed collection accessors (reference broker.py:33-41
    # builds self.stations_pd/_et/_t/_p in __init__; here they're lazy
    # properties so constructing a Broker doesn't import the facade)
    @property
    def stations_p(self):
        from weatherdb_spark.station import StationsP

        return StationsP(self)

    @property
    def stations_pd(self):
        from weatherdb_spark.station import StationsPD

        return StationsPD(self)

    @property
    def stations_t(self):
        from weatherdb_spark.station import StationsT

        return StationsT(self)

    @property
    def stations_et(self):
        from weatherdb_spark.station import StationsET

        return StationsET(self)

    @property
    def stations(self) -> list:
        """All four typed collections in the reference's stage order
        (broker.py:37-41)."""
        return [self.stations_pd, self.stations_et, self.stations_t,
                self.stations_p]

    def vacuum(self, max_files_per_bucket: int = 2) -> dict[str, tuple[int, int]]:
        """Compact fragmented tables (the engine twin of the reference's
        ``VACUUM ANALYZE``, broker.py:547-551): repeated stage rewrites and
        merges leave every fact-table partition with one file per shuffle
        task; when any (station_bucket, ts_year) leaf exceeds
        ``max_files_per_bucket`` files (or a dim table exceeds a few
        files), rewrite the table to one file per leaf.
        Content-preserving — only the file layout changes. Also reclaims
        superseded table snapshots that have aged past the broker's
        ``snapshot_retention`` window (the Delta VACUUM model — see
        :attr:`DEFAULT_SNAPSHOT_RETENTION`); recently superseded
        snapshots stay for in-flight readers whose file listings
        predate the newer writes.
        Returns {table: (files_before, files_after)}."""
        compacted: dict[str, tuple[int, int]] = {}
        with self.activate():
            for table in sorted(os.listdir(self.dir)):
                if table.startswith("_tmp_") or not os.path.isdir(self.path(table)):
                    continue
                n_before = self._n_parquet_files(table)
                bucketed = table.startswith("ts_")
                # partition-keyed dim tables (CorpusStore's epoch layout)
                # compact per LEAF and keep their dirs — a flat rewrite
                # would lose epoch pruning and re-trigger the layout
                # migration on the next append; their fragmentation is a
                # per-leaf property like the fact tables'
                pcols = () if bucketed else self._dim_partition_cols(table)
                fragmented = (
                    self._max_files_per_leaf(table) > max_files_per_bucket
                    if (bucketed or pcols) else n_before > 4
                )
                if fragmented:
                    df = self.read(table)
                    if bucketed:
                        df = df.drop("station_bucket")
                    self.write(table, df, bucket_by_station=bucketed,
                               compact=True, partition_cols=pcols or None)
                    compacted[table] = (n_before, self._n_parquet_files(table))
                v = self.table_version(table)
                if v is not None:
                    self._cleanup_versions(table, v, keep_previous=False)
        return compacted

    def _table_span(self, table: str):
        """min/max timestamp of the CURRENT snapshot from parquet footer
        statistics — O(#files) driver-side metadata reads instead of a
        full executor scan per stage completion (the scan was one extra
        full table pass per stage per parameter). Falls back to the
        Spark aggregation when any file lacks row-group statistics."""
        import pyarrow.parquet as pq

        root = self.data_path(table)
        lo = hi = None
        try:
            for dirpath, _dirs, files in os.walk(root):
                for fname in files:
                    if not fname.endswith(".parquet"):
                        continue
                    md = pq.ParquetFile(
                        os.path.join(dirpath, fname)
                    ).metadata
                    idx = next(
                        (
                            i for i in range(md.num_columns)
                            if md.schema.column(i).name == "timestamp"
                        ),
                        None,
                    )
                    if idx is None:
                        raise ValueError("no timestamp column")
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            raise ValueError("missing statistics")
                        if lo is None or st.min < lo:
                            lo = st.min
                        if hi is None or st.max > hi:
                            hi = st.max
        except Exception:
            row = self.read(table).agg(
                F.min("timestamp"), F.max("timestamp")
            ).first()
            return row[0], row[1]

        def _naive(ts):
            # footer stats come back tz-aware (parquet adjusted-to-UTC);
            # watermark strings are naive like the Spark-aggregate form.
            # DATE-typed columns yield datetime.date (no tzinfo) — pass.
            if ts is not None and getattr(ts, "tzinfo", None) is not None:
                ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
            return ts

        return _naive(lo), _naive(hi)

    def _mark(self, parameter: str, stage: str, table: str) -> None:
        """Record the stage watermark (the processed period) — the engine's
        form of ``last_imp_*`` flags + ``last_imp_from/until`` meta columns.
        Reads the freshly written table's parquet FOOTERS: stage plans are
        lazy over the files the write just replaced, and a full scan per
        stage would not survive the 100 TB design target."""
        lo, hi = self._table_span(table)
        lo = str(lo) if lo is not None else None
        hi = str(hi) if hi is not None else None
        row = self.spark.createDataFrame(
            [(parameter, stage, lo, hi, datetime.now(timezone.utc).isoformat())],
            "parameter string, stage string, watermark_from string, "
            "watermark_until string, updated_at string",
        )
        prev = (
            self.read("pipeline_state").filter(
                ~((F.col("parameter") == parameter) & (F.col("stage") == stage))
            )
            if self.exists("pipeline_state")
            else None
        )
        out = prev.unionByName(row) if prev is not None else row
        self._write_small("pipeline_state", out)

    def _ensure_dir(self, table: str) -> str:
        p = self.path(table)
        os.makedirs(p, exist_ok=True)
        return p

    def _write_small(self, table: str, df: DataFrame) -> None:
        """Driver-side single-file snapshot write for tiny dims
        (pipeline_state, dropped_stations) — same manifest-flip
        visibility rules as :meth:`write`, without a Spark job.

        The parquet schema is pinned to the DataFrame's declared schema:
        a plain ``pandas.to_parquet`` re-infers types per column, so an
        all-NULL string column (an empty import's watermarks) would land
        as a null/int64 column and every later read-union of the dim
        would try to cast real values into it."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        self._ensure_dir(table)
        new = (self.table_version(table) or 0) + 1
        vdir = os.path.join(self.path(table), self._version_dirname(new))
        os.makedirs(vdir, exist_ok=True)
        tbl = pa.Table.from_pandas(
            df.toPandas(), schema=to_arrow_schema(df.schema),
            preserve_index=False,
        )
        pq.write_table(tbl, os.path.join(vdir, "data.parquet"))
        self._flip_manifest(table, new)
        self._cleanup_versions(table, new)

    def state(self) -> DataFrame:
        return self.read("pipeline_state")

    def _require(
        self, table: str, needed_for: str,
        hint: str = "run the corresponding update-raw first",
    ) -> None:
        """Fail with a stage-level message instead of a raw path-does-
        not-exist AnalysisException deep inside a lazy plan."""
        if not self.exists(table):
            raise FileNotFoundError(
                f"table {table!r} is required for {needed_for} but is not "
                f"in the warehouse — {hint}"
            )

    def _assert_unique_keys(self, df: DataFrame, what: str) -> None:
        """Raise on duplicate (station_id, timestamp) keys in an import
        batch — the engine twin of the reference raw tables' primary-key
        constraint (db/models.py timestamp PKs): duplicate keys would
        silently corrupt every downstream keyed merge. One map-side
        partial agg over the BATCH (not the archive), dwarfed by the
        write shuffle it precedes."""
        dup = (
            df.groupBy("station_id", "timestamp")
            .count().filter(F.col("count") > 1).take(3)
        )
        if dup:
            ex = ", ".join(
                f"({r['station_id']}, {r['timestamp']})" for r in dup
            )
            raise ValueError(
                f"duplicate (station_id, timestamp) keys in {what}: {ex} — "
                "collapse duplicates first (the ingest chain averages "
                "within-file duplicates; see sources.dwd.ingest_p_raw)"
            )

    # ------------------------------------------------------------- stages
    @_with_mutex
    def update_meta(self, meta: DataFrame) -> None:
        """S5 — (re)write the station dim. Maintains BOTH coordinate
        systems like the reference's meta upsert (PostGIS transform
        between 4326 and 25832 on every update, StationsBase.py:147-222,
        StationBases.py:1817-1846): whichever of (lon, lat) / (x_utm,
        y_utm) is missing is derived from the other via the Krueger
        series (functions/spatial.py). Derives richter_class from the
        horizon column when present (update_richter_class,
        StationP.py:450-484)."""
        from weatherdb_spark.functions.spatial import utm_to_wgs84, wgs84_to_utm

        cols = set(meta.columns)
        if not {"x_utm", "y_utm"} <= cols and {"lon", "lat"} <= cols:
            x, y = wgs84_to_utm(F.col("lon"), F.col("lat"))
            meta = meta.withColumn("x_utm", F.round(x, 2)).withColumn(
                "y_utm", F.round(y, 2)
            )
        elif not {"lon", "lat"} <= cols and {"x_utm", "y_utm"} <= cols:
            lon, lat = utm_to_wgs84(F.col("x_utm"), F.col("y_utm"))
            meta = meta.withColumn("lon", F.round(lon, 6)).withColumn(
                "lat", F.round(lat, 6)
            )
        elif {"x_utm", "y_utm", "lon", "lat"} <= cols:
            # mixed sources (e.g. an upsert union of UTM-bearing rows with
            # WGS84-only DWD rows): derive per ROW whichever pair is NULL
            x, y = wgs84_to_utm(F.col("lon"), F.col("lat"))
            lon, lat = utm_to_wgs84(F.col("x_utm"), F.col("y_utm"))
            meta = (
                meta.withColumn(
                    "x_utm", F.coalesce(F.col("x_utm"), F.round(x, 2))
                )
                .withColumn(
                    "y_utm", F.coalesce(F.col("y_utm"), F.round(y, 2))
                )
                .withColumn(
                    "lon", F.coalesce(F.col("lon"), F.round(lon, 6))
                )
                .withColumn(
                    "lat", F.coalesce(F.col("lat"), F.round(lat, 6))
                )
            )
        if "horizon" in meta.columns:
            meta = meta.withColumn("richter_class", richter_class(F.col("horizon")))
        # stations in dropped_stations are never recreated: the reference
        # deletes them from the incoming meta file before the upsert
        # (StationsBase.py:120-128) — here a broadcast left-anti join
        if self.exists("dropped_stations"):
            meta = meta.join(
                F.broadcast(
                    self.read("dropped_stations").select("station_id", "parameter")
                ),
                ["station_id", "parameter"],
                "left_anti",
            )
        self.write("meta", meta)

    @_with_mutex
    def upsert_meta(self, meta: DataFrame) -> None:
        """Merge new meta rows into the existing dim by
        (station_id, parameter) — the reference's ON CONFLICT meta upsert
        (StationsBase.py:147-222) refreshes one station class without
        touching the others' rows; :meth:`update_meta` by contrast
        rewrites the whole dim. Existing rows with the same key are
        replaced; rows of other parameters/stations pass through."""
        if self.exists("meta"):
            cur = self.read("meta")
            keep = cur.join(
                F.broadcast(meta.select("station_id", "parameter").distinct()),
                ["station_id", "parameter"],
                "left_anti",
            )
            meta = keep.unionByName(meta, allowMissingColumns=True)
        self.update_meta(meta)

    @_with_mutex
    def drop_station(self, station_id: int, parameter: str,
                     why: str = "No reason given") -> None:
        """F9 maintenance — drop a station and remember it so no later
        ``update_meta`` recreates it (reference ``StationBase._drop``,
        StationBases.py:590-611 + models.DroppedStations,
        models.py:215-236): remove its fact rows, meta row and MA rows,
        then upsert (station_id, parameter, why, timestamp) into the
        ``dropped_stations`` dim. On a real lakehouse the fact deletion
        would be a MERGE DELETE; on the parquet warehouse it is a
        filtered rewrite."""
        cond = (F.col("station_id") == station_id) & (
            F.col("parameter") == parameter
        )
        for table, pred in [
            (f"ts_{parameter}", F.col("station_id") == station_id),
            ("meta", cond),
            ("station_ma_raster", cond),
            ("station_ma_timeserie", cond),
        ]:
            if self.exists(table):
                self.write(
                    table,
                    self.read(table).filter(~pred),
                    bucket_by_station=table.startswith("ts_"),
                )
        row = self.spark.createDataFrame(
            [(station_id, parameter, why,
              datetime.now(timezone.utc).isoformat())],
            "station_id int, parameter string, why string, timestamp string",
        )
        if self.exists("dropped_stations"):
            prev = self.read("dropped_stations").filter(
                ~((F.col("station_id") == station_id)
                  & (F.col("parameter") == parameter))
            )
            row = prev.unionByName(row)
        # tiny dim — single driver-side file, like pipeline_state
        self._write_small("dropped_stations", row)

    @_with_mutex
    def update_ma_raster(self, ma: DataFrame) -> None:
        """S7 (pre-sampled path) — the multi-annual raster dim arrives
        already sampled as (station_id, parameter, term, value). For a
        gridded raster table use :meth:`update_ma_raster_from_grid`."""
        self.write("station_ma_raster", ma)

    @_with_mutex
    def update_ma_raster_from_grid(
        self, parameter: str, raster: DataFrame,
        x0: float, y0: float, res: float, stids=None,
    ) -> None:
        """S7 — sample a gridded raster table (col, row, term, value) at
        every station of ``parameter`` and write the result into
        ``station_ma_raster`` (reference update_ma_raster loop,
        StationBases.py:848-913: point sample, then 50 m buffer growth to
        1000 m with all_touched zonal mean on NoData —
        operators/raster.sample_raster). ``stids`` scopes the resample to
        the given stations (reference ``stids`` arg,
        StationsBase.py:857-865); the others keep their stored values."""
        from weatherdb_spark.operators.raster import sample_raster

        stations = self._scope(
            self.read("meta").filter(F.col("parameter") == parameter), stids
        ).select("station_id", "x_utm", "y_utm")
        sampled = sample_raster(stations, raster, x0=x0, y0=y0, res=res)
        out = sampled.select(
            "station_id", F.lit(parameter).alias("parameter"), "term", "value"
        )
        if self.exists("station_ma_raster"):
            prev = self.read("station_ma_raster")
            if stids is not None:
                # drop only the rows actually re-sampled: a scoped
                # station whose point falls outside the raster (or is
                # all-NoData beyond the buffer) is ABSENT from the
                # sample result (operators/raster.sample_raster), and
                # deleting its stored values would silently degrade the
                # fillup regionalization — the reference keeps the row
                keep = prev.join(
                    F.broadcast(
                        out.select("station_id", "parameter").distinct()
                    ),
                    ["station_id", "parameter"],
                    "left_anti",
                )
                out = keep.unionByName(out)
            else:
                out = prev.filter(
                    F.col("parameter") != parameter
                ).unionByName(out)
        self.write("station_ma_raster", out)

    @_with_mutex
    def update_raw(self, parameter: str, raw: DataFrame) -> None:
        """Load a raw fact table (post-ingest: sources.dwd.ingest_p_raw or
        equivalent). Expands the timeline so every grid timestamp exists
        (S6) and maintains meta raw periods."""
        cfg = PARAMETERS[parameter]
        self._assert_unique_keys(raw, f"update_raw({parameter!r})")
        interval = "10 minutes" if cfg["min_agg_to"] == "10 min" else "1 day"
        expanded = expand_timeline(
            raw, interval=interval, group_cols=("station_id",), min_date=None
        )
        self.write(f"ts_{parameter}", expanded, bucket_by_station=True)
        self._mark(parameter, "raw", f"ts_{parameter}")
        # raw periods land in meta like the reference's import bookkeeping
        # (later stages' periods come from an explicit update_period_meta —
        # each call costs one scan of the fact table, so they are not
        # auto-refreshed per stage)
        self.update_period_meta(parameter)

    def _ma_values(self, parameter: str, term: str = "year") -> DataFrame:
        self._require("station_ma_raster", "neighbor regionalization",
                      hint="run update-ma-raster first")
        return (
            self.read("station_ma_raster")
            .filter((F.col("parameter") == parameter) & (F.col("term") == term))
            .select("station_id", "value")
        )

    def _ma_seasonal(self, parameter: str) -> DataFrame:
        self._require("station_ma_raster", "seasonal adjustment factors",
                      hint="run update-ma-raster first")
        return (
            self.read("station_ma_raster")
            .filter((F.col("parameter") == parameter) & F.col("term").isin("wihy", "suhy"))
            .select("station_id", "term", "value")
        )

    def _knn(self, parameter: str, k: int | None = 5) -> DataFrame:
        """Neighbor dim. ``k=5`` for QC neighbor medians; ``k=None`` (all
        stations within max_fillup_distance, ranked by distance) for
        fillup — the reference's fillup loops the FULL distance-ordered
        candidate set until no holes remain (StationBases.py:1573-1638),
        so capping at 5 starves timestamps where the nearest donors are
        also null."""
        from weatherdb_spark.config import user_setting

        cfg = PARAMETERS[parameter]
        dist_km = user_setting(
            "fillup", "max_fillup_distance_km", cfg["max_fillup_dist_km"]
        )
        self._require("meta", "the neighbor (kNN) dim",
                      hint="run update-meta first")
        meta = self.read("meta").filter(F.col("parameter") == parameter)
        return knn_stations(
            meta,
            k=k,
            max_dist_m=dist_km * 1000,
            elevation_weighted=parameter in ("t", "et"),
        )

    @_with_mutex
    def update_horizon(self, dem_sampler, parameter: str = "p",
                       stids=None, **kw) -> None:
        """S8 as a maintenance stage: compute the horizon angle for every
        station of ``parameter`` from a DEM sampler and write it (plus
        the derived richter_class, S9) into meta — the engine form of
        StationP.update_horizon / update_richter_class
        (StationP.py:273-484). ``kw`` passes through to
        operators.horizon.horizon_angles (radius_m, step_deg, ...).
        ``stids`` scopes the recompute to the given stations; the other
        stations keep their stored horizon/class."""
        from weatherdb_spark.operators.horizon import horizon_angles

        meta = self.read("meta")
        mine = meta.filter(F.col("parameter") == parameter)
        scoped = self._scope(mine, stids)
        angles = horizon_angles(scoped, dem_sampler, **kw)
        updated = (
            scoped.drop("horizon", "richter_class")
            .join(angles, "station_id", "left")
            .withColumn("richter_class", richter_class(F.col("horizon")))
        )
        keep = meta.filter(F.col("parameter") != parameter)
        if stids is not None:
            keep = keep.unionByName(
                mine.filter(~F.col("station_id").isin(
                    [int(s) for s in stids]
                )),
                allowMissingColumns=True,
            )
        self.write(
            "meta", keep.unionByName(updated, allowMissingColumns=True)
        )

    @_with_mutex
    def update_meta_fields(self, parameter: str, stid: int,
                           values: dict) -> None:
        """Patch one meta row's columns (the engine form of the
        reference's per-station ``_update_meta``,
        StationBases.py:682-711) — a single dim rewrite, no fact scan."""
        meta = self.read("meta")
        cond = (F.col("parameter") == parameter) & (
            F.col("station_id") == int(stid)
        )
        for col, val in values.items():
            prev = F.col(col) if col in meta.columns else F.lit(None)
            new = F.lit(val)
            if val is None and col not in meta.columns:
                # two NULL void branches would leave an unwritable void
                # column; string is the meta dim's patchable-column type
                new = new.cast("string")
            meta = meta.withColumn(col, F.when(cond, new).otherwise(prev))
        self.write("meta", meta)

    @_with_mutex
    def update_period_meta(self, parameter: str) -> None:
        """Write the per-kind non-null periods ({kind}_from/{kind}_until)
        into the meta dim (reference StationBases.update_period_meta,
        StationBases.py:2100-2131 via update_period_meta loops): ONE
        grouped aggregation over the fact table computes every kind's
        period per station; the meta rows of the parameter are rebuilt
        with the fresh columns. These bounds feed the A5 bounded hole
        census and the export period resolution."""
        table = f"ts_{parameter}"
        if not self.exists(table) or not self.exists("meta"):
            return
        ts = self.read(table)
        kinds = self._period_kinds(ts)
        if not kinds:
            return
        periods = ts.groupBy("station_id").agg(*self._period_aggs(kinds))
        meta = self.read("meta")
        others = meta.filter(F.col("parameter") != parameter)
        mine = meta.filter(F.col("parameter") == parameter)
        drop_cols = [
            c for k in kinds for c in (f"{k}_from", f"{k}_until")
            if c in mine.columns
        ]
        mine = mine.drop(*drop_cols).join(periods, "station_id", "left")
        self.write(
            "meta", others.unionByName(mine, allowMissingColumns=True)
        )

    @staticmethod
    def _period_kinds(df: DataFrame) -> list[str]:
        return [k for k in ("raw", "qc", "filled", "corr") if k in df.columns]

    @staticmethod
    def _period_aggs(kinds: Sequence[str], prefix: str = "") -> list:
        """min/max of the non-null timestamps per kind — ONE definition
        shared by the exact recompute (:meth:`update_period_meta`) and
        the incremental widening (:meth:`_widen_period_meta`), so the
        approximation can never diverge from the semantics it widens."""
        aggs = []
        for k in kinds:
            cond_ts = F.when(F.col(k).isNotNull(), F.col("timestamp"))
            aggs.append(F.min(cond_ts).alias(f"{prefix}{k}_from"))
            aggs.append(F.max(cond_ts).alias(f"{prefix}{k}_until"))
        return aggs

    def _widen_period_meta(self, parameter: str, batch: DataFrame) -> None:
        """Widen the meta period columns with a batch's own per-station
        spans — the O(batch) twin of :meth:`update_period_meta` for the
        incremental paths (raw imports AND the last_imp stage merges,
        whose outputs carry the freshly computed qc/filled/corr columns).

        least/greatest against the stored bounds only ever EXTEND them;
        a revision that nulls a period-edge value is trued up by the
        next full stage pass (full stages end with the exact
        update_period_meta recompute) or the explicit update-period-meta
        CLI. The reference's import path has the same shape: it stamps
        the imported span, not a rescan (StationBases.py:969-1018)."""
        if not self.exists("meta"):
            return
        kinds = self._period_kinds(batch)
        if not kinds:
            return
        spans = batch.groupBy("station_id").agg(
            *self._period_aggs(kinds, prefix="_new_")
        )
        meta = self.read("meta")
        others = meta.filter(F.col("parameter") != parameter)
        mine = meta.filter(F.col("parameter") == parameter).join(
            F.broadcast(spans), "station_id", "left"
        )
        for k in kinds:
            for bound, pick in ((f"{k}_from", F.least),
                                (f"{k}_until", F.greatest)):
                # least/greatest skip NULLs, so a first-ever span (no
                # stored bounds yet) is taken as-is; withColumn replaces
                # the stored column in place while still reading it
                old = (F.col(bound) if bound in meta.columns
                       else F.lit(None).cast("timestamp"))
                mine = mine.withColumn(
                    bound, pick(old, F.col(f"_new_{bound}"))
                )
        mine = mine.drop(*[f"_new_{k}_{b}" for k in kinds
                           for b in ("from", "until")])
        self.write(
            "meta", others.unionByName(mine, allowMissingColumns=True)
        )

    @staticmethod
    def _scope(df: DataFrame, stids) -> DataFrame:
        """Restrict a station-keyed frame to the given stations (no-op
        when stids is None)."""
        if stids is None:
            return df
        return df.filter(F.col("station_id").isin([int(s) for s in stids]))

    def _finish_stage(self, table: str, out: DataFrame, stids) -> None:
        """Persist a stage result: full snapshot rewrite, or — for a
        per-station scoped run — a bucket-level merge that leaves
        untouched station buckets byte-identical.

        Every FULL stage write ends with the EXACT period-meta recompute
        for the parameter: the stage just computed/overwrote a kind
        column (qc/filled/corr), and the incremental paths only ever
        WIDEN bounds — this is the true-up those docstrings promise.
        One grouped aggregation next to a stage that already passed
        over the whole table. A per-station SCOPED run widens from its
        own output instead — an exact recompute there would re-scan the
        full table and defeat the O(touched-buckets) economy scoping
        exists for."""
        if stids is None:
            self.write(table, out, bucket_by_station=True)
            self.update_period_meta(table[3:])
        else:
            self._merge_scoped(table, out, stids)
            # from the freshly WRITTEN rows, not the `out` plan — a
            # second action over the plan would recompute the stage
            self._widen_period_meta(
                table[3:], self._scope(self.read(table), stids)
            )

    @_with_mutex
    def quality_check(self, stids=None, parameters=None, paras=None) -> None:
        """QC stage: p via window/daily rules, t/et via neighbor median
        (broker.py:412-442 runs p_d fillup first so the daily comparison
        has data; here ts_p_d raw is the comparison column).

        ``stids``: recompute only the given stations and merge them back
        (reference ``StationsBase.quality_check(stids=...)``,
        StationsBase.py:824-857) — a re-imported station doesn't pay a
        full-table stage. The neighbor-median checks still draw donor
        series from every station; only the checked set narrows.

        ``parameters``: run only the named parameters' blocks — the
        per-station facade (``Station.quality_check``) scopes to its own
        parameter like the reference's per-station method
        (StationBases.py:1289-1345). ``paras`` is the reference Broker's
        name for the same argument (broker.py:194-220)."""
        parameters = parameters if parameters is not None else paras
        if self._param_wanted("p", parameters) and self.exists("ts_p"):
            self._require("ts_p_d", "the P quality check's daily comparison")
            out_p = qc_p(
                self._scope(self.read("ts_p"), stids),
                self._scope(self.read("ts_p_d"), stids),
            )
            self._finish_stage("ts_p", out_p, stids)
            self._mark("p", "qc", "ts_p")

        if self._param_wanted("t", parameters) and self.exists("ts_t"):
            out_t = qc_t(
                self._scope(self.read("ts_t"), stids),
                self._scope(self._knn("t"), stids),
                self._ma_values("t"),
                self.read("meta").filter(F.col("parameter") == "t"),
                donor_facts=self.read("ts_t") if stids is not None else None,
            )
            self._finish_stage("ts_t", out_t, stids)
            self._mark("t", "qc", "ts_t")

        if self._param_wanted("et", parameters) and self.exists("ts_et"):
            out_et = qc_et(
                self._scope(self.read("ts_et"), stids),
                self._scope(self._knn("et"), stids),
                self._ma_values("et"),
                self.read("meta").filter(F.col("parameter") == "et"),
                donor_facts=self.read("ts_et") if stids is not None else None,
            )
            self._finish_stage("ts_et", out_et, stids)
            self._mark("et", "qc", "ts_et")

    # fillup output columns per parameter (merged back on incremental runs)
    FILLUP_COLS = {
        "p_d": ["filled", "filled_by"],
        "p": ["filled", "filled_by"],
        "t": ["filled", "filled_min", "filled_max", "filled_by"],
        "et": ["filled", "filled_by"],
    }

    def _fillup_compute(self, parameter: str, facts: DataFrame,
                        ts_p_d: DataFrame | None = None,
                        stids=None,
                        donor_facts: DataFrame | None = None) -> DataFrame:
        """The fillup computation for one parameter's fact table
        (StationBases.py:1346-1669) — shared by the full stage, the
        window-bounded incremental stage, and the per-station scoped
        stage (``stids`` narrows the target knn pairs; ``donor_facts``
        keeps the donor pool at the full table)."""
        cascade_k = 10  # bound the donor-join blowup; exact (see fillup.py)
        if parameter == "p_d":
            # base col raw, multiplicative yearly MA
            return rank_fill(
                facts, self._scope(self._knn("p_d", k=None), stids),
                self._ma_values("p_d"),
                coef_sign="mult", base_col="raw", round_digits=2,
                cascade_k=cascade_k, donor_facts=donor_facts,
            )
        if parameter == "p":
            # seasonal (wihy/suhy) multiplicative coefs, interpolation
            # <= 1h, then scale to the daily measurement
            filled_p = rank_fill(
                facts, self._scope(self._knn("p", k=None), stids),
                self._ma_seasonal("p"),
                coef_sign="mult", base_col="qc", seasonal_ma=True,
                round_digits=2, cascade_k=cascade_k, donor_facts=donor_facts,
            )
            # persist the filled series before the daily adjustment:
            # daily_adjust_p consumes its input from several plan subtrees
            # (the daily-sum dim, the row stream, and year_chunked's
            # edge/context branches), and those subtrees are NOT identical,
            # so exchange reuse cannot kick in — without the cache the
            # whole rank_fill + interpolation chain re-executes 3-4x
            # (measured 150 s -> 42 s on the 10.5M-row stress). Released
            # by the caller's cache_scope.
            filled_p = scoped_persist(interpolate_gaps(
                filled_p, max_gap=PARAMETERS["p"]["max_gap_interp"]
            ))
            filled_p = daily_adjust_p(filled_p, ts_p_d).withColumnRenamed(
                "corr_base", "filled_adj"
            )
            return filled_p.withColumn(
                "filled", F.coalesce("filled_adj", "filled")
            ).drop("filled_adj")
        if parameter == "t":
            # median of the first 5 non-null donors in distance order from
            # the full candidate set; beyond _fillup_max_dist (100 km,
            # StationT.py:48) a donor is used alone and only when no
            # nearer one exists. additive, min/max in the same pass.
            from weatherdb_spark.config import user_setting

            # min/max series ride along only when the import carried them
            # (DWD kl has TNK/TXK; a mean-only T table is still fillable)
            has_minmax = {"raw_min", "raw_max"} <= set(facts.columns)
            t_knn = self._scope(self._knn("t", k=None), stids)
            t_n_donors = user_setting(
                "fillup", "t_n_donors",
                PARAMETERS["t"]["fillup_n_donors"], cast=int,
            )
            t_near_m = user_setting(
                "fillup", "t_near_dist_km",
                PARAMETERS["t"]["fillup_near_dist_km"],
            ) * 1000
            filled_t = median_fill(
                facts, t_knn,
                self._ma_values("t"),
                n_donors=t_n_donors,
                base_col="qc",
                value_cols=(
                    ("qc", "raw_min", "raw_max") if has_minmax else ("qc",)
                ),
                out_cols=(
                    ("filled", "filled_min", "filled_max") if has_minmax
                    else ("filled",)
                ),
                near_dist_m=t_near_m,
                cascade_k=cascade_k, donor_facts=donor_facts,
                # dense-network near-side cascade, auto-gated inside the
                # operator on near density + the measured hole fraction
                # (value-identical — tests/test_fillup_deep.py)
                near_cascade_k="auto",
            )
            filled_t = interpolate_gaps(
                filled_t, max_gap=PARAMETERS["t"]["max_gap_interp"],
                filled_by_col="filled_by_interp",
            )
            # the reference marks interpolated T rows with
            # filled_by=ARRAY[-1] (StationBases.py:1550-1552, array branch)
            return filled_t.withColumn(
                "filled_by",
                F.when(F.col("filled_by_interp") == -1,
                       F.array(F.lit(-1).cast("short")))
                .otherwise(F.col("filled_by")),
            ).drop("filled_by_interp")
        if parameter == "et":
            # multiplicative yearly (ET's _fillup_max_dist is inert in the
            # reference — the exit-condition branch requires
            # _filled_by_n > 1, StationBases.py:1436,1467)
            filled_et = rank_fill(
                facts, self._scope(self._knn("et", k=None), stids),
                self._ma_values("et"),
                coef_sign="mult", base_col="qc", round_digits=1,
                cascade_k=cascade_k, donor_facts=donor_facts,
            )
            return interpolate_gaps(
                filled_et, max_gap=PARAMETERS["et"]["max_gap_interp"]
            )
        raise ValueError(f"no fillup for parameter {parameter!r}")

    @_with_mutex
    def fillup(self, stids=None, parameters=None, paras=None) -> None:
        """Fillup stage per parameter (StationBases.py:1346-1669):
        p_d first (raw base), then p (seasonal coefs + daily adjustment),
        t (5-donor median incl. min/max), et (multiplicative).

        ``stids``: fill only the given stations and merge them back
        (reference ``StationsBase.fillup(stids=...)``,
        StationsBase.py:931-966). The donor pool still reads all
        stations — only the target set narrows.

        ``parameters``: fill only the named parameters (per-station
        facade scoping; P still *reads* ts_p_d for its daily adjustment
        — the _require below keeps that dependency loud). ``paras`` is
        the reference Broker's name for the same argument."""
        parameters = parameters if parameters is not None else paras
        for parameter in ("p_d", "p", "t", "et"):
            table = f"ts_{parameter}"
            if not self._param_wanted(parameter, parameters):
                continue
            if not self.exists(table):
                continue
            # cache hygiene: rank_fill/median_fill persist fact-adjacent
            # intermediates (pairs, best_near, targets) for their internal
            # probe + write actions; the scope unpersists them once this
            # parameter's stage result is written, so four fillup runs per
            # update_db don't accumulate dead blocks in the storage pool
            with cache_scope():
                full = self.read(table)
                if parameter == "p":
                    self._require("ts_p_d", "the P fillup's daily adjustment")
                ts_p_d = (
                    self._scope(self.read("ts_p_d"), stids)
                    if parameter == "p" else None
                )
                out = self._fillup_compute(
                    parameter, self._scope(full, stids), ts_p_d, stids=stids,
                    donor_facts=full if stids is not None else None,
                )
                self._finish_stage(table, out, stids)
            self._mark(parameter, "filled", table)

    def _est_station_days(
        self, parameter: str, window: tuple[str, str] | None = None
    ) -> int | None:
        """Stations x days cardinality estimate for the Richter correction
        dim, from the stage watermark (no fact scan). ``window`` overrides
        the raw-stage watermark (the incremental path passes last_imp)."""
        if window is None:
            if not self.exists("pipeline_state"):
                return None
            r = (
                self.state()
                .filter((F.col("parameter") == parameter) & (F.col("stage") == "raw"))
                .first()
            )
            if r is None:
                return None
            window = (r["watermark_from"], r["watermark_until"])
        try:
            lo = datetime.fromisoformat(window[0])
            hi = datetime.fromisoformat(window[1])
        except (TypeError, ValueError):
            return None
        n_days = (hi.date() - lo.date()).days + 1
        n_stations = (
            self.read("meta").filter(F.col("parameter") == parameter).count()
        )
        return n_stations * max(n_days, 0)

    def richter_correct(self, stids=None) -> None:
        """Reference Broker's name for the Richter correction stage
        (broker.py:486-498)."""
        self.richter_correct_stage(stids=stids)

    @_with_mutex
    def richter_correct_stage(self, stids=None) -> None:
        """Richter correction (p only, StationP.py:486-652). Requires the
        fillup stage (T filled drives the precip type). No-op on a
        warehouse without 10-min precipitation or temperature.

        ``stids``: correct only the given stations and merge them back
        (the correction is per-station — T filled of the same station
        drives the precip type — so scoping cuts the whole compute)."""
        # no ts_p/ts_t, no Richter class yet (update-richter-class never
        # ran), or T never filled -> nothing to correct; running anyway
        # would write an all-NULL corr over every wet interval. SHARED
        # predicate with _last_imp_consumed — see _richter_applicable.
        if not self._richter_applicable():
            return
        meta_p = self.read("meta").filter(F.col("parameter") == "p")
        ts_p = self._scope(self.read("ts_p"), stids)
        ts_t = self._scope(
            self.read("ts_t"), stids
        ).select("station_id", "timestamp", "filled")
        out = richter_correct(
            ts_p, ts_t, meta_p, richter_parameters_df(self.spark),
            est_station_days=self._est_station_days("p"),
        )
        self._finish_stage("ts_p", out, stids)
        self._mark("p", "corr", "ts_p")

    def create_db_schema(self, if_exists: str | None = None,
                         silent: bool = False) -> None:
        """Initialize the warehouse for first use — the parquet analog of
        the reference's Postgres DDL ``create_db_schema``
        (broker.py:61-130): ensure the directory, pin the bucket modulus
        and layout revision into settings, and handle pre-existing
        tables per ``if_exists``:

        - ``'drop'``/``'D'``: clear them and start fresh,
        - ``'ignore'``/``'I'``: keep them,
        - ``'exit'``/``'E'``: return without touching anything,
        - ``None``: raise when tables exist (the reference prompts
          interactively; this engine has no prompts, so the choice must
          be explicit — ``silent`` keeps the reference's argument check).

        The reference's ``owner`` grant is Postgres-specific and has no
        parquet counterpart (directory ownership is the filesystem's)."""
        import shutil

        if silent and if_exists is None:
            raise ValueError(
                "silent can only be True if if_exists is not None."
            )
        if if_exists is not None and (
            not if_exists or if_exists[0].upper() not in "DIE"
        ):
            raise ValueError(
                f"if_exists {if_exists!r} not in ('drop', 'ignore', 'exit')"
            )
        existing = self._data_tables()
        if existing and if_exists is not None and if_exists[0].upper() == "E":
            return
        if existing and if_exists is None:
            raise RuntimeError(
                f"warehouse already has tables {existing}; pass "
                "if_exists='drop' to recreate or 'ignore' to keep them"
            )
        if existing and if_exists[0].upper() == "D":
            with self.activate():
                for table in existing:
                    shutil.rmtree(self.path(table))
            # a dropped warehouse is a FRESH one: clear the pinned
            # modulus so the user-config knob can seed the recreate
            self._bucket_count = None
            self.drop_setting("n_station_buckets")
        # 'ignore' may keep un-migrated tables around — the stamp must
        # describe the on-disk format, not aspire to it, or an operator
        # would skip the upgrade the kept files need: flat entries pin
        # rung 1; versioned fact snapshots WITHOUT ts_year leaves are
        # rung 2 (bucket-only) and still need the year-split rewrite
        tables = self._data_tables()
        if any(self.table_version(t) is None for t in tables):
            stamp = 1
        elif any(
            t.startswith("ts_") and not self._is_year_partitioned(t)
            for t in tables
        ):
            stamp = 2
        else:
            stamp = self.LAYOUT_VERSION
        self.set_setting("layout", str(stamp))
        _ = self.bucket_count  # pin the modulus before any data lands

    def initiate_db(
        self,
        meta: DataFrame,
        ma: DataFrame,
        raw: dict[str, DataFrame],
    ) -> None:
        """Full (re)computation of the warehouse (reference initiate_db,
        broker.py:239-271): load everything, run every stage, stamp the
        package version, compact. Tables left behind by an older layout
        are cleared first — every table is rewritten below, so the
        per-stage schema check must not block the rebuild."""
        with self.activate():
            self._clear_invalid_tables()
            self.update_meta(meta)
            self.update_ma_raster(ma)
            for parameter, df in raw.items():
                self.update_raw(parameter, df)
            self.quality_check()
            self.fillup()
            self.richter_correct_stage()
            self.set_db_version()
            self.vacuum()

    def update_db(
        self,
        meta: DataFrame,
        ma: DataFrame,
        raw: dict[str, DataFrame],
        run_stages: bool = True,
    ) -> None:
        """The full pipeline in reference stage order (broker.py:514-545),
        guarded by the broker mutex. Like the reference's update_db
        (broker.py:535-537), a warehouse stamped by an older package
        version (or never stamped) is recomputed completely via
        :meth:`initiate_db`. ``run_stages=False`` loads meta/MA/raw only —
        the compute stages run later (e.g. via the CLI ``update-db``
        command)."""
        with self.activate():
            if run_stages and self._needs_reinitiation():
                self.initiate_db(meta, ma, raw)
                return
            self.update_meta(meta)
            self.update_ma_raster(ma)
            for parameter, df in raw.items():
                self.update_raw(parameter, df)
            if run_stages:
                self.quality_check()
                self.fillup()
                self.richter_correct_stage()
                self.set_db_version()

    # -------------------------------------------------- incremental path
    @_with_mutex
    def append_raw(self, parameter: str, new_raw: DataFrame) -> None:
        """Incremental raw import (reference last-import semantics:
        StationBases.py:969-1018 window bookkeeping; merge = S4 upsert).
        New rows merge into the fact table by (station_id, timestamp); the
        imported period lands in the ``last_imp`` watermark, which the
        incremental stages below consume (the reference's
        ``last_imp_from/until`` meta columns)."""
        from weatherdb_spark.sinks.merge import merge_upsert

        # an empty batch (a drained stream trigger, an all-filtered file)
        # is a no-op: proceeding would rewrite the table and record a
        # "None"-bounded last_imp window for the stages to choke on
        if new_raw.isEmpty():
            return
        self._assert_unique_keys(new_raw, f"append_raw({parameter!r})")
        table = f"ts_{parameter}"
        cfg = PARAMETERS[parameter]
        interval = "10 minutes" if cfg["min_agg_to"] == "10 min" else "1 day"
        if not self.exists(table):
            self.update_raw(parameter, new_raw)
            lo, hi = new_raw.agg(F.min("timestamp"), F.max("timestamp")).first()
        else:
            value_cols = [c for c in new_raw.columns
                          if c not in ("station_id", "timestamp")]
            years = (
                self._append_years(table, new_raw)
                if self._is_year_partitioned(table) else None
            )
            cur = self.read(table, years=years).drop("station_bucket")
            merged = merge_upsert(
                cur, new_raw, keys=["station_id", "timestamp"],
                value_cols=value_cols,
            ).drop("_merge_action")
            # re-expand within the (touched-years) slice: grids are
            # contiguous inside every untouched year, and the slice spans
            # from each touched station's pre-import edge (the gap-bridge
            # years below), so expansion regenerates exactly the existing
            # grid there and fills only the genuinely new range
            expanded = expand_timeline(
                merged, interval=interval, group_cols=("station_id",),
                min_date=None,
            )
            if years is not None:
                # clamp: when the UNION of per-station year ranges is
                # non-contiguous (one batch backfills station A in 2020
                # and extends station B in 2025), a station with rows in
                # both edge years gets its gap years regenerated as
                # null grids by the expansion — those years are NOT in
                # the set, their real rows hard-link from the previous
                # snapshot, and writing the phantom rows next to them
                # would duplicate every (station, ts) key there. Inside
                # every touched year the slice is complete, so the
                # clamp is exact.
                expanded = expanded.filter(
                    F.year("timestamp").isin([int(y) for y in years])
                )
                self._write_years_partial(table, expanded, years)
            else:
                self.write(table, expanded, bucket_by_station=True)
            lo, hi = new_raw.agg(F.min("timestamp"), F.max("timestamp")).first()
        # a pending (unprocessed) window must WIDEN, not be replaced: two
        # appends before any last_imp_* stage would otherwise orphan the
        # first batch — its rows would never get qc/filled/corr while the
        # stage watermarks claim they were processed
        pending = self.last_imp(parameter)
        if pending is not None and not self._last_imp_consumed(parameter):
            lo = min(str(lo), str(pending[0]))
            hi = max(str(hi), str(pending[1]))
        row = self.spark.createDataFrame(
            [(parameter, "last_imp", str(lo), str(hi),
              datetime.now(timezone.utc).isoformat())],
            "parameter string, stage string, watermark_from string, "
            "watermark_until string, updated_at string",
        )
        prev = (
            self.read("pipeline_state").filter(
                ~((F.col("parameter") == parameter) & (F.col("stage") == "last_imp"))
            )
            if self.exists("pipeline_state")
            else None
        )
        out = prev.unionByName(row) if prev is not None else row
        self._write_small("pipeline_state", out)
        # imports extend the raw periods — keep meta's bookkeeping fresh
        # like the reference's import path (StationBases.py:969-1018).
        # WIDENING-ONLY from the batch's own spans (O(batch)), not the
        # full update_period_meta recompute: that is an O(table) grouped
        # aggregation, which would put a whole-archive scan inside every
        # one-day incremental import at warehouse scale
        self._widen_period_meta(parameter, new_raw)

    def files_to_download(self, listing: DataFrame) -> DataFrame:
        """S1 — which server files need (re)importing: the listing rows
        that are new or carry a newer modtime than the ``raw_files``
        manifest (reference StationBases.py:1183-1204 ``only_new``;
        listing comes from sources.ftp.get_cdc_file_list or a fixture)."""
        from weatherdb_spark.sources.ftp import files_to_update

        manifest = self.read("raw_files") if self.exists("raw_files") else None
        return files_to_update(listing, manifest)

    def mark_files_imported(self, listing: DataFrame) -> None:
        """Record imported files in the ``raw_files`` manifest (merge by
        filepath, newest modtime wins — reference ``RawFiles`` model,
        models.py update on import)."""
        new = listing.select("filepath", "modtime")
        if self.exists("raw_files"):
            prev = self.read("raw_files").join(
                new.select("filepath"), "filepath", "left_anti"
            )
            new = prev.unionByName(new)
        self.write("raw_files", new)

    #: incremental stages that consume a parameter's last_imp window
    _INCR_STAGES = {
        "p": ("qc", "filled", "corr"),
        "t": ("qc", "filled"),
        "et": ("qc", "filled"),
        "p_d": ("filled",),
    }

    @staticmethod
    def _param_wanted(parameter: str, parameters) -> bool:
        """Stage-scoping predicate: None means every parameter. A bare
        string coerces to a one-element scope — `in` on the raw string
        would be a substring test ('t' in 'et' is True)."""
        if parameters is None:
            return True
        if isinstance(parameters, str):
            parameters = (parameters,)
        return parameter in parameters

    def last_imp_done(self, parameter: str, stage: str) -> bool:
        """Has ``stage`` run since the pending last_imp window was
        recorded for ``parameter``? The engine's form of the reference's
        per-kind ``last_imp_qc/last_imp_filled/last_imp_corr`` meta flags
        (StationBases.py:779-809) at per-parameter watermark granularity.
        True with no pending window — nothing is owed."""
        if not self.exists("pipeline_state"):
            return True
        marks = {
            r["stage"]: r["updated_at"]
            for r in self.state()
            .filter(F.col("parameter") == parameter)
            .collect()
        }
        imp_at = marks.get("last_imp")
        if imp_at is None:
            return True
        return marks.get(stage) is not None and marks[stage] > imp_at

    def _richter_applicable(self) -> bool:
        """Can the Richter correction run on this warehouse at all?
        (10-min P and T present, Richter classes computed, T filled.)
        The stage no-op guards (richter_correct_stage / last_imp_corr)
        and :meth:`_last_imp_consumed` must share this predicate — if
        they disagreed, P's pending window would never count as consumed
        on a P-only warehouse and every append would WIDEN it, degrading
        the one-day incremental recompute to O(archive). Schema-only
        checks: three parquet footer reads, no data scan."""
        if not (self.exists("ts_p") and self.exists("ts_t")
                and self.exists("meta")):
            return False
        if "richter_class" not in self.read("meta").columns:
            return False
        return "filled" in self.read("ts_t").columns

    def _last_imp_consumed(self, parameter: str) -> bool:
        """Has every incremental stage of this parameter run SINCE the
        pending last_imp window was recorded? (Full stages stamp the
        same stage names, so a full QC/fillup/correct also consumes.
        A stage that is a contract no-op on this warehouse — P's corr
        without temperature data or Richter classes — is not owed.)"""
        if not self.exists("pipeline_state"):
            return True
        marks = {
            r["stage"]: r["updated_at"]
            for r in self.state()
            .filter(F.col("parameter") == parameter)
            .collect()
        }
        imp_at = marks.get("last_imp")
        if imp_at is None:
            return True
        stages = self._INCR_STAGES.get(parameter, ("qc", "filled"))
        if "corr" in stages and not self._richter_applicable():
            stages = tuple(s for s in stages if s != "corr")
        return all(
            marks.get(s) is not None and marks[s] > imp_at
            for s in stages
        )

    def last_imp(self, parameter: str) -> tuple[str, str] | None:
        """The pending import window, or None."""
        if not self.exists("pipeline_state"):
            return None
        r = (
            self.state()
            .filter((F.col("parameter") == parameter) & (F.col("stage") == "last_imp"))
            .first()
        )
        return (r["watermark_from"], r["watermark_until"]) if r else None

    def _is_year_partitioned(self, table: str) -> bool:
        """Does the CURRENT snapshot carry the (station_bucket, ts_year)
        leaf layout? Legacy rung-2/3 snapshots (bucket-only or flat) fall
        back to full rewrites until their next full-stage write."""
        root = self.data_path(table)
        if not os.path.isdir(root):
            return False
        for entry in os.listdir(root):
            p = os.path.join(root, entry)
            if entry.startswith("station_bucket=") and os.path.isdir(p):
                return any(e.startswith("ts_year=") for e in os.listdir(p))
        return False

    @staticmethod
    def _link_tree(src: str, dst: str) -> None:
        """Mirror a partition-dir tree, hard-linking the parquet files
        (byte-identical, no data pass; copy on no-hardlink filesystems)."""
        import shutil

        for root, _dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            out = dst if rel == "." else os.path.join(dst, rel)
            os.makedirs(out, exist_ok=True)
            for fname in files:
                if not fname.endswith(".parquet"):
                    continue
                try:
                    os.link(os.path.join(root, fname), os.path.join(out, fname))
                except OSError:  # cross-device / no-hardlink filesystem
                    shutil.copy2(os.path.join(root, fname), os.path.join(out, fname))

    def _write_years_partial(
        self, table: str, touched: DataFrame, years: list[int]
    ) -> None:
        """Write a new snapshot in which only the given calendar years'
        (bucket, year) leaves are recomputed from ``touched``; every
        other year's leaves hard-link to the previous snapshot —
        byte-identical, no data pass (the parquet twin of a lakehouse
        MERGE reusing unchanged files). ``touched`` must hold ALL rows of
        the touched years; rows OUTSIDE them are dropped here (their
        year leaves hard-link from the previous snapshot — writing a
        stray row next to a linked leaf would duplicate its key)."""
        cur_v = self.table_version(table)
        year_set = {int(y) for y in years}
        out = self._with_fact_partition_cols(
            touched.filter(F.year("timestamp").isin(list(year_set)))
        ).sortWithinPartitions(*self._FACT_PARTITION_COLS, "station_id", "timestamp")
        new = cur_v + 1
        vdir = os.path.join(self.path(table), self._version_dirname(new))
        out.write.mode("overwrite").partitionBy(*self._FACT_PARTITION_COLS).parquet(vdir)
        prev = self.data_path(table, cur_v)
        for bucket_entry in os.listdir(prev):
            bsrc = os.path.join(prev, bucket_entry)
            if not bucket_entry.startswith("station_bucket=") or not os.path.isdir(bsrc):
                continue
            for year_entry in os.listdir(bsrc):
                ysrc = os.path.join(bsrc, year_entry)
                if not year_entry.startswith("ts_year=") or not os.path.isdir(ysrc):
                    continue
                if int(year_entry.split("=", 1)[1]) in year_set:
                    continue  # recomputed above
                self._link_tree(ysrc, os.path.join(vdir, bucket_entry, year_entry))
        # partial year writes preserve columns (the missing-column case
        # forces a full rewrite upstream): the read schema carries over
        _carry_schema_file(prev, vdir)
        self._flip_manifest(table, new)
        self._cleanup_versions(table, new)

    def write_partition_append(
        self, table: str, df: DataFrame, part_col: str, part_value: int,
        replace_values=None,
    ) -> None:
        """APPEND-shaped snapshot write for a partition-keyed append-only
        table (CorpusStore's epoch-partitioned corpus + rejection log):
        the new snapshot holds ``df`` as the single new
        ``part_col=part_value`` leaf, and every existing leaf hard-links
        from the previous snapshot — O(batch) data pass, byte-identical
        untouched partitions, the same atomic manifest flip / previous-
        snapshot retention as :meth:`write`. The generic dim-table twin
        of the fact tables' :meth:`_write_years_partial`.

        ``df`` must NOT contain ``part_col`` — the directory encodes it
        (partition discovery restores the column on read). A legacy
        UN-partitioned snapshot is migrated in the same write: its rows
        are rewritten once under ``part_col`` leaves (``part_col=0``
        when the column is absent from the data, else partitionBy its
        own values) — one full data pass, never again. ``part_value``
        must be new (monotone per append — e.g. the new snapshot
        number); writing an existing partition's value would shadow its
        hard-link, so it raises.

        ``replace_values`` is the CONSOLIDATION mode (CorpusStore's
        epoch compaction): the named existing leaf values are NOT
        linked — ``df`` replaces their contents as the single
        ``part_value`` leaf (which may itself be one of them); every
        other leaf still hard-links. Cost is O(df), so folding the N
        oldest epochs costs those epochs' data, never the table's."""
        import shutil

        if part_col in df.columns:
            raise ValueError(
                f"{part_col!r} must not be a column of the appended batch "
                "(the partition directory encodes it); drop it first"
            )
        replace = {f"{part_col}={v}" for v in (replace_values or ())}
        cur_v = self.table_version(table)
        had = self.exists(table)
        new = (cur_v or 0) + 1
        vdir = os.path.join(self.path(table), self._version_dirname(new))
        leaf = f"{part_col}={part_value}"
        # fail BEFORE the batch write job: shadowing an existing leaf's
        # hard-link is the documented misuse, and prev + leaf are both
        # known upfront
        if had and leaf not in replace and os.path.isdir(
            os.path.join(self.data_path(table, cur_v), leaf)
        ):
            raise ValueError(
                f"partition {leaf} already exists in {table} snapshot "
                f"{cur_v}; appends need a fresh {part_col} value"
            )
        if os.path.isdir(vdir):  # crashed earlier attempt: start clean
            shutil.rmtree(vdir)
        df.write.mode("overwrite").parquet(os.path.join(vdir, leaf))
        if had:
            prev = self.data_path(table, cur_v)
            if self._is_partitioned_by(table, part_col):
                for entry in os.listdir(prev):
                    src = os.path.join(prev, entry)
                    if not entry.startswith(f"{part_col}=") or not os.path.isdir(src):
                        continue
                    if entry in replace or entry == leaf:
                        continue  # consolidated into the new leaf
                    self._link_tree(src, os.path.join(vdir, entry))
                # same columns by the leaf-append contract: the previous
                # snapshot's persisted read schema stays valid
                _carry_schema_file(prev, vdir)
            elif self._n_parquet_files(table) > 0:
                # one-time layout migration of the legacy flat snapshot.
                # A zero-file snapshot (a vacuumed all-empty log: dynamic
                # partitionBy of an empty frame writes no leaves) has
                # nothing to migrate — and no schema to read.
                legacy = self.spark.read.parquet(prev)
                if part_col not in legacy.columns:
                    legacy = legacy.withColumn(part_col, F.lit(0))
                else:
                    # the legacy rows partition by their OWN part_col
                    # values next to the freshly-written batch leaf: a
                    # legacy value colliding with part_value (or a
                    # replace value) would silently MERGE into it — the
                    # same shadowing the upfront leaf check rejects for
                    # partitioned snapshots. Current callers are safe
                    # only by construction (epochs are monotone, legacy
                    # corpora lack the column); make it an invariant.
                    forbidden = {part_value, *(replace_values or ())}
                    clash = (
                        legacy.filter(F.col(part_col).isin(list(forbidden)))
                        .limit(1).count()
                    )
                    if clash:
                        raise ValueError(
                            f"legacy snapshot of {table} contains rows "
                            f"with {part_col} in {sorted(forbidden)} — "
                            "migrating them would silently merge into "
                            f"the new {leaf} leaf; pick a fresh "
                            f"{part_col} value above the legacy range"
                        )
                legacy.write.mode("append").partitionBy(part_col).parquet(vdir)
        # root _SUCCESS: per-leaf writes commit inside their leaf dirs,
        # but exists() (and humans) look for the table-level marker the
        # partitionBy writer would have left
        open(os.path.join(vdir, "_SUCCESS"), "a").close()
        self._flip_manifest(table, new)
        self._cleanup_versions(table, new)

    def write_partition_merge(
        self, table: str, df: DataFrame, part_col: str,
    ) -> None:
        """MULTI-LEAF append snapshot for a partition-keyed table whose
        batches span many EXISTING partition values (the IVF inverted
        file's cells — contrast :meth:`write_partition_append`, whose
        whole batch is ONE fresh leaf): the new snapshot holds the
        batch's rows as new files inside their ``part_col`` leaves
        while every previous file — the touched leaves' old files and
        the untouched leaves alike — hard-links byte-identically from
        the previous snapshot. O(batch) data pass, and the same atomic
        manifest flip / previous-snapshot retention as :meth:`write`:
        a crash mid-merge leaves the current snapshot authoritative and
        a concurrent reader (planned against the manifest-pinned dir)
        never sees a half-written bag.

        ``df`` MUST contain ``part_col`` (its values route the rows —
        the opposite contract of the single-leaf append). Repeated
        merges accumulate small files per touched leaf; :meth:`vacuum`
        is the compaction counter-move (per-leaf rewrite, partition
        dirs preserved). A table not yet partitioned by ``part_col``
        raises — rewrite it once with
        ``write(partition_cols=(part_col,))`` first."""
        import shutil

        if part_col not in df.columns:
            raise ValueError(
                f"{part_col!r} must be a column of the merged batch "
                "(its values route rows to their leaves); use "
                "write_partition_append for a single-value batch"
            )
        had = self.exists(table)
        cur_v = self.table_version(table)
        if had and not self._is_partitioned_by(table, part_col):
            raise ValueError(
                f"{table} is not partitioned by {part_col!r} (legacy "
                "flat layout); rewrite it once with "
                f"write(partition_cols=({part_col!r},)) before merging"
            )
        if had and cur_v is None:
            # partitioned but MANIFEST-LESS: data_path resolves to the
            # table root, and linking "the previous snapshot" from
            # there would recurse into the freshly written version dir
            # (junk nested trees). One versioning write fixes it.
            raise ValueError(
                f"{table} is partitioned but unversioned (no manifest); "
                f"rewrite it once with write(partition_cols="
                f"({part_col!r},)) before merging"
            )
        new = (cur_v or 0) + 1
        vdir = os.path.join(self.path(table), self._version_dirname(new))
        if os.path.isdir(vdir):  # crashed earlier attempt: start clean
            shutil.rmtree(vdir)
        # batch job first (the only data pass), then the fs-op links;
        # Spark task-UUID file names keep the two file sets disjoint
        df.write.mode("overwrite").partitionBy(part_col).parquet(vdir)
        if had:
            prev = self.data_path(table, cur_v)
            self._link_tree(prev, vdir)
            # merged batches carry the same columns (the leaf layout is
            # checked above): the previous read schema stays valid
            _carry_schema_file(prev, vdir)
        self._flip_manifest(table, new)
        self._cleanup_versions(table, new)

    def _dim_partition_cols(self, table: str) -> "tuple[str, ...]":
        """First-level partition columns of a dim table's current
        snapshot, read from its leaf dir names (empty for flat dims and
        fact tables — station_bucket is excluded)."""
        root = self.data_path(table)
        if not os.path.isdir(root):
            return ()
        names = {
            e.split("=", 1)[0] for e in os.listdir(root)
            if "=" in e and os.path.isdir(os.path.join(root, e))
        }
        names.discard("station_bucket")
        return tuple(sorted(names))

    def _is_partitioned_by(self, table: str, part_col: str) -> bool:
        """Does the CURRENT snapshot carry ``part_col=...`` leaf dirs?"""
        root = self.data_path(table)
        if not os.path.isdir(root):
            return False
        return any(
            e.startswith(f"{part_col}=") and os.path.isdir(os.path.join(root, e))
            for e in os.listdir(root)
        )

    def _merge_stage_cols(
        self, table: str, updated: DataFrame, cols: list[str],
        years: list[int] | None = None,
    ) -> None:
        """Merge recomputed stage columns for a window back into the full
        table (change-detection merge, the IS DISTINCT FROM guard).

        With ``years`` (the window's calendar years) and a
        year-partitioned snapshot, only the touched years are read,
        merged, and rewritten — the other years' files hard-link into
        the new snapshot. A one-day incremental import then costs
        O(touched years), not O(table)."""
        from weatherdb_spark.sinks.merge import merge_upsert

        upd = updated.select("station_id", "timestamp", *cols)
        partial = years is not None and self._is_year_partitioned(table)
        if partial:
            # clamp: a row outside the touched years would land in a leaf
            # that is ALSO hard-linked from the previous snapshot
            # (duplicate files). Stage windows keep updates inside the
            # margin-widened years by construction; this pins it.
            upd = upd.filter(F.year("timestamp").isin([int(y) for y in years]))
        cur = self.read(table, years=years if partial else None).drop(
            "station_bucket"
        )
        missing = [c for c in cols if c not in cur.columns]
        if missing:
            # first-ever incremental run of this stage on the table (a
            # fresh warehouse goes straight to last_imp_* without a full
            # stage pass): the stage columns don't exist yet. They appear
            # now as typed NULLs (the NULL-until-computed contract) — and
            # since adding them only to the touched years would fork the
            # leaf schemas against the hard-linked untouched years, this
            # one merge rewrites the whole table.
            if partial:
                partial = False
                cur = self.read(table).drop("station_bucket")
            upd_types = {f.name: f.dataType for f in upd.schema.fields}
            for c in missing:
                cur = cur.withColumn(c, F.lit(None).cast(upd_types[c]))
        merged = merge_upsert(
            cur, upd, keys=["station_id", "timestamp"], value_cols=cols
        ).drop("_merge_action")
        if partial:
            self._write_years_partial(table, merged, years)
        else:
            self.write(table, merged, bucket_by_station=True)
        # the stage just (re)computed kind columns for this window —
        # widen the period meta from the freshly WRITTEN touched-years
        # slice (bounds from any subset of stored rows are valid
        # widenings; re-aggregating `upd` would recompute the stage
        # plan). A non-partial merge rewrote the whole table anyway, so
        # it runs the exact recompute like the full stages do.
        if partial:
            self._widen_period_meta(table[3:], self.read(table, years=years))
        else:
            self.update_period_meta(table[3:])

    def _merge_scoped(self, table: str, out: DataFrame, stids) -> None:
        """Merge a per-station stage result back, rewriting ONLY the
        station buckets the stids map to; every untouched bucket's files
        are hard-linked from the previous snapshot into the new one —
        byte-identical, no data pass (the parquet twin of the
        reference's per-station UPDATE; on a lakehouse this is snapshot
        manifest reuse of unchanged files). Falls back to a full rewrite
        when the table still has the legacy flat layout or the scoped
        output changes the table schema (e.g. the first-ever fillup adds
        the ``filled`` column — bucket files must not diverge in
        schema)."""
        import shutil

        stid_list = sorted({int(s) for s in stids})
        buckets = {s % self.bucket_count for s in stid_list}
        cur_v = self.table_version(table)
        cur = self.read(table)
        out = self._scope(out, stid_list).drop("station_bucket")
        cur_types = {f.name: f.dataType for f in cur.schema.fields
                     if f.name != "station_bucket"}
        out_types = {f.name: f.dataType for f in out.schema.fields}
        # legacy (bucket-only / flat) snapshots take the full rewrite —
        # linking them next to year-partitioned leaves would mix partition
        # depths in one snapshot, which Spark's discovery rejects; the
        # rewrite itself migrates the table to the current layout
        if (cur_v is None or cur_types != out_types
                or not self._is_year_partitioned(table)):
            keep = cur.drop("station_bucket").filter(
                ~F.col("station_id").isin(stid_list)
            )
            self.write(
                table, keep.unionByName(out, allowMissingColumns=True),
                bucket_by_station=True,
            )
            return
        # rows of OTHER stations sharing a touched bucket carry over
        bucket_of = F.pmod(F.col("station_id"), self.bucket_count)
        carry = cur.drop("station_bucket").filter(
            bucket_of.isin(list(buckets))
            & ~F.col("station_id").isin(stid_list)
        )
        merged = self._with_fact_partition_cols(
            out.unionByName(carry)
        ).sortWithinPartitions(*self._FACT_PARTITION_COLS, "station_id", "timestamp")
        new = cur_v + 1
        vdir = os.path.join(self.path(table), self._version_dirname(new))
        merged.write.mode("overwrite").partitionBy(
            *self._FACT_PARTITION_COLS
        ).parquet(vdir)
        prev = self.data_path(table, cur_v)
        for entry in os.listdir(prev):
            if not entry.startswith("station_bucket="):
                continue
            if int(entry.split("=", 1)[1]) in buckets:
                continue
            # untouched buckets hard-link wholesale (incl. their nested
            # ts_year leaves)
            self._link_tree(os.path.join(prev, entry), os.path.join(vdir, entry))
        # the schema-change case took the full-rewrite branch above:
        # this snapshot's columns match the previous one's
        _carry_schema_file(prev, vdir)
        self._flip_manifest(table, new)
        self._cleanup_versions(table, new)

    def update_ma_timeseries(self, paras=("p_d", "p", "t", "et"),
                             **kwargs) -> None:
        """The reference Broker's spelling and shape (broker.py:340-356):
        loop :meth:`update_ma_timeserie` over ``paras``; kwargs pass
        through (kinds=, coverage=). Parameters whose fact table does
        not exist yet are skipped like the reference's empty station
        list."""
        if isinstance(paras, str):
            paras = [paras]
        for parameter in paras:
            if self.exists(f"ts_{parameter}"):
                self.update_ma_timeserie(parameter, **kwargs)

    @_with_mutex
    def update_ma_timeserie(
        self,
        parameter: str,
        kinds: tuple[str, ...] = ("raw", "qc", "filled"),
        coverage: float | None = None,
    ) -> None:
        """A2 — per-station multi-annual values of the station's own
        timeserie, upserted into ``station_ma_timeserie``
        (StationBases.py:940-958, models.py:302-321). ``coverage``
        overrides the strict > 0.9 yearly gate."""
        from weatherdb_spark.operators.aggregate import yearly_ma
        from weatherdb_spark.sinks.merge import merge_upsert

        cfg = PARAMETERS[parameter]
        ts = self.read(f"ts_{parameter}")
        kinds = tuple(k for k in kinds if k in ts.columns)
        if not kinds:
            # a valid-but-unbuilt kind (e.g. corr before richter-correct)
            # must fail loudly here, not as a NoneType crash in the write
            raise ValueError(
                f"none of the requested kinds exist in ts_{parameter} yet "
                "— run the stage that builds them first (quality-check / "
                "fillup / richter-correct)"
            )
        # coverage=None resolves through the user config inside yearly_ma
        ma = yearly_ma(
            ts, kinds=list(kinds), agg_fun=cfg["agg_fun"], coverage=coverage,
        )
        tall = None
        for k in kinds:
            part = ma.select(
                "station_id",
                F.lit(parameter).alias("parameter"),
                F.lit(k).alias("kind"),
                F.round(F.col(k), 2).alias("value"),
            )
            tall = part if tall is None else tall.unionByName(part)
        if self.exists("station_ma_timeserie"):
            cur = self.read("station_ma_timeserie")
            merged = merge_upsert(
                cur, tall, keys=["station_id", "parameter", "kind"],
                value_cols=["value"],
            ).drop("_merge_action")
        else:
            merged = tall
        self.write("station_ma_timeserie", merged)

    def register_quotient_views(self) -> None:
        """J10 — the MA quotient views (db/views.py:77-165):

        - ``ma_quotient_raster``: station_ma_timeserie / station_ma_raster
          (term = 'year') per (station, parameter, kind);
        - ``ma_quotient_kinds``: kind/kind quotient from a self-join of
          station_ma_timeserie on (station, parameter).
        Registered as temp views for ``spark.sql`` access."""
        ma_ts = self.read("station_ma_timeserie")
        ma_raster = self.read("station_ma_raster").filter(F.col("term") == "year")
        raster_vals = ma_raster.select(
            "station_id", "parameter", F.col("value").alias("_raster_value")
        )
        (
            ma_ts.join(raster_vals, ["station_id", "parameter"])
            .select(
                "station_id", "parameter", "kind",
                F.round(F.col("value") / F.col("_raster_value"), 4).alias("quotient"),
            )
            .createOrReplaceTempView("ma_quotient_raster")
        )
        a = ma_ts.select("station_id", "parameter", F.col("kind").alias("kind_num"),
                         F.col("value").alias("_num"))
        b = ma_ts.select("station_id", "parameter", F.col("kind").alias("kind_den"),
                         F.col("value").alias("_den"))
        (
            a.join(b, ["station_id", "parameter"])
            .filter(F.col("kind_num") != F.col("kind_den"))
            .select(
                "station_id", "parameter", "kind_num", "kind_den",
                F.round(F.col("_num") / F.col("_den"), 4).alias("quotient"),
            )
            .createOrReplaceTempView("ma_quotient_kinds")
        )

    def register_views(self, include_quotients: bool = True) -> list[str]:
        """Register every warehouse table as a Spark temp view — the
        engine twin of the reference's direct-SQL database access
        (``db_engine``, db/connections.py:374: users open a connection
        and SELECT any table or view with raw SQL).

        Each view reads the table's *current* snapshot; because views are
        re-registered on every call, a manifest flip by a concurrent
        writer is picked up the next time this runs (a registered view
        itself stays pinned to the snapshot it was created over — the
        same reader-stability guarantee :meth:`read` gives). The two MA
        quotient views (db/views.py:77-165) come along whenever their
        input tables exist. Returns the registered view names."""
        names = []
        tables = self._data_tables() + sorted(
            t for t in self._APPEND_ONLY if os.path.isdir(self.path(t))
        )
        for t in tables:
            if self.exists(t):
                df = self.read(t)
                if "station_bucket" in df.columns:
                    # physical partition column (like ts_year, which
                    # read() already hides) — not user schema
                    df = df.drop("station_bucket")
                df.createOrReplaceTempView(t)
                names.append(t)
        if (
            include_quotients
            and self.exists("station_ma_timeserie")
            and self.exists("station_ma_raster")
        ):
            self.register_quotient_views()
            names += ["ma_quotient_kinds", "ma_quotient_raster"]
        return sorted(names)

    def sql(self, query: str) -> DataFrame:
        """Run ANSI SQL over the warehouse — the reference's ad-hoc
        query path (psql / ``db_engine.connect()`` + raw SELECTs,
        db/connections.py:140-170) re-expressed on Spark SQL.

        Views are refreshed first so the query always sees the current
        snapshots; the returned DataFrame is lazy, so predicate pushdown,
        column pruning and partition pruning all apply to the parquet
        scans underneath exactly as for the DataFrame API."""
        self.register_views()
        return self.spark.sql(query)

    @_with_mutex
    def create_virtual_stations(self, parameter: str) -> None:
        """J12 — materialize virtual T/ET/PD stations at every P location
        that has no station of ``parameter`` yet
        (StationBases.py:2868-2885, StationsBaseTET.py:15-30): left-anti
        join meta_p against meta_<parameter>, union with is_real = false."""
        meta = self.read("meta")
        meta_p = meta.filter(F.col("parameter") == "p")
        have = meta.filter(F.col("parameter") == parameter).select("station_id")
        virtual = (
            meta_p.join(have, "station_id", "left_anti")
            .withColumn("parameter", F.lit(parameter))
            .withColumn("is_real", F.lit(False))
        )
        self.write("meta", meta.unionByName(virtual))

    def _append_years(self, table: str, new_raw: DataFrame) -> list[int]:
        """Calendar years an incremental import touches: the new rows'
        own years, plus — per station — the bridge years between the new
        rows and the station's existing grid edge (the timeline must stay
        contiguous from the old max up to a later import, and from an
        earlier backfill up to the old min). Bounds are scanned only for
        the imported stations' buckets (partition-pruned)."""
        new_bounds = new_raw.groupBy("station_id").agg(
            F.min("timestamp").alias("_nlo"), F.max("timestamp").alias("_nhi")
        )
        stids = [r["station_id"] for r in new_bounds.select("station_id").collect()]
        buckets = sorted({int(s) % self.bucket_count for s in stids})
        old_bounds = (
            self.read(table)
            .filter(F.col("station_bucket").isin(buckets))
            .filter(F.col("station_id").isin([int(s) for s in stids]))
            .groupBy("station_id")
            .agg(F.min("timestamp").alias("_olo"), F.max("timestamp").alias("_ohi"))
        )
        spans = (
            new_bounds.join(old_bounds, "station_id", "left")
            .select(
                F.when(
                    F.col("_ohi").isNotNull() & (F.col("_nhi") > F.col("_ohi")),
                    F.least(F.year("_nlo"), F.year("_ohi")),
                ).otherwise(F.year("_nlo")).alias("_ylo"),
                F.when(
                    F.col("_olo").isNotNull() & (F.col("_nlo") < F.col("_olo")),
                    F.greatest(F.year("_nhi"), F.year("_olo")),
                ).otherwise(F.year("_nhi")).alias("_yhi"),
            )
            .collect()
        )
        years: set[int] = set()
        for r in spans:
            years.update(range(r["_ylo"], r["_yhi"] + 1))
        return sorted(years)

    @_with_mutex
    def last_imp_quality_check(self, margin: str = "2 days",
                               parameters=None, paras=None) -> None:
        """Incremental QC (broker.py:412-442): recompute qc only inside the
        last-import window, widened by ``margin`` so window/daily rules see
        full context, then merge the qc column back. ``parameters`` scopes
        the loop (facade dispatch; ``paras`` is the reference name)."""
        parameters = parameters if parameters is not None else paras
        for parameter in ("p", "t", "et"):
            if not self._param_wanted(parameter, parameters):
                continue
            window = self.last_imp(parameter)
            if window is None or not self.exists(f"ts_{parameter}"):
                continue
            table = f"ts_{parameter}"
            part, in_window = self._window_part(table, window, margin)
            years = self._window_years(window, margin)
            if parameter == "p":
                self._require(
                    "ts_p_d", "the incremental P quality check"
                )
                # one extra year low-side: the 5h50-shifted comparison day
                # of an early-January timestamp falls in the prior year
                out = qc_p(part, self.read("ts_p_d", years=[years[0] - 1, *years]))
                # the daily-sum rule covers whole 6h-shifted days, so
                # merge at day granularity like last_imp_fillup does for
                # its 5h50 shift — a window starting mid-day re-judges
                # the straddling day's rows with their COMPLETE day
                from weatherdb_spark.functions.temporal import shifted_date

                sd = shifted_date(F.col("timestamp"), "6 hours")
                in_window = sd.between(
                    shifted_date(F.lit(window[0]).cast("timestamp"), "6 hours"),
                    shifted_date(F.lit(window[1]).cast("timestamp"), "6 hours"),
                )
            elif parameter == "t":
                out = qc_t(
                    part, self._knn("t"), self._ma_values("t"),
                    self.read("meta").filter(F.col("parameter") == "t"),
                )
            else:
                out = qc_et(
                    part, self._knn("et"), self._ma_values("et"),
                    self.read("meta").filter(F.col("parameter") == "et"),
                )
            # margin rows are CONTEXT only: their lag/lead windows are
            # truncated at the margin edge, so merging them back would
            # overwrite correct full-series qc with edge recomputations
            self._merge_stage_cols(table, out.filter(in_window), ["qc"],
                                   years=years)
            self._mark(parameter, "qc", table)

    @staticmethod
    def _margin_delta(margin: str) -> "timedelta":
        """'2 days' / '5 hours 50 minutes' / '1 month' -> timedelta, the
        driver-side twin of the INTERVAL literal the window predicates
        use. Compound margins sum their parts; calendar units (month,
        year) over-approximate (31/366 days) — the delta only widens the
        year-pruning span, where over-coverage merely reads an extra
        year and UNDER-coverage would drop merge rows."""
        from datetime import timedelta

        per_unit = {"week": 7 * 86400, "day": 86400, "hour": 3600,
                    "minute": 60, "second": 1,
                    "month": 31 * 86400, "year": 366 * 86400}
        toks = margin.split()
        if len(toks) % 2:
            raise ValueError(f"margin {margin!r} is not 'N unit [N unit ...]'")
        secs = 0
        for num, unit in zip(toks[::2], toks[1::2]):
            unit = unit.lower().rstrip("s")
            if unit not in per_unit:
                raise ValueError(f"margin unit {unit!r} not supported")
            secs += int(num) * per_unit[unit]
        return timedelta(seconds=secs)

    def _window_years(self, window: tuple[str, str], margin: str) -> list[int]:
        """Calendar years the margin-widened window touches — the
        partition-pruning key for incremental reads and merges."""
        d = self._margin_delta(margin)
        lo = datetime.fromisoformat(str(window[0])) - d
        hi = datetime.fromisoformat(str(window[1])) + d
        return list(range(lo.year, hi.year + 1))

    def _window_part(self, table: str, window: tuple[str, str], margin: str):
        """The fact rows inside the import window widened by ``margin``
        (context for windows/interpolation/day grouping), plus the pure
        in-window predicate for the merge-back. The read prunes to the
        window's calendar years (the timestamp filter stays — year
        pruning is an optimization, not the predicate)."""
        lo = F.lit(window[0]).cast("timestamp") - F.expr(f"INTERVAL {margin}")
        hi = F.lit(window[1]).cast("timestamp") + F.expr(f"INTERVAL {margin}")
        part = self.read(table, years=self._window_years(window, margin)).filter(
            F.col("timestamp").between(lo, hi)
        )
        in_window = F.col("timestamp").between(
            F.lit(window[0]).cast("timestamp"), F.lit(window[1]).cast("timestamp")
        )
        return part, in_window

    @_with_mutex
    def last_imp_fillup(self, margin: str = "2 days", parameters=None,
                        paras=None) -> None:
        """Incremental fillup (reference Broker.last_imp_fillup,
        broker.py:464-484; StationBases.last_imp_fillup via
        get_last_imp_period): recompute the fillup only inside the
        last-import window, widened by ``margin`` so interpolation
        brackets and the 5h50-shifted day grouping have full context,
        then merge the stage columns of the IN-WINDOW rows back. Margin
        rows are context only — their stored values, computed from the
        full series, stay untouched. ``parameters`` scopes the loop
        (facade dispatch; ``paras`` is the reference name)."""
        parameters = parameters if parameters is not None else paras
        for parameter in ("p_d", "p", "t", "et"):
            if not self._param_wanted(parameter, parameters):
                continue
            window = self.last_imp(parameter)
            table = f"ts_{parameter}"
            if window is None or not self.exists(table):
                continue
            if parameter == "p":
                # same stage-level message fillup() and
                # last_imp_quality_check give, not a raw PATH_NOT_FOUND
                # from the lazy read below
                self._require(
                    "ts_p_d", "the incremental P fillup (daily adjust)",
                    hint="run update-raw -p p_d first",
                )
            part, in_window = self._window_part(table, window, margin)
            years = self._window_years(window, margin)
            ts_p_d = (
                # extra year low-side: 5h50-shifted day grouping (see
                # last_imp_quality_check)
                self.read("ts_p_d", years=[years[0] - 1, *years])
                if parameter == "p" else None
            )
            # see fillup(): release the fill operators' persisted
            # intermediates once this window's merge is written
            with cache_scope():
                out = self._fillup_compute(parameter, part, ts_p_d)
                if parameter == "p":
                    # the daily-adjust coefficient covers the whole
                    # 5h50-shifted day; a window starting mid-day changes
                    # the coef of every row of the straddling day, so
                    # merge at day granularity
                    from weatherdb_spark.functions.temporal import shifted_date

                    sd = shifted_date(F.col("timestamp"), "5 hours 50 minutes")
                    in_window = sd.between(
                        shifted_date(F.lit(window[0]).cast("timestamp"),
                                     "5 hours 50 minutes"),
                        shifted_date(F.lit(window[1]).cast("timestamp"),
                                     "5 hours 50 minutes"),
                    )
                self._merge_stage_cols(
                    table, out.filter(in_window), self.FILLUP_COLS[parameter],
                    years=years,
                )
            self._mark(parameter, "filled", table)

    @_with_mutex
    def last_imp_corr(self, margin: str = "2 days") -> None:
        """Incremental Richter correction (reference
        Broker.last_imp_corr, broker.py:500-512;
        StationP.last_imp_richter_correct): window-bounded recompute of
        the corr column for P, merged back for in-window rows."""
        window = self.last_imp("p")
        # same no-op contract as richter_correct_stage (SHARED predicate
        # with _last_imp_consumed): a warehouse without temperature data
        # (P-only deployments) must not crash the umbrella update with a
        # path-not-found deep in a lazy plan — and the window must not
        # stay pending over a stage that can never run
        if window is None or not self._richter_applicable():
            return
        meta_p = self.read("meta").filter(F.col("parameter") == "p")
        part, in_window = self._window_part("ts_p", window, margin)
        years = self._window_years(window, margin)
        lo = F.lit(window[0]).cast("timestamp") - F.expr(f"INTERVAL {margin}")
        hi = F.lit(window[1]).cast("timestamp") + F.expr(f"INTERVAL {margin}")
        ts_t = (
            self.read("ts_t", years=years)
            .filter(F.col("timestamp").between(lo, hi))
            .select("station_id", "timestamp", "filled")
        )
        out = richter_correct(
            part, ts_t, meta_p, richter_parameters_df(self.spark),
            est_station_days=self._est_station_days("p", window),
        )
        # the correction distributes a per-calendar-day delta over the
        # day's filled values, and last_imp_fillup merges whole 5h50-
        # shifted days — so recompute every calendar day the fillup merge
        # could have touched: from the shifted day of lo (its first row is
        # at 05:50 of that calendar day) through the day after hi (the
        # shifted day of hi ends at 05:40 next day). Unchanged rows are
        # dropped by the IS DISTINCT merge.
        from weatherdb_spark.functions.temporal import shifted_date

        in_window_days = F.to_date("timestamp").between(
            shifted_date(F.lit(window[0]).cast("timestamp"), "5 hours 50 minutes"),
            F.date_add(F.to_date(F.lit(window[1]).cast("timestamp")), 1),
        )
        self._merge_stage_cols("ts_p", out.filter(in_window_days), ["corr"],
                               years=years)
        self._mark("p", "corr", "ts_p")
