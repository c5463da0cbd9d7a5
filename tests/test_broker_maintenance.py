"""Broker warehouse-maintenance semantics: the mutex that serializes
concurrent brokers (reference weatherdb/broker.py:619-677), the db version
stamp that triggers full recomputation on package upgrade (broker.py:
535-537, 592-628), and vacuum compaction (broker.py:547-551)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from weatherdb_spark import __version__
from weatherdb_spark.broker import N_STATION_BUCKETS, Broker


# ------------------------------------------------------------------ mutex

def test_second_broker_raises_while_first_active(spark, tmp_path):
    wh = str(tmp_path / "wh")
    b1, b2 = Broker(spark, wh), Broker(spark, wh)
    with b1.activate():
        assert b1.is_active and b1.is_any_active
        assert b2.is_any_active and not b2.is_active
        with pytest.raises(RuntimeError, match="Another Broker is active"):
            with b2.activate():
                pass
    # lock released on exit -> second broker may now run
    assert not b1.is_any_active
    with b2.activate():
        assert b2.is_active
    assert not os.path.exists(b2.lock_path)


def test_activate_is_reentrant_within_one_broker(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    with b.activate():
        with b.activate():  # nested stage under update_db
            assert b.is_active
        assert b.is_active  # inner exit must not release the outer hold
    assert not b.is_any_active


def test_stage_method_takes_and_releases_lock(spark, tmp_path):
    wh = str(tmp_path / "wh")
    b = Broker(spark, wh)
    meta = spark.createDataFrame(
        [(1, "p_d", True, 0.0, 0.0, 100)],
        "station_id int, parameter string, is_real boolean, "
        "x_utm double, y_utm double, stationshoehe int",
    )
    b.update_meta(meta)  # decorated with _with_mutex
    assert not b.is_any_active
    # a held lock blocks the decorated stage from another broker
    other = Broker(spark, wh)
    with b.activate():
        with pytest.raises(RuntimeError, match="Another Broker is active"):
            other.update_meta(meta)


def test_force_deactivate_clears_stale_lock(spark, tmp_path):
    wh = str(tmp_path / "wh")
    crashed = Broker(spark, wh)
    # simulate a crashed holder: lock file exists, no live broker
    with open(crashed.lock_path, "w") as fh:
        json.dump({"pid": -1, "since": "2026-01-01T00:00:00"}, fh)
    b = Broker(spark, wh)
    with pytest.raises(RuntimeError):
        with b.activate():
            pass
    b.force_deactivate_all()
    with b.activate():
        assert b.is_active


# -------------------------------------------------------------- version

def test_version_stamp_roundtrip_and_reinitiation_trigger(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    assert b.get_db_version() is None
    assert b._needs_reinitiation()  # never stamped -> full recompute
    b.set_db_version()
    assert b.get_db_version() == __version__
    assert not b._needs_reinitiation()
    b.set_db_version("0.0.1")  # older package stamped the warehouse
    assert b._needs_reinitiation()
    b.set_db_version("999.0.0")  # newer stamp (downgrade) -> no recompute
    assert not b._needs_reinitiation()


def test_settings_are_isolated_per_key(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    b.set_setting("a", "1")
    b.set_setting("b", "2")
    b.set_setting("a", "3")
    assert b.get_setting("a") == "3"
    assert b.get_setting("b") == "2"
    assert b.get_setting("missing") is None


def test_update_db_stamps_version_and_compacts(spark, tmp_path):
    """Fresh warehouse -> update_db routes through initiate_db (version
    None), which stamps the version and vacuums (reference initiate_db,
    broker.py:266-271)."""
    b = Broker(spark, str(tmp_path / "wh"))
    meta = spark.createDataFrame(
        [(s, "p_d", True, s * 1000.0, 0.0, 100 + s) for s in (1, 2, 3)],
        "station_id int, parameter string, is_real boolean, "
        "x_utm double, y_utm double, stationshoehe int",
    )
    ma = spark.createDataFrame(
        [(s, "p_d", "year", 800.0 + s) for s in (1, 2, 3)],
        "station_id int, parameter string, term string, value double",
    )
    raw = spark.range(3 * 30).select(
        (F.col("id") % 3 + 1).cast("int").alias("station_id"),
        (F.lit("2024-01-01").cast("timestamp")
         + (F.col("id") / 3).cast("int") * F.expr("INTERVAL 1 DAY")
         ).alias("timestamp"),
        F.when(F.col("id") % 11 == 3, None)
        .otherwise(F.round((F.col("id") % 7) * 1.0, 1)).alias("raw"),
    )
    b.update_db(meta, ma, {"p_d": raw})
    assert b.get_db_version() == __version__
    assert not b.is_any_active  # lock released after the run
    assert b.read("ts_p_d").filter(F.col("filled").isNull()).count() == 0


# --------------------------------------------------------------- schema

def test_check_db_schema_flags_broken_table(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    assert b.check_db_schema()  # empty warehouse is trivially valid
    # a fact table missing its timestamp key is a schema mismatch
    broken = spark.createDataFrame([(1, 1.0)], "station_id int, raw double")
    b.write("ts_p", broken)
    b._db_schema_valid = False
    with pytest.raises(RuntimeError, match="ts_p: missing columns.*timestamp"):
        b.check_db_schema()
    with pytest.raises(RuntimeError, match="upgrade_db_schema"):
        b.quality_check()  # every stage checks before running
    # fixing the table clears the failure via upgrade_db_schema
    fixed = spark.createDataFrame(
        [(1, dt_ts(), 1.0)],
        "station_id int, timestamp timestamp, raw double",
    )
    b.write("ts_p", fixed)
    b.upgrade_db_schema()
    assert b.check_db_schema()


def test_reinitiation_clears_old_layout_tables(spark, tmp_path):
    """A warehouse stamped by an older version AND carrying an older
    table layout must still reinitiate: initiate_db clears the
    mismatched tables before the stages run, so the per-stage schema
    check cannot abort exactly the rebuild that would fix it (the
    reference's 'older version -> full recompute' promise,
    broker.py:535-537)."""
    b = Broker(spark, str(tmp_path / "wh"))
    # old-layout fact table (no timestamp column) + stale version stamp
    b.write("ts_p_d", spark.createDataFrame([(1, 1.0)], "station_id int, raw double"))
    b.set_db_version("0.0.1")
    assert b._needs_reinitiation()
    meta = spark.createDataFrame(
        [(s, "p_d", True, s * 1000.0, 0.0, 100 + s) for s in (1, 2)],
        "station_id int, parameter string, is_real boolean, "
        "x_utm double, y_utm double, stationshoehe int",
    )
    ma = spark.createDataFrame(
        [(s, "p_d", "year", 800.0 + s) for s in (1, 2)],
        "station_id int, parameter string, term string, value double",
    )
    raw = spark.range(2 * 10).select(
        (F.col("id") % 2 + 1).cast("int").alias("station_id"),
        (F.lit("2024-01-01").cast("timestamp")
         + (F.col("id") / 2).cast("int") * F.expr("INTERVAL 1 DAY")
         ).alias("timestamp"),
        F.round((F.col("id") % 7) * 1.0, 1).alias("raw"),
    )
    b.update_db(meta, ma, {"p_d": raw})  # must not raise the schema error
    assert b.get_db_version() == __version__
    assert "timestamp" in b.read("ts_p_d").columns
    assert b.read("ts_p_d").count() == 20  # 2 stations x 10 days


def dt_ts():
    import datetime as dt

    return dt.datetime(2024, 1, 1)


# ------------------------------------------------------------------ cli

def test_cli_maintenance_commands(spark, tmp_path):
    from weatherdb_spark.cli import main

    wh = str(tmp_path / "wh")
    b = Broker(spark, wh)
    df = spark.range(500).select(
        (F.col("id") % 20).cast("int").alias("station_id"),
        (F.lit("2024-01-01").cast("timestamp")
         + (F.col("id") / 20).cast("int") * F.expr("INTERVAL 1 DAY")
         ).alias("timestamp"),
        F.col("id").cast("double").alias("raw"),
    ).repartition(10)
    b.write("ts_p_d", df, bucket_by_station=True)

    assert main(["vacuum", "--warehouse", wh]) == 0
    assert b._n_parquet_files("ts_p_d") <= N_STATION_BUCKETS

    # --retention 0 forces reclamation of the just-superseded snapshot
    # (the default window would retain it for in-flight readers)
    import os as _os

    def _versions():
        return sorted(e for e in _os.listdir(b.path("ts_p_d"))
                      if e.startswith("_v"))

    assert len(_versions()) > 1  # the compaction left its predecessor
    assert main(["vacuum", "--warehouse", wh, "--retention", "0"]) == 0
    assert len(_versions()) == 1

    assert main(["set-db-version", "--warehouse", wh]) == 0
    assert Broker(spark, wh).get_db_version() == __version__

    assert main(["upgrade-db-schema", "--warehouse", wh]) == 0

    # stale lock -> force-deactivate clears it
    with open(b.lock_path, "w") as fh:
        fh.write("{}")
    assert main(["force-deactivate", "--warehouse", wh]) == 0
    assert not b.is_any_active


# -------------------------------------------------------------- horizon

def test_update_horizon_writes_meta_horizon_and_class(spark, tmp_path):
    import numpy as np

    b = Broker(spark, str(tmp_path / "wh"))
    meta = spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100), (2, "p", True, 5000.0, 0.0, 200),
         (1, "t", True, 0.0, 0.0, 100)],
        "station_id int, parameter string, is_real boolean, "
        "x_utm double, y_utm double, stationshoehe int",
    )
    b.update_meta(meta)

    def flat_dem(xs, ys):
        return np.zeros(len(xs))

    b.update_horizon(flat_dem, "p", radius_m=2000.0, sample_step_m=500.0)
    out = b.read("meta")
    p_rows = {r["station_id"]: r for r in
              out.filter(F.col("parameter") == "p").collect()}
    assert p_rows[1]["horizon"] == 0.0
    assert p_rows[1]["richter_class"] == "no-protection"  # [0, 3) bin
    assert p_rows[2]["horizon"] == 0.0
    # the t row is untouched
    assert out.filter(F.col("parameter") == "t").count() == 1


# --------------------------------------------------------------- vacuum

def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_vacuum_compacts_fact_table_and_preserves_content(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    df = spark.range(2000).select(
        (F.col("id") % 50).cast("int").alias("station_id"),
        (F.lit("2024-01-01").cast("timestamp")
         + (F.col("id") / 50).cast("int") * F.expr("INTERVAL 1 DAY")
         ).alias("timestamp"),
        F.round(F.col("id") * 0.1, 1).alias("raw"),
    ).repartition(12)  # 12 tasks x up to 16 buckets -> fragmented
    b.write("ts_p_d", df, bucket_by_station=True)
    before_files = b._n_parquet_files("ts_p_d")
    assert before_files > 2 * N_STATION_BUCKETS  # genuinely fragmented
    before_rows = _rows(b.read("ts_p_d"))

    compacted = b.vacuum()
    assert "ts_p_d" in compacted
    n_before, n_after = compacted["ts_p_d"]
    assert n_before == before_files
    assert n_after <= N_STATION_BUCKETS
    assert _rows(b.read("ts_p_d")) == before_rows  # content unchanged
    assert not b.is_any_active


def test_vacuum_multi_year_table_compacts_once_then_stabilizes(spark, tmp_path):
    """Fragmentation is per (station_bucket, ts_year) LEAF: a compacted
    30-year table holds buckets x 30 files — far over any table-total
    threshold — and must NOT be re-vacuumed forever. The first vacuum of
    a fragmented multi-year table rewrites it; the second is a no-op."""
    b = Broker(spark, str(tmp_path / "wh"))
    df = spark.range(3000).select(
        (F.col("id") % 10).cast("int").alias("station_id"),
        (F.lit("1995-01-01").cast("timestamp")
         + (F.col("id") % 30) * F.expr("INTERVAL 367 DAY")  # 30 years
         + (F.col("id") / 300).cast("int") * F.expr("INTERVAL 1 HOUR")
         ).alias("timestamp"),
        F.round(F.col("id") * 0.1, 1).alias("raw"),
    ).repartition(12)  # 12 tasks touching every (bucket, year) leaf
    b.write("ts_p_d", df, bucket_by_station=True)
    assert b._max_files_per_leaf("ts_p_d") > 2
    before_rows = _rows(b.read("ts_p_d"))

    compacted = b.vacuum()
    assert "ts_p_d" in compacted
    assert b._max_files_per_leaf("ts_p_d") == 1  # one file per leaf
    assert _rows(b.read("ts_p_d")) == before_rows

    # already compact: the follow-up vacuum must not rewrite the table
    v = b.table_version("ts_p_d")
    assert "ts_p_d" not in b.vacuum()
    assert b.table_version("ts_p_d") == v


def test_vacuum_compacts_dim_table_and_skips_small_tables(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"))
    meta = spark.createDataFrame(
        [(i, "p", True) for i in range(100)],
        "station_id int, parameter string, is_real boolean",
    ).repartition(8)
    b.write("meta", meta)
    small = spark.createDataFrame([(1, "x")], "a int, b string")
    b.write("raw_files_like", small)

    compacted = b.vacuum()
    assert compacted["meta"][1] == 1
    assert "raw_files_like" not in compacted  # below threshold, untouched
    assert _rows(b.read("meta")) == sorted((i, "p", True) for i in range(100))


def test_bucket_count_pins_legacy_default_for_existing_warehouse(
    spark, tmp_path, monkeypatch
):
    """A warehouse whose fact tables predate the n_station_buckets
    setting was written with the shipped default modulus — opening it
    under a user config with a DIFFERENT bucket count must pin the
    legacy default (the modulus is a property of the data), not the
    knob; only a fresh warehouse takes the knob."""
    from weatherdb_spark import userconfig
    from weatherdb_spark.broker import N_STATION_BUCKETS

    wh = tmp_path / "wh"
    b = Broker(spark, str(wh))
    df = spark.range(40).select(
        (F.col("id") % 10).cast("int").alias("station_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        F.lit(1.0).alias("raw"),
    )
    b.write("ts_p", df, bucket_by_station=True)
    # simulate the pre-pinning engine: the setting does not exist yet
    settings = __import__("json").load(open(wh / "settings.json"))
    settings.pop("n_station_buckets")
    __import__("json").dump(settings, open(wh / "settings.json", "w"))

    monkeypatch.setenv(
        "WEATHERDB_SPARK_MAIN_CONFIG_DIR", str(tmp_path / "main")
    )
    cfg = userconfig.get_config(reload=True)
    cfg.create_user_config(tmp_path / "user.ini")
    cfg.update_user_config("engine", "n_station_buckets", "8")
    try:
        assert Broker(spark, str(wh)).bucket_count == N_STATION_BUCKETS
        # a FRESH warehouse takes the user knob
        assert Broker(spark, str(tmp_path / "wh_new")).bucket_count == 8
    finally:
        userconfig._config = None


def test_upgrade_db_schema_respects_active_broker(spark, tmp_path):
    """The layout migration renames files out of flat table roots, so it
    must honor the warehouse mutex like every other mutating stage."""
    wh = tmp_path / "wh"
    a = Broker(spark, str(wh))
    with a.activate():
        with pytest.raises(RuntimeError):
            Broker(spark, str(wh)).upgrade_db_schema()
    Broker(spark, str(wh)).upgrade_db_schema()  # lock released -> fine


def test_create_db_schema_lifecycle(spark, tmp_path):
    """create_db_schema (parquet analog of the reference DDL,
    broker.py:61-130): pins modulus + layout on a fresh warehouse;
    existing tables require an explicit if_exists choice — drop clears
    them and re-seeds the modulus, ignore keeps them, exit no-ops."""
    wh = tmp_path / "wh"
    b = Broker(spark, str(wh))
    with pytest.raises(ValueError):
        b.create_db_schema(silent=True)  # silent needs if_exists
    with pytest.raises(ValueError, match="if_exists"):
        b.create_db_schema(if_exists="recreate")  # unknown policy
    b.create_db_schema()
    assert b.get_setting("layout") == str(b.LAYOUT_VERSION)
    assert b.get_setting("n_station_buckets") is not None

    df = spark.range(10).select(
        (F.col("id") % 3).cast("int").alias("station_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        F.lit(1.0).alias("raw"),
    )
    b.write("ts_p", df, bucket_by_station=True)
    with pytest.raises(RuntimeError, match="ts_p"):
        b.create_db_schema()  # existing tables need an explicit choice
    b.create_db_schema(if_exists="exit")  # no-op
    assert b.exists("ts_p")
    b.create_db_schema(if_exists="ignore")
    assert b.exists("ts_p")
    b.create_db_schema(if_exists="drop")
    assert not b.exists("ts_p")
    assert b.get_setting("n_station_buckets") is not None


# ------------------------------------------------- pluggable lock backend

from weatherdb_spark.functions.locking import LockBackend


class _CountingBackend(LockBackend):
    """Fake non-atomic-store backend: records every call so the test can
    prove activate() routes exclusively through the interface, and can be
    flipped to simulate a lost acquire race (what a conditional put on an
    object store reports when another writer won)."""

    def __init__(self, deny=False):
        self.deny = deny
        self.calls = []
        self._held = {}

    def acquire(self, path, payload):
        self.calls.append(("acquire", path))
        if self.deny or path in self._held:
            return False
        self._held[path] = payload
        return True

    def release(self, path):
        self.calls.append(("release", path))
        self._held.pop(path, None)

    def held(self, path):
        return path in self._held


def test_activate_routes_through_lock_backend(spark, tmp_path):
    backend = _CountingBackend()
    b = Broker(spark, str(tmp_path / "wh"), lock_backend=backend)
    with b.activate():
        assert b.is_any_active
        # no lock FILE was created: the mutex lives in the backend
        assert not os.path.exists(b.lock_path)
    assert not b.is_any_active
    assert [c for c, _ in backend.calls] == ["acquire", "release"]


def test_lost_acquire_race_raises_like_a_held_lock(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "wh"),
               lock_backend=_CountingBackend(deny=True))
    with pytest.raises(RuntimeError, match="Another Broker is active"):
        with b.activate():
            pass


def test_lock_backend_config_resolution(spark, tmp_path):
    from weatherdb_spark.functions.locking import (
        PosixExclLockBackend,
        resolve_lock_backend,
    )

    # default knob -> the POSIX O_EXCL backend
    b = Broker(spark, str(tmp_path / "wh"))
    assert isinstance(b.lock_backend, PosixExclLockBackend)
    # module:attr path -> imported and instantiated
    got = resolve_lock_backend(
        "weatherdb_spark.functions.locking:PosixExclLockBackend"
    )
    assert isinstance(got, PosixExclLockBackend)
    with pytest.raises(ValueError, match="lock_backend"):
        resolve_lock_backend("definitely-not-a-backend")
    with pytest.raises(TypeError, match="not a LockBackend"):
        resolve_lock_backend("builtins:dict")
