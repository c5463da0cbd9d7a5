"""User-config layer round trip (reference ConfigParser semantics,
weatherdb/config/ConfigParser.py:333-544): create a commented copy of
the defaults, edit it, reload, and the engine honors the overridden
knobs (Broker warehouse dir, timeline min_date); env vars override
last."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from weatherdb_spark import userconfig
from weatherdb_spark.broker import Broker
from weatherdb_spark.config import MIN_DATE


@pytest.fixture()
def cfg(tmp_path, monkeypatch):
    monkeypatch.setenv("WEATHERDB_SPARK_MAIN_CONFIG_DIR", str(tmp_path / "main"))
    monkeypatch.delenv("WEATHERDB_SPARK_USER_CONFIG_FILE", raising=False)
    monkeypatch.delenv("WEATHERDB_SPARK_WAREHOUSE_DIR", raising=False)
    monkeypatch.delenv("WEATHERDB_SPARK_MIN_DATE", raising=False)
    yield userconfig.get_config(reload=True)
    # drop the singleton; the next get_config() rebuilds AFTER monkeypatch
    # has restored the environment (fixture finalizers run before it)
    userconfig._config = None


def test_defaults_without_user_config(cfg):
    assert not cfg.has_user_config
    assert cfg.get("data", "min_date") == MIN_DATE
    assert cfg.getint("engine", "n_station_buckets") == 16
    with pytest.raises(FileNotFoundError):
        cfg.load_user_config()  # raise_undefined_error default


def test_create_edit_load_roundtrip(cfg, tmp_path):
    path = cfg.create_user_config(tmp_path / "user.ini")
    # a fresh copy is all comments -> loading it changes nothing
    cfg.load_user_config()
    assert cfg.get("data", "min_date") == MIN_DATE
    with pytest.raises(FileExistsError):
        cfg.create_user_config(path)  # on_exists defaults to error
    cfg.create_user_config(path, on_exists="define")  # pointer only
    # edit two knobs, reload from scratch (fresh process simulation)
    cfg.update_user_config("data", "min_date", "2005-06-01")
    cfg.update_user_config("engine", "warehouse_dir",
                           str(tmp_path / "wh_from_config"))
    fresh = userconfig.get_config(reload=True)
    assert fresh.has_user_config
    assert fresh.user_config_file == str(path)
    assert fresh.get("data", "min_date") == "2005-06-01"
    assert fresh.get("engine", "warehouse_dir").endswith("wh_from_config")


def test_env_overrides_win(cfg, tmp_path, monkeypatch):
    cfg.create_user_config(tmp_path / "user.ini")
    cfg.update_user_config("data", "min_date", "2005-06-01")
    monkeypatch.setenv("WEATHERDB_SPARK_MIN_DATE", "2010-02-03")
    fresh = userconfig.get_config(reload=True)
    assert fresh.get("data", "min_date") == "2010-02-03"


def test_broker_and_timeline_honor_config(cfg, tmp_path, spark):
    cfg.create_user_config(tmp_path / "user.ini")
    wh = str(tmp_path / "wh_cfg")
    cfg.update_user_config("engine", "warehouse_dir", wh)
    cfg.update_user_config("data", "min_date", "2024-01-05")
    userconfig.get_config(reload=True)

    b = Broker(spark)  # no dir argument -> config
    assert b.dir == wh
    assert os.path.isdir(wh)

    # update_raw applies no cut itself (min_date=None there), so probe
    # the operator default directly: rows before the configured min_date
    # are cut on timeline expansion
    from weatherdb_spark.operators.timeline import expand_timeline

    raw = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), float(i))
         for i in range(10)],
        "station_id int, timestamp timestamp, raw double",
    )
    out = expand_timeline(raw, interval="1 day")
    lo = out.agg(F.min("timestamp")).first()[0]
    assert lo == dt.datetime(2024, 1, 5)
    assert out.count() == 6  # days 5..10


def test_config_knobs_reach_the_engine(cfg, tmp_path, spark):
    """The documented knobs are WIRED, not decorative: n_station_buckets
    shapes a new warehouse's bucket layout (and is pinned in its
    settings so later config changes can't corrupt bucket pruning);
    coverage_gate reaches the A1 resampling; the fillup distances
    resolve through user_setting."""
    import os

    from weatherdb_spark.broker import Broker
    from weatherdb_spark.config import user_setting
    from weatherdb_spark.operators.aggregate import coverage_gated_agg

    cfg.create_user_config(tmp_path / "user.ini")
    cfg.update_user_config("engine", "n_station_buckets", "4")
    cfg.update_user_config("aggregation", "coverage_gate", "0.99")
    cfg.update_user_config("fillup", "max_fillup_distance_km", "55.5")
    userconfig.get_config(reload=True)

    assert user_setting("fillup", "max_fillup_distance_km", 130.0) == 55.5

    b = Broker(spark, str(tmp_path / "wh"))
    assert b.bucket_count == 4
    # 9 of 10 slots non-null: passes the default 0.8 gate, fails 0.99
    rows = [(s, dt.datetime(2024, 1, 1, h), None if h == 9 else 1.0)
            for s in range(10) for h in range(10)]
    b.write(
        "ts_p",
        spark.createDataFrame(
            rows, "station_id int, timestamp timestamp, raw double"
        ),
        bucket_by_station=True,
    )
    buckets = sorted(
        e for e in os.listdir(b.data_path("ts_p"))
        if e.startswith("station_bucket=")
    )
    assert len(buckets) == 4
    # pinned: a config change does NOT re-bucket an existing warehouse
    cfg.update_user_config("engine", "n_station_buckets", "8")
    userconfig.get_config(reload=True)
    assert Broker(spark, b.dir).bucket_count == 4
    # stids reads prune against the PINNED modulus
    from weatherdb_spark.station import Station

    st_df = Station(b, 6, "p").get_raw()
    assert st_df.count() == 10  # 6 % 4 = bucket 2; wrong modulus -> 0 rows

    # coverage_gate 0.99: 9-of-10 coverage fails the raised gate -> NULL
    day = coverage_gated_agg(
        b.read("ts_p"), kinds=("raw",), agg_to="day"
    )
    assert day.filter(F.col("raw").isNotNull()).count() == 0
    # explicit coverage argument still wins over the config
    day_explicit = coverage_gated_agg(
        b.read("ts_p"), kinds=("raw",), agg_to="day", coverage=0.8
    )
    assert day_explicit.filter(F.col("raw").isNotNull()).count() == 10


def test_get_config_accessor_survives_submodule_import(cfg):
    """weatherdb_spark.get_config() must reach the UserConfig singleton
    even after the config.py constants SUBMODULE is bound as the package
    'config' attribute by an engine import (module __getattr__ only
    fires when normal lookup fails, so a lazy 'config' attribute would
    be shadowed order-dependently)."""
    import weatherdb_spark
    import weatherdb_spark.broker  # noqa: F401 - binds the submodule attr
    import weatherdb_spark.config as constants

    assert weatherdb_spark.config is constants  # submodule wins, by design
    got = weatherdb_spark.get_config()
    assert got is userconfig.get_config()
    assert got.get("engine", "n_station_buckets") == "16"


def test_malformed_user_value_fails_loudly(cfg, tmp_path):
    """A user override that cannot parse must raise, not silently run
    the pipeline with the shipped default."""
    from weatherdb_spark.config import COVERAGE_GATE, user_setting

    cfg.create_user_config(tmp_path / "user.ini")
    cfg.update_user_config("aggregation", "coverage_gate", "0,9")
    with pytest.raises(ValueError, match=r"coverage_gate"):
        user_setting("aggregation", "coverage_gate", COVERAGE_GATE)
    # absent knobs still fall back silently
    assert user_setting("aggregation", "no_such_option", 1.25) == 1.25


def test_env_override_survives_user_config_reload(cfg, tmp_path, monkeypatch):
    """'environment variables override last' must hold across explicit
    load_user_config()/update_user_config() calls, not just __init__."""
    path = cfg.create_user_config(tmp_path / "user.ini")
    cfg.update_user_config("engine", "warehouse_dir", str(tmp_path / "from_ini"))
    monkeypatch.setenv("WEATHERDB_SPARK_WAREHOUSE_DIR", str(tmp_path / "from_env"))
    live = userconfig.get_config(reload=True)
    assert live.get("engine", "warehouse_dir").endswith("from_env")
    live.load_user_config()  # re-read the edited ini
    assert live.get("engine", "warehouse_dir").endswith("from_env")
    live.update_user_config("engine", "warehouse_dir", str(tmp_path / "from_ini2"))
    assert live.get("engine", "warehouse_dir").endswith("from_env")
    # the ini itself did record the update for env-less sessions
    import configparser

    raw = configparser.ConfigParser()
    raw.read(path)
    assert raw.get("engine", "warehouse_dir").endswith("from_ini2")


def test_empty_env_var_is_not_a_user_config(cfg, monkeypatch):
    """WEATHERDB_SPARK_USER_CONFIG_FILE='' must behave like unset —
    previously has_user_config was True while user_config_file was None
    and load_user_config crashed on Path(None)."""
    monkeypatch.setenv("WEATHERDB_SPARK_USER_CONFIG_FILE", "")
    assert not cfg.has_user_config
    cfg.load_user_config(raise_undefined_error=False)  # no TypeError


def test_load_user_config_remove_persists(cfg, tmp_path):
    """'remove' must clear the recorded location ON DISK, or the next
    process hits the same FileNotFoundError."""
    path = tmp_path / "user.ini"
    cfg.create_user_config(path)
    path.unlink()
    cfg.load_user_config(if_not_existing="remove")
    assert not cfg.has_option("main", "user_config_file")
    # a fresh parser reading the main config sees no stale pointer
    fresh = userconfig.UserConfig()
    assert not fresh.has_user_config


def test_create_user_config_validates_on_exists_upfront(cfg, tmp_path):
    with pytest.raises(ValueError, match="on_exists"):
        cfg.create_user_config(tmp_path / "new.ini", on_exists="replace")
    assert not (tmp_path / "new.ini").exists()


def test_typed_getters(cfg):
    # YYYY-MM-DD option -> UTC datetime / date (ConfigParser.py:191-203)
    got = cfg.get_datetime("data", "min_date")
    assert got == dt.datetime(1999, 1, 1, tzinfo=dt.timezone.utc)
    assert cfg.get_date("data", "min_date") == dt.date(1999, 1, 1)
    # unset option with a None fallback -> None, not a parse error
    assert cfg.get_datetime("data", "_test_missing", fallback=None) is None
    assert cfg.get_date("data", "_test_missing", fallback=None) is None
    # comma list parsing with whitespace and blanks dropped
    cfg.set("data", "_test_list", "a, b,\n c,,  ")
    assert cfg.get_list("data", "_test_list") == ["a", "b", "c"]
    assert cfg.get_list("data", "_test_missing") == []
    with pytest.warns(FutureWarning):
        assert cfg.getlist("data", "_test_list") == ["a", "b", "c"]


def test_change_listeners_fire_only_on_change(cfg):
    hits = []
    cfg.add_listener("data", "_probe", lambda: hits.append("exact"))
    cfg.add_listener("data", None, lambda: hits.append("section"))
    cfg.add_listener(None, None, lambda: hits.append("any"))
    cfg.set("data", "_probe", "1")
    assert hits == ["exact", "section", "any"]
    cfg.set("data", "_probe", "1")      # unchanged -> no callbacks
    assert hits == ["exact", "section", "any"]
    cfg.set("data", "_other", "x")      # different option
    assert hits[3:] == ["section", "any"]
    cfg.remove_listener("data", "_all_")
    cfg.set("data", "_probe", "2")
    assert hits[5:] == ["any"]
    # list values join like the reference (ConfigParser.py:131-133)
    cfg.set("data", "_lst", ["a", "b"])
    assert cfg.get_list("data", "_lst") == ["a", "b"]


def test_listeners_skip_repeated_identical_list_set(cfg):
    """Lists are stored with ',\\n\\t' joiners; the changed comparison must
    strip tabs on BOTH sides or a repeated identical list assignment
    re-fires listeners forever (quirk inherited from the reference)."""
    hits = []
    cfg.set("data", "_lst2", ["a", "b"])
    cfg.add_listener("data", "_lst2", lambda: hits.append(1))
    cfg.set("data", "_lst2", ["a", "b"])    # identical -> no callback
    assert hits == []
    cfg.set("data", "_lst2", ["a", "c"])    # real change -> fires
    assert hits == [1]
    cfg.remove_listener("data", "_lst2")


def test_set_user_config_file_records_and_loads(cfg, tmp_path):
    ini = tmp_path / "user.ini"
    ini.write_text("[data]\nmin_date = 1999-09-09\n")
    with pytest.raises(FileNotFoundError):
        cfg.set_user_config_file(tmp_path / "missing.ini")
    cfg.set_user_config_file(ini)
    assert cfg.get("data", "min_date") == "1999-09-09"
    # the pointer persists for the next process
    assert userconfig.UserConfig().get("data", "min_date") == "1999-09-09"


def test_cli_safe_entry_formats_errors(tmp_path, capsys):
    from weatherdb_spark.cli import safe_entry

    # unknown warehouse command path: update-ma-timeserie on an empty
    # warehouse raises; safe_entry turns it into exit code 1 + stderr
    rc = safe_entry(["update-ma-timeserie", "--warehouse",
                     str(tmp_path / "nope"), "-p", "p"])
    assert rc == 1
    assert "An error occurred" in capsys.readouterr().err
    with pytest.raises(Exception):
        safe_entry(["--verbose", "update-ma-timeserie", "--warehouse",
                    str(tmp_path / "nope"), "-p", "p"])


def test_dwd_id_and_polar_line_helpers():
    from weatherdb_spark.functions.spatial import polar_line
    from weatherdb_spark.sources.dwd import dwd_id_to_str

    assert dwd_id_to_str(44) == "00044"
    assert dwd_id_to_str("7") == "00007"
    (x0, y0), (x1, y1) = polar_line((10.0, 20.0), 5.0, 90.0)
    assert (x0, y0) == (10.0, 20.0)
    assert abs(x1 - 10.0) < 1e-9 and abs(y1 - 25.0) < 1e-9
