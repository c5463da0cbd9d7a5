"""Engine logging configuration (reference utils/logging.py:1-125):
handlers from user config, idempotent re-setup, file-path swap, gzip
rotation naming, old-log pruning."""

from __future__ import annotations

import datetime as dt
import logging

import pytest

from weatherdb_spark import logconfig
from weatherdb_spark.userconfig import get_config


@pytest.fixture()
def logging_cfg(tmp_path):
    cfg = get_config()
    if not cfg.has_section("logging"):
        cfg.add_section("logging")
    old = dict(cfg.items("logging", raw=True))
    cfg.set("logging", "directory", str(tmp_path / "logs"))
    yield cfg
    logconfig.teardown_logging_handlers()
    for k in dict(cfg.items("logging", raw=True)):
        cfg.remove_option("logging", k)
    for k, v in old.items():
        cfg.set("logging", k, v)


def _config_handlers():
    return [h for h in logconfig.log.handlers
            if (h.get_name() or "").startswith("weatherdb_spark_config:")]


def test_no_handlers_by_default(logging_cfg):
    logging_cfg.set("logging", "handlers", "")
    logconfig.setup_logging_handlers()
    assert _config_handlers() == []


def test_console_and_file_handlers_idempotent(logging_cfg, tmp_path):
    logging_cfg.set("logging", "handlers", "console, file")
    logging_cfg.set("logging", "level", "INFO")
    logconfig.setup_logging_handlers()
    logconfig.setup_logging_handlers()  # re-run must not stack duplicates
    hs = _config_handlers()
    assert len(hs) == 2
    kinds = {type(h).__name__ for h in hs}
    assert "StreamHandler" in kinds
    assert "TimedRotatingFileHandler" in kinds
    assert logconfig.log.level == logging.INFO
    # emits into the configured directory with user/host substituted
    logconfig.log.info("hello from the stress test")
    fh = next(h for h in hs if type(h).__name__ == "TimedRotatingFileHandler")
    fh.flush()
    assert (tmp_path / "logs").is_dir()
    content = open(fh.baseFilename).read()
    assert "hello from the stress test" in content
    assert " - weatherdb_spark - INFO - " in content  # format applied
    assert "{user}" not in fh.baseFilename and "{host}" not in fh.baseFilename


def test_file_handler_swaps_on_path_change(logging_cfg, tmp_path):
    logging_cfg.set("logging", "handlers", "file")
    logconfig.setup_logging_handlers()
    first = next(iter(_config_handlers())).baseFilename
    logging_cfg.set("logging", "directory", str(tmp_path / "elsewhere"))
    logconfig.setup_logging_handlers()
    hs = _config_handlers()
    assert len(hs) == 1
    assert hs[0].baseFilename != first
    assert str(tmp_path / "elsewhere") in hs[0].baseFilename


def test_unknown_handler_rejected(logging_cfg):
    logging_cfg.set("logging", "handlers", "syslog")
    with pytest.raises(ValueError, match="not known"):
        logconfig.setup_logging_handlers()


def test_gzip_rotation_namer(logging_cfg):
    logging_cfg.set("logging", "handlers", "file")
    logging_cfg.set("logging", "compression", "True")
    logconfig.setup_logging_handlers()
    fh = next(iter(_config_handlers()))
    assert fh.namer("x.log.2026-01-01") == "x.log.2026-01-01.gz"


def test_remove_old_logs(logging_cfg, tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    old_day = (dt.datetime.now() - dt.timedelta(days=30)).strftime("%Y-%m-%d")
    new_day = dt.datetime.now().strftime("%Y-%m-%d")
    (d / f"a.log.{old_day}").write_text("old")
    (d / f"b.log.{old_day}.gz").write_bytes(b"old")
    (d / f"c.log.{new_day}").write_text("new")
    (d / "unrelated.txt").write_text("keep")
    assert logconfig.remove_old_logs(max_days=14) == 2
    assert sorted(p.name for p in d.iterdir()) == [
        f"c.log.{new_day}", "unrelated.txt",
    ]


def test_reconfigure_keeps_file_handler_with_relative_dir(
    logging_cfg, tmp_path, monkeypatch
):
    """FileHandler absolutizes baseFilename; the path-change check must
    absolutize too, or a RELATIVE configured directory (the default
    './logs') makes every reconfigure tear down and recreate the live
    handler, resetting its rotation schedule."""
    monkeypatch.chdir(tmp_path)
    logging_cfg.set("logging", "directory", "logs")  # relative on purpose
    logging_cfg.set("logging", "handlers", "file")
    logconfig.setup_logging_handlers()
    first = next(iter(_config_handlers()))
    logconfig.setup_logging_handlers()
    hs = _config_handlers()
    assert len(hs) == 1
    assert hs[0] is first  # same live handler, not a recreation


def test_setup_prunes_old_rotated_logs(logging_cfg, tmp_path):
    """setup_logging_handlers prunes rotated logs past max_days — the
    rotating handler itself never deletes (backupCount=0), so without
    this the gzip rotations accumulate forever."""
    d = tmp_path / "logs"
    d.mkdir()
    old_day = (dt.datetime.now() - dt.timedelta(days=30)).strftime("%Y-%m-%d")
    (d / f"stale.log.{old_day}.gz").write_bytes(b"old")
    logging_cfg.set("logging", "handlers", "file")
    logconfig.setup_logging_handlers()
    assert not (d / f"stale.log.{old_day}.gz").exists()
