"""Engine logging configuration — the Spark-side twin of the reference's
file+console logging setup (weatherdb/utils/logging.py:1-125).

The reference configures the package logger from its user config: a
``console`` handler and/or a daily-rotated ``file`` handler (filename
templated with ``{user}``/``{host}``, old files gzip-compressed and pruned
after 14 days). This module reproduces those semantics for the engine's
own (driver-side) logging. Spark's executor/JVM logging stays with
log4j — this intentionally only governs the ``weatherdb_spark`` Python
logger, as the reference's governs the ``weatherdb`` one.

Config section (user config, layered over the shipped defaults)::

    [logging]
    handlers = console, file
    level = INFO
    directory = ./logs
    file = weatherdb_spark_{user}_{host}.log
    compression = True
    format = %%(asctime)s - %%(name)s - %%(levelname)s - %%(message)s
"""

from __future__ import annotations

import datetime as dt
import getpass
import gzip
import logging
import os
import re
import shutil
import socket
from logging.handlers import TimedRotatingFileHandler
from pathlib import Path

#: the package logger every engine module should child off
log = logging.getLogger(__name__.split(".")[0])

_DEFAULT_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
_HANDLER_PREFIX = "weatherdb_spark_config:"


def _log_dir() -> Path:
    from weatherdb_spark.userconfig import get_config

    return Path(get_config().get("logging", "directory", fallback="./logs"))


def remove_old_logs(max_days: int = 14) -> int:
    """Delete rotated log files older than ``max_days`` (reference
    remove_old_logs, utils/logging.py:26-38). Returns the number
    removed. Matches both plain and compressed rotations."""
    log_dir = _log_dir()
    if not log_dir.is_dir():
        return 0
    cutoff = dt.datetime.now() - dt.timedelta(days=max_days)
    removed = 0
    for f in log_dir.glob("*.log.*"):
        m = re.match(r".*\.log\.(\d{4}-\d{2}-\d{2})(\.gz)?$", f.name)
        if not m:
            continue
        try:
            stamp = dt.datetime.strptime(m.group(1), "%Y-%m-%d")
        except ValueError:
            continue
        if stamp < cutoff:
            try:
                f.unlink()
                removed += 1
            except OSError:
                pass
    return removed


def _gzip_rotator(source: str, dest: str) -> None:
    with open(source, "rb") as f_in, gzip.open(dest, "wb") as f_out:
        shutil.copyfileobj(f_in, f_out)
    os.remove(source)


def _file_handler(log_file: Path, compression: bool) -> TimedRotatingFileHandler:
    handler = TimedRotatingFileHandler(
        str(log_file), when="midnight", encoding="utf-8"
    )
    if compression:
        handler.namer = lambda name: name + ".gz"
        handler.rotator = _gzip_rotator
    return handler


def setup_logging_handlers() -> None:
    """(Re)configure the package logger from the ``[logging]`` user
    config (reference setup_logging_handlers, utils/logging.py:40-124):
    idempotent — re-running updates level/format in place and swaps the
    file handler when the configured path changed, instead of stacking
    duplicate handlers."""
    from weatherdb_spark.userconfig import get_config

    cfg = get_config()
    handlers = [
        h.strip()
        for h in cfg.get("logging", "handlers", fallback="").split(",")
        if h.strip()
    ]
    level = cfg.get("logging", "level", fallback="DEBUG")
    fmt = cfg.get("logging", "format", raw=True, fallback=_DEFAULT_FORMAT)
    log.setLevel(level)

    existing = {h.get_name(): h for h in log.handlers}
    for handler_type in handlers:
        name = f"{_HANDLER_PREFIX}{handler_type}"
        if handler_type == "console":
            handler = existing.get(name) or logging.StreamHandler()
        elif handler_type == "file":
            log_dir = _log_dir()
            log_dir.mkdir(parents=True, exist_ok=True)
            try:
                user = getpass.getuser()
            except Exception:
                user = "anonym"
            host = socket.gethostname().replace(".", "_")
            log_file = log_dir / cfg.get(
                "logging", "file",
                fallback="weatherdb_spark_{user}_{host}.log",
            ).format(user=user, host=host)
            handler = existing.get(name)
            # swap when the configured path changed (reference
            # utils/logging.py:105-118). FileHandler stores baseFilename
            # absolutized, so the comparison must absolutize too — a
            # relative configured path would otherwise never match and
            # every reconfigure would churn the handler and its
            # rotation schedule.
            if handler is not None and handler.baseFilename != os.path.abspath(
                str(log_file)
            ):
                log.removeHandler(handler)
                handler.close()
                handler = None
            if handler is None:
                handler = _file_handler(
                    log_file,
                    cfg.getboolean("logging", "compression", fallback=True),
                )
            # the reference prunes rotated logs on every (re)setup
            # (utils/logging.py:26-38 called from setup_logging_handlers);
            # the rotating handler itself never deletes (backupCount=0)
            remove_old_logs(
                cfg.getint("logging", "max_days", fallback=14)
            )
        else:
            raise ValueError(f"Handler {handler_type!r} not known.")

        if handler.get_name() != name:
            handler.set_name(name)
            log.addHandler(handler)
        handler.setFormatter(logging.Formatter(fmt))
        handler.setLevel(level)


def teardown_logging_handlers() -> None:
    """Remove every config-installed handler (test/reload hygiene)."""
    for h in list(log.handlers):
        if (h.get_name() or "").startswith(_HANDLER_PREFIX):
            log.removeHandler(h)
            h.close()
