"""User configuration layered over the engine defaults.

The engine twin of the reference's ConfigParser
(weatherdb/config/ConfigParser.py:333-544): a shipped
``config_default.ini`` holds the defaults; ``create_user_config`` copies
it (options commented out) to a user-owned ini whose location is
remembered in a small main config; ``load_user_config`` layers the user
file over the defaults; environment variables override last. Unlike the
reference there are no interactive tkinter/input prompts — every
``on_exists`` / ``if_not_existing`` policy is an explicit argument — and
no database-credential handling (the warehouse is parquet).

Environment variables (checked at load, reference
ConfigParser.load_environment_variables:609-657):

- ``WEATHERDB_SPARK_USER_CONFIG_FILE`` — user config location (wins
  over the main-config pointer)
- ``WEATHERDB_SPARK_WAREHOUSE_DIR`` — overrides [engine] warehouse_dir
- ``WEATHERDB_SPARK_MIN_DATE`` — overrides [data] min_date
- ``WEATHERDB_SPARK_MAIN_CONFIG_DIR`` — where the pointer file lives
  (default ``~/.config/weatherdb_spark``)
"""

from __future__ import annotations

import configparser
import os
import re
from pathlib import Path

_DEFAULT_CONFIG_FILE = Path(__file__).parent / "config_default.ini"

_ENV_OVERRIDES = [
    # (env var, section, option)
    ("WEATHERDB_SPARK_WAREHOUSE_DIR", "engine", "warehouse_dir"),
    ("WEATHERDB_SPARK_MIN_DATE", "data", "min_date"),
]


class UserConfig(configparser.ConfigParser):
    """Defaults + user ini + environment variables, in that order."""

    def __init__(self) -> None:
        super().__init__(interpolation=configparser.ExtendedInterpolation())
        self._user_listeners: list[tuple] = []
        self.read(_DEFAULT_CONFIG_FILE, encoding="utf-8")
        self._read_main_config()
        self.load_user_config(raise_undefined_error=False,
                              if_not_existing="ignore")
        self.load_environment_variables()

    # ------------------------------------------------- change listeners
    # (reference config/ConfigParser.py:57-97,138-143)

    def add_listener(self, section, option, callback) -> None:
        """Call ``callback()`` when a matching option CHANGES value.
        ``section``/``option`` of None match every change (reference
        add_listener, ConfigParser.py:57-72)."""
        if (section, option, callback) not in self._user_listeners:
            self._user_listeners.append((section, option, callback))

    def remove_listener(self, section, option, callback="_all_") -> None:
        """Remove matching callbacks; ``"_all_"`` wildcards any field
        (reference remove_listener, ConfigParser.py:74-97)."""
        keep = []
        for cb in self._user_listeners:
            matches = (
                (section == "_all_" or cb[0] == section)
                and (option == "_all_" or cb[1] == option)
                and (callback == "_all_" or cb[2] == callback)
            )
            if not matches:
                keep.append(cb)
        self._user_listeners = keep

    def set(self, section, option, value=None):  # type: ignore[override]
        """Reference set (ConfigParser.py:125-143): lists join to
        comma-newline strings; listeners fire only when the stored value
        actually changes."""
        if section != self.default_section and not self.has_section(section):
            # the reference's set auto-creates the section
            # (ConfigParser.py:130-131)
            self.add_section(section)
        if isinstance(value, (list, tuple)):
            value = ",\n\t".join(str(v) for v in value)
        elif value is not None and not isinstance(value, str):
            value = str(value)
        # strip tabs on BOTH sides: list values are stored with ",\n\t"
        # joiners, so comparing a fresh tab-stripped value against the
        # stored raw string never matched after an in-memory set and
        # listeners re-fired on identical assignments
        stored = (
            super().get(section, option, raw=True)
            if option in self[section] else None
        )
        changed = (
            stored is None
            or (value is not None
                and value.replace("\t", "")
                != stored.replace("\t", ""))
        )
        super().set(section, option, value)
        if changed:
            for cb_section, cb_option, cb in self._user_listeners:
                if cb_section is None or cb_section == section:
                    if cb_option is None or cb_option == option:
                        cb()

    # --------------------------------------------------- typed getters
    # (reference config/ConfigParser.py:169-203)

    def get_list(self, section: str, option: str) -> list[str]:
        """COMMA-separated option as a list of stripped strings
        (ConfigParser.py:169-177; newlines are removed before the split
        exactly like the reference, so a multi-line value needs trailing
        commas). Missing option -> []."""
        raw = self.get(section, option, fallback=None)
        if not raw:
            return []
        return [
            v.strip() for v in raw.replace("\n", "").split(",") if v.strip()
        ]

    def getlist(self, section: str, option: str) -> list[str]:
        """Deprecated alias of :meth:`get_list` (ConfigParser.py:179-189)."""
        import warnings

        warnings.warn(
            "getlist will become deprecated, please use get_list instead.",
            FutureWarning,
            stacklevel=2,
        )
        return self.get_list(section, option)

    def get_datetime(self, section: str, option: str, fallback=None):
        """``YYYY-MM-DD`` option as a UTC datetime
        (ConfigParser.py:191-197); None when unset."""
        import datetime as dt

        raw = self.get(section, option, fallback=fallback)
        if not raw:
            return None
        return dt.datetime.strptime(raw, "%Y-%m-%d").replace(
            tzinfo=dt.timezone.utc
        )

    def get_date(self, section: str, option: str, fallback=None):
        """``YYYY-MM-DD`` option as a date (ConfigParser.py:199-203)."""
        value = self.get_datetime(section, option, fallback=fallback)
        return value.date() if value is not None else None

    # ------------------------------------------------------- main config
    # A tiny pointer file remembering where the user config lives — the
    # reference's config_main.ini (kept outside the package so installs
    # stay pristine).

    @property
    def _main_config_dir(self) -> Path:
        override = os.environ.get("WEATHERDB_SPARK_MAIN_CONFIG_DIR")
        if override:
            return Path(override)
        return Path("~/.config/weatherdb_spark").expanduser()

    @property
    def _main_config_file(self) -> Path:
        return self._main_config_dir / "config_main.ini"

    def _read_main_config(self) -> None:
        main = configparser.ConfigParser()
        main.read(self._main_config_file, encoding="utf-8")
        if main.has_option("main", "user_config_file"):
            if not self.has_section("main"):
                self.add_section("main")
            self.set("main", "user_config_file",
                     main.get("main", "user_config_file"))

    def _write_main_config(self) -> None:
        self._main_config_dir.mkdir(parents=True, exist_ok=True)
        main = configparser.ConfigParser()
        main.add_section("main")
        # no recorded location (e.g. after a 'remove') writes an empty
        # main section — the pointer is gone on disk too
        if self.has_option("main", "user_config_file"):
            main.set("main", "user_config_file",
                     self.get("main", "user_config_file"))
        with open(self._main_config_file, "w") as fh:
            main.write(fh)

    # -------------------------------------------------------- user config
    @property
    def has_user_config(self) -> bool:
        """Reference ConfigParser.has_user_config:308-316."""
        return (
            self.has_option("main", "user_config_file")
            # an EMPTY env var means "not set" — counting it would make
            # user_config_file return None and crash Path(None) below
            or bool(os.environ.get("WEATHERDB_SPARK_USER_CONFIG_FILE"))
        )

    @property
    def user_config_file(self) -> str | None:
        """Reference ConfigParser.user_config_file:319-330 — the env var
        wins over the main-config pointer."""
        env = os.environ.get("WEATHERDB_SPARK_USER_CONFIG_FILE")
        if env:
            return env
        if self.has_option("main", "user_config_file"):
            return self.get("main", "user_config_file")
        return None

    def create_user_config(self, user_config_file: str | os.PathLike,
                           on_exists: str = "error") -> str:
        """Create a user config file: the defaults with every option line
        commented out, ready to uncomment and edit (reference
        create_user_config:333-433 writes ``; ``-prefixed lines).

        ``on_exists``: 'error' raises, 'overwrite' rewrites the file,
        'define' only records the location.
        Returns the file path and records it in the main config."""
        path = Path(user_config_file)
        if not on_exists or on_exists[0].lower() not in ("e", "o", "d"):
            # validate unconditionally — a typo'd policy must not be
            # accepted on first creation and rejected on the second run
            raise ValueError(
                f"on_exists {on_exists!r} not in "
                "('error', 'overwrite', 'define')"
            )
        write = True
        if path.exists():
            if on_exists[0].lower() == "e":
                raise FileExistsError(
                    f"user config file already exists at {path}"
                )
            if on_exists[0].lower() == "d":
                write = False
        if write:
            path.parent.mkdir(parents=True, exist_ok=True)
            with open(_DEFAULT_CONFIG_FILE) as default_f, \
                    open(path, "w") as user_f:
                for line in default_f:
                    if not re.match(r"^\[|;", line) and line.strip():
                        line = "; " + line
                    user_f.write(line)
        if not self.has_section("main"):
            self.add_section("main")
        self.set("main", "user_config_file", str(path))
        self._write_main_config()
        return str(path)

    def set_user_config_file(self, user_config_file) -> None:
        """Record an EXISTING ini as the user config and load it
        (reference set_user_config_file, ConfigParser.py:493-524 — minus
        the tkinter file dialog; the path is a required argument here,
        like every other interactive branch in this module)."""
        path = Path(user_config_file)
        if not path.exists():
            raise FileNotFoundError(
                f"user config file not found at {path}"
            )
        if not self.has_section("main"):
            self.add_section("main")
        self.set("main", "user_config_file", str(path))
        self._write_main_config()
        self.load_user_config()

    def load_user_config(self, raise_undefined_error: bool = True,
                         if_not_existing: str = "error") -> None:
        """(Re)layer the user config over the defaults (reference
        load_user_config:435-491, minus the interactive branches).

        ``if_not_existing``: 'error' raises when the recorded file is
        missing, 'ignore' keeps the defaults, 'remove' clears the
        recorded location."""
        if not self.has_user_config:
            if raise_undefined_error:
                raise FileNotFoundError("no user config file defined")
            return
        path = Path(self.user_config_file)
        if path.exists():
            self.read(path, encoding="utf-8")
            # environment variables override LAST (the module contract):
            # re-layering the user ini must not bury an env-derived value
            self.load_environment_variables()
        elif if_not_existing[0].lower() == "r":
            self.remove_option("main", "user_config_file")
            # persist: the on-disk main config must stop pointing at the
            # missing file, or the next process errors again
            self._write_main_config()
        elif if_not_existing[0].lower() != "i":
            raise FileNotFoundError(f"user config file not found at {path}")

    def update_user_config(self, section: str, option: str,
                           value: str) -> None:
        """Set an option and persist it into the user config file
        (reference update_user_config:525-607)."""
        if not self.has_user_config:
            raise FileNotFoundError(
                "no user config file defined — create_user_config first"
            )
        path = Path(self.user_config_file)
        user = configparser.ConfigParser()
        user.read(path, encoding="utf-8")
        if not user.has_section(section):
            user.add_section(section)
        user.set(section, option, value)
        with open(path, "w") as fh:
            user.write(fh)
        if not self.has_section(section):
            self.add_section(section)
        self.set(section, option, value)
        # env vars stay the topmost layer even over a just-written option
        self.load_environment_variables()

    # -------------------------------------------------------- environment
    def load_environment_variables(self) -> None:
        for var, section, option in _ENV_OVERRIDES:
            if var in os.environ:
                if not self.has_section(section):
                    self.add_section(section)
                self.set(section, option, os.environ[var])


_config: UserConfig | None = None


def get_config(reload: bool = False) -> UserConfig:
    """The process-wide configuration (reference ``weatherdb.config``
    module object). ``reload=True`` rebuilds it from disk + env."""
    global _config
    if _config is None or reload:
        _config = UserConfig()
    return _config


def create_user_config(user_config_file, on_exists: str = "error") -> str:
    return get_config().create_user_config(user_config_file, on_exists)


def load_user_config(**kw) -> None:
    get_config().load_user_config(**kw)
