"""weatherdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Hydrology-IFH/WeatherDB.

The reference (read-only at /root/reference) is a PostgreSQL-backed weather
timeseries manager whose "operators" are Python-generated SQL statements.
This package re-expresses those semantics as idiomatic PySpark DataFrame
computations designed for a 1000-executor cluster:

- tall fact tables (``ts_p``, ``ts_p_d``, ``ts_t``, ``ts_et``) partitioned by
  a station bucket, with files sorted on (station_id, timestamp) so period
  predicates skip row groups — instead of the reference's
  table-per-station layout (weatherdb/station/StationP.py:240-256);
- every pipeline stage (qc → fillup → corr) is a pure function
  ``f(dfs, params) -> DataFrame`` relying on Catalyst for pushdown/pruning;
- the reference's iterative PL/pgSQL fill loop
  (weatherdb/station/StationBases.py:1573-1638) becomes a declarative
  rank-ordered first-non-null-donor fill (see operators/fillup.py);
- small dimensions (meta, MA values, richter params) broadcast in joins.

Beyond reference parity, ``weatherdb_spark.llm`` adds large-scale
training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard), embedding similarity search, text analysis, and multimodal
column plumbing.
"""

from weatherdb_spark.session import get_spark

__all__ = [
    "get_spark",
    "Broker",
    "Station",
    "Stations",
    "GroupStation",
    "GroupStations",
    "StationP",
    "StationPD",
    "StationT",
    "StationET",
    "StationsP",
    "StationsPD",
    "StationsT",
    "StationsET",
    "TimestampPeriod",
    "get_config",
]
__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level exports (reference weatherdb/__init__.py exposes
    # Broker and the station classes) without paying the import cost for
    # callers that only want get_spark
    if name == "Broker":
        from weatherdb_spark.broker import Broker
        return Broker
    if name in (
        "Station", "Stations", "GroupStation", "GroupStations",
        "StationP", "StationPD", "StationT", "StationET",
        "StationsP", "StationsPD", "StationsT", "StationsET",
    ):
        from weatherdb_spark import station
        return getattr(station, name)
    if name == "TimestampPeriod":
        from weatherdb_spark.period import TimestampPeriod
        return TimestampPeriod
    if name == "get_config":
        # the reference exposes ``weatherdb.config`` (the ConfigParser
        # instance); a lazy ``config`` attribute here would be shadowed
        # by the ``weatherdb_spark.config`` constants SUBMODULE the
        # moment any engine module imports it (module __getattr__ only
        # fires when normal lookup fails), so the user-config singleton
        # is exposed as the get_config() accessor instead
        from weatherdb_spark.userconfig import get_config
        return get_config
    raise AttributeError(f"module 'weatherdb_spark' has no attribute {name!r}")
