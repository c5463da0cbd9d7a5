"""Cache hygiene: stages and query runs release their persisted
intermediates (round-4 finding: fillup's persists lived forever, squeezing
the executor storage pool on long sessions).

The reference never faces this — its stages are single PostgreSQL
statements with no cross-statement materialized state
(StationBases.py:1346-1669); a Spark session, by contrast, keeps every
persist() until someone unpersists it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.functions.caching import cache_scope, scoped_persist

from tests.conftest import SF_DIR


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_scoped_persist_released_on_exit(spark):
    spark.catalog.clearCache()
    with cache_scope():
        df = scoped_persist(spark.range(100).select((F.col("id") * 2).alias("x")))
        df.count()
        assert not _cache_empty(spark)
    assert _cache_empty(spark)


def test_scoped_persist_released_on_error(spark):
    spark.catalog.clearCache()
    with pytest.raises(RuntimeError):
        with cache_scope():
            scoped_persist(spark.range(10)).count()
            raise RuntimeError("stage blew up")
    assert _cache_empty(spark)


def test_nested_scopes_release_only_their_own(spark):
    spark.catalog.clearCache()
    with cache_scope():
        outer = scoped_persist(spark.range(50))
        outer.count()
        with cache_scope():
            scoped_persist(spark.range(60).select((F.col("id") + 1).alias("y"))).count()
        # inner released, outer still cached
        assert outer.storageLevel.useMemory
        assert not _cache_empty(spark)
    assert _cache_empty(spark)


def test_scoped_persist_without_scope_is_plain_persist(spark):
    spark.catalog.clearCache()
    df = scoped_persist(spark.range(30))
    df.count()
    assert df.storageLevel.useMemory
    spark.catalog.clearCache()


def test_broker_fillup_leaves_cache_empty(spark, tmp_path):
    """Broker.fillup persists pairs/best_near/targets internally (4 fill
    runs per update_db); after the stage returns nothing may stay cached."""
    from weatherdb_spark.broker import Broker

    b = Broker(spark, str(tmp_path / "wh"))
    stations = [1, 2, 3, 4]
    meta = spark.createDataFrame(
        [(s, "t", True, f"st{s}", 10000.0 * s, 5000.0 * (s % 3), 150 + 10 * s, None)
         for s in stations],
        "station_id int, parameter string, is_real boolean, stationsname string, "
        "x_utm double, y_utm double, stationshoehe int, horizon double",
    )
    ma = spark.createDataFrame(
        [(s, "t", "year", 9.0 + 0.5 * s) for s in stations],
        "station_id int, parameter string, term string, value double",
    )
    day_grid = spark.range(40).select(
        (F.lit("2024-01-01").cast("timestamp")
         + F.col("id") * F.expr("INTERVAL 1 DAY")).alias("timestamp"),
        F.col("id").alias("d"),
    )
    ts_t = (
        spark.createDataFrame([(s,) for s in stations], "station_id int")
        .crossJoin(day_grid)
        .select(
            "station_id", "timestamp",
            F.when((F.col("d") % 4 == 1) & (F.col("station_id") == 2), None)
            .otherwise(F.round(F.col("d") * 0.3 + F.col("station_id"), 1))
            .alias("raw"),
        )
        .withColumn("raw_min", F.col("raw") - 2.0)
        .withColumn("raw_max", F.col("raw") + 2.0)
    )
    b.update_meta(meta)
    b.update_ma_raster(ma)
    b.update_raw("t", ts_t)
    spark.catalog.clearCache()

    b.quality_check()
    b.fillup()
    assert _cache_empty(spark), "Broker.fillup left persisted intermediates"

    b.last_imp_fillup()
    assert _cache_empty(spark), "last_imp_fillup left persisted intermediates"


@pytest.mark.parametrize(
    "name",
    [
        "qc_neighbor_median",     # persists the daily rollup
        "fillup_rank_fill",       # persists the expanded grid
        "fillup_median_deep",     # grid + pairs + best_near + targets (+f1)
        "dedup_minhash_lsh",      # persists the shingle arrays
    ],
)
def test_registry_query_run_under_scope_leaves_cache_empty(spark, name):
    """A runner that opens a cache_scope around build+execute (bench.py,
    long-lived sessions) gets every scoped_persist back at scope exit."""
    from weatherdb_spark.plans.registry import EXTRA_REGISTRY, REGISTRY

    spec = {**REGISTRY, **EXTRA_REGISTRY}[name]
    spark.catalog.clearCache()
    with cache_scope():
        df = spec.spark_fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
    assert _cache_empty(spark), f"{name} left persisted intermediates"
