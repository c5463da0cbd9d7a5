"""SparkSession factory with the engine's required settings.

The reference forces every DB session to UTC
(weatherdb/db/connections.py:92-94); we do the same via
``spark.sql.session.timeZone``. AQE is enabled so skewed shuffle
partitions (e.g. one station with a dense record) re-plan at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def checkpoint_checksum_conf(master: str) -> dict[str, str]:
    """Streaming-checkpoint checksum setting for the given master.

    Spark 4.1's checkpoint file checksums await their background
    checksum-write futures inside the task thread; on some local
    filesystems those futures never complete and every stateful-stream
    task parks forever in ChecksumCheckpointFileManager.awaitResult.
    The checksums only guard against checkpoint corruption (a durability
    nicety), so LOCAL masters disable them for a hang-free default.

    Cluster masters keep Spark's default (enabled): checkpoints there
    live on real distributed storage where the hang has not been
    observed and corruption detection is worth keeping. Callers that
    hit the hang on a cluster can still override via ``extra_conf``.
    """
    if master.startswith("local"):
        return {"spark.sql.streaming.checkpoint.fileChecksum.enabled": "false"}
    return {}


def get_spark(
    app_name: str = "weatherdb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Defaults target local[N] testing; on a real cluster callers pass
    ``master=None`` with an external cluster manager and a larger
    ``shuffle_partitions`` (rule of thumb: 2-3x total cores, sized so a
    shuffle partition stays under ~200 MB at the target scale).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    # local-master-only workaround — see checkpoint_checksum_conf
    for k, v in checkpoint_checksum_conf(master).items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
