"""Structured-Streaming ingest — the Spark-native form of the reference's
incremental batch (SURVEY.md §2.10).

The reference re-downloads files whose FTP modtime changed
(``raw_files`` anti-join J11, StationBases.py:1183-1204) and tracks
per-stage ``last_imp_*`` watermarks. Spark's file-source streaming with
``Trigger.AvailableNow`` subsumes the file-level bookkeeping: the
checkpoint records which files were processed, each trigger drains only
new files, and the job exits when caught up — exactly the reference's
"import what changed, then stop" semantics without a hand-rolled manifest.

``stream_raw_files`` is the raw-ingest path; ``windowed_stream_agg`` shows
the watermarked-aggregation form for late data (not required for parity —
the reference handles revisions by file replay — but first-class for
pipelines that tail an event feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def stream_raw_files(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    sep: str = ";",
    transform=None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Incrementally ingest CSV drops from ``source_dir`` into a parquet
    table at ``target_dir``; the checkpoint makes re-runs process only new
    files (Trigger.AvailableNow). ``transform`` optionally maps the raw
    stream DataFrame (e.g. :func:`weatherdb_spark.sources.dwd.parse_dwd_date`
    projections) before the sink."""
    stream = (
        spark.readStream.schema(schema)
        .option("sep", sep)
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "true")
        .csv(source_dir)
    )
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_into_broker(
    spark: SparkSession,
    source_dir: str,
    broker,
    parameter: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    sep: str = ";",
    transform=None,
    run_stages: bool = False,
    await_termination: bool = True,
) -> StreamingQuery:
    """Tail CSV drops straight into the broker's incremental pipeline:
    each micro-batch lands via :meth:`Broker.append_raw` (keyed merge
    into the versioned fact table + ``last_imp`` window bookkeeping), so
    the reference's "download, import, re-run the stages" loop
    (cli.py update_db) becomes one continuously-runnable stream.

    Exactly-once note: ``foreachBatch`` may replay a batch after a
    failure, and that is SAFE here — the sink is a keyed
    (station_id, timestamp) merge (a replay upserts identical rows) and
    the pending ``last_imp`` window only ever widens, so a replayed
    batch cannot shrink the span the incremental stages will process.

    ``run_stages=True`` additionally runs the bounded incremental stages
    (last_imp_quality_check / fillup / corr) after each batch — the
    streaming twin of the reference's per-import stage chain. Leave it
    False to batch several drops per stage pass (cheaper: the widened
    window makes one stage pass cover them all).

    ``transform`` maps the raw stream to (station_id, timestamp, raw[,
    qn]) rows before the merge, e.g. the
    :func:`~weatherdb_spark.sources.dwd.ingest_p_raw` projection.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("sep", sep)
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "true")
        .csv(source_dir)
    )
    if transform is not None:
        stream = transform(stream)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        broker.append_raw(parameter, batch_df)
        if run_stages:
            broker.last_imp_quality_check()
            broker.last_imp_fillup()
            if parameter == "p":
                broker.last_imp_corr()

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def windowed_stream_agg(
    stream: DataFrame,
    window: str = "1 day",
    watermark: str = "2 hours",
    ts_col: str = "timestamp",
    value_col: str = "raw",
    group_cols: tuple[str, ...] = ("station_id",),
) -> DataFrame:
    """Watermarked windowed aggregation over a stream: per station and
    time window, sum + count of the value — the streaming twin of the A1
    resampling aggregation. Late rows beyond ``watermark`` drop; windows
    finalize once the watermark passes their end."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*group_cols, F.window(ts_col, window).alias("_w"))
        .agg(
            F.sum(value_col).alias(f"{value_col}_sum"),
            F.count(value_col).alias(f"{value_col}_count"),
        )
        .select(
            *group_cols,
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            f"{value_col}_sum",
            f"{value_col}_count",
        )
    )


def stream_dedup_exact(
    stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "event_ts",
    id_cols: tuple[str, ...] = ("content_hash",),
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    :func:`weatherdb_spark.llm.dedup.exact_dedup` for a document feed.

    ``dropDuplicatesWithinWatermark`` keys state on ``id_cols`` (e.g. an
    md5 of the document text computed upstream) and expires it once the
    event-time watermark passes — bounded state regardless of stream
    length, which an unbounded ``dropDuplicates`` on a stream is not.
    Duplicates arriving within the watermark window are dropped even
    when their event times differ (the point of the WithinWatermark
    variant); duplicates farther apart than the watermark are an
    at-least-once residue for the batch dedup to sweep.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
