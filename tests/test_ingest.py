"""S2/S3 ingest + streaming ingest tests on synthetic DWD-format fixtures
(format per reference utils/dwd.py:127-208, StationP.py:190-224)."""

from __future__ import annotations

import os
import textwrap

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from weatherdb_spark.sources.dwd import (
    ingest_p_raw,
    localize_p_timestamps,
    read_meta_txt,
    read_produkt_csv,
)

PRODUKT_HIST = textwrap.dedent("""\
    STATIONS_ID;MESS_DATUM;QN;RWS_DAU_10;RWS_10;RWS_IND_10;eor
      44;202401010000;3;10;0.10;1;eor
      44;202401010010;3;10;-999;1;eor
      44;202401010020;3;10;0.30;1;eor
      44;202401010023;3;10;####;1;eor
      44;202401010030;3;10;-0.10;1;eor
    """)

# overlapping "recent" file: first file (hist, alphabetically first) must win
PRODUKT_RECENT = textwrap.dedent("""\
    STATIONS_ID;MESS_DATUM;QN;RWS_DAU_10;RWS_10;RWS_IND_10;eor
      44;202401010020;1;10;9.90;1;eor
      44;202401010040;1;10;0.40;1;eor
    """)

PRODUKT_PRE2000 = textwrap.dedent("""\
    STATIONS_ID;MESS_DATUM;QN;RWS_DAU_10;RWS_10;RWS_IND_10;eor
      44;199906010100;3;10;1.00;1;eor
      44;199906010110;3;10;2.00;1;eor
    """)

META_TXT = (
    "Stations_id von_datum bis_datum Stationshoehe geoBreite geoLaenge Stationsname Bundesland\n"
    "----------- --------- --------- ------------- --------- --------- ----------- ----------\n"
    "00044 19690101 20240101            44     52.9336    8.2370 Großenkneten  Niedersachsen\n"
    "00071 20091201 20191231           759     48.2156    8.9784 Albstadt-Badkap  Baden-Württemberg\n"
)


@pytest.fixture()
def produkt_dir(tmp_path):
    d = tmp_path / "produkt"
    d.mkdir()
    (d / "a_hist.txt").write_text(PRODUKT_HIST)
    (d / "b_recent.txt").write_text(PRODUKT_RECENT)
    return str(d)


def test_read_produkt_csv_types_and_nas(spark, produkt_dir):
    df = read_produkt_csv(spark, produkt_dir)
    assert "eor" not in df.columns
    types = dict(df.dtypes)
    assert types["STATIONS_ID"] == "int"
    assert types["MESS_DATUM"] == "timestamp"
    assert types["RWS_10"] == "double"
    rows = {r["MESS_DATUM"].isoformat(): r["RWS_10"] for r in df.collect()}
    assert rows["2024-01-01T00:10:00"] is None  # -999 sentinel
    assert rows["2024-01-01T00:23:00"] is None  # #### sentinel
    assert rows["2024-01-01T00:00:00"] == 0.10


def test_ingest_p_raw_chain(spark, produkt_dir):
    df = read_produkt_csv(spark, produkt_dir)
    out = ingest_p_raw(df).orderBy("timestamp").collect()
    tss = [r["timestamp"].isoformat() for r in out]
    # off-grid :23 row dropped (F5)
    assert "2024-01-01T00:23:00" not in tss
    by_ts = {r["timestamp"].isoformat(): r for r in out}
    # duplicate 00:20 resolved to first file (hist, 0.30) not recent 9.90 (F7)
    assert by_ts["2024-01-01T00:20:00"]["raw"] == 0.30
    # negative scrubbed (F6)
    assert by_ts["2024-01-01T00:30:00"]["raw"] is None
    # non-overlapping recent row survives
    assert by_ts["2024-01-01T00:40:00"]["raw"] == 0.40


def test_localize_p_timestamps(spark, tmp_path, produkt_dir):
    d = tmp_path / "pre2000"
    d.mkdir()
    (d / "old.txt").write_text(PRODUKT_PRE2000)
    old = localize_p_timestamps(read_produkt_csv(spark, str(d)))
    rows = sorted(r["MESS_DATUM"].isoformat() for r in old.collect())
    # MEZ (UTC+1) shifted back one hour
    assert rows == ["1999-06-01T00:00:00", "1999-06-01T00:10:00"]
    assert not any(r["_tz_error"] for r in old.collect())
    new = localize_p_timestamps(read_produkt_csv(spark, produkt_dir))
    assert {r["MESS_DATUM"].minute for r in new.collect()} == {0, 10, 20, 23, 30, 40}


def test_read_meta_txt(spark, tmp_path):
    p = tmp_path / "P_Beschreibung_Stationen.txt"
    p.write_bytes(META_TXT.encode("WINDOWS-1252"))
    meta = read_meta_txt(spark, str(p))
    rows = {r["stations_id"]: r for r in meta.collect()}
    assert set(rows) == {44, 71}
    assert rows[44]["stationsname"] == "Großenkneten"
    assert rows[71]["bundesland"] == "Baden-Württemberg"
    assert rows[71]["stationshoehe"] == 759
    assert rows[44]["von_datum"].year == 1969


def test_stream_raw_files_incremental(spark, tmp_path):
    from weatherdb_spark.streaming.ingest import stream_raw_files

    src = tmp_path / "drops"
    src.mkdir()
    tgt = str(tmp_path / "ts_raw")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType([
        T.StructField("STATIONS_ID", T.IntegerType()),
        T.StructField("MESS_DATUM", T.StringType()),
        T.StructField("RWS_10", T.DoubleType()),
    ])

    def transform(s):
        from weatherdb_spark.sources.dwd import parse_dwd_date
        return s.select(
            F.col("STATIONS_ID").alias("station_id"),
            parse_dwd_date("MESS_DATUM").alias("timestamp"),
            F.col("RWS_10").alias("raw"),
        )

    (src / "f1.csv").write_text(
        "STATIONS_ID;MESS_DATUM;RWS_10\n44;202401010000;0.1\n44;202401010010;0.2\n"
    )
    stream_raw_files(spark, str(src), tgt, ckpt, schema, transform=transform)
    assert spark.read.parquet(tgt).count() == 2

    # second drop: only the new file is processed (checkpoint bookkeeping)
    (src / "f2.csv").write_text(
        "STATIONS_ID;MESS_DATUM;RWS_10\n44;202401010020;0.3\n"
    )
    stream_raw_files(spark, str(src), tgt, ckpt, schema, transform=transform)
    got = spark.read.parquet(tgt)
    assert got.count() == 3
    assert got.filter(F.col("raw") == 0.3).count() == 1


def test_windowed_stream_agg_plan(spark):
    """The watermarked agg must be usable on a streaming source (checked
    via isStreaming + schema, executed with a memory sink)."""
    from weatherdb_spark.streaming.ingest import windowed_stream_agg

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "10").load()
        .select(
            (F.col("value") % 3).alias("station_id"),
            F.col("timestamp"),
            (F.col("value") * 1.0).alias("raw"),
        )
    )
    agg = windowed_stream_agg(stream, window="10 seconds", watermark="5 seconds")
    assert agg.isStreaming
    assert set(agg.columns) == {
        "station_id", "window_start", "window_end", "raw_sum", "raw_count"
    }
    q = agg.writeStream.format("memory").queryName("agg_test").outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stateful_consec_run_flags_across_batches(spark, tmp_path):
    """applyInPandasWithState QC: a 3-run of equal values split across two
    micro-batches is still flagged (state carries the open run), the qn
    gate applies to the run head, and sub-threshold runs stay clean."""
    import pandas as pd

    from weatherdb_spark.streaming.stateful import consec_run_flags

    src = tmp_path / "stream_src"
    src.mkdir()
    # file 1 (batch 1): head + 1 member of the run; file 2 (batch 2):
    # completes the run and extends it once. station 2: qn=3 head -> clean;
    # station 3: equal zeros (below consec_min) -> clean
    pd.DataFrame({
        "station_id": [1, 1, 2, 2, 3, 3],
        "timestamp": ["2024-01-01 00:00:00", "2024-01-01 00:10:00"] * 3,
        "raw": [0.5, 0.5, 0.7, 0.7, 0.0, 0.0],
        "qn": [1, 1, 3, 3, 1, 1],
    }).to_csv(src / "a_part1.csv", index=False)
    pd.DataFrame({
        "station_id": [1, 1, 2, 3],
        "timestamp": ["2024-01-01 00:20:00", "2024-01-01 00:30:00",
                      "2024-01-01 00:20:00", "2024-01-01 00:20:00"],
        "raw": [0.5, 0.5, 0.7, 0.0],
        "qn": [1, 1, 3, 1],
    }).to_csv(src / "b_part2.csv", index=False)

    stream = (
        spark.readStream.schema(
            "station_id int, timestamp timestamp, raw double, qn int"
        )
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .csv(str(src))
    )
    q = (
        consec_run_flags(stream)
        .writeStream.format("memory")
        .queryName("consec_flags")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM consec_flags").collect()
    got = {(r["station_id"], r["timestamp"].strftime("%H:%M")) for r in rows}
    # station 1: all four members flagged (first three retroactively when
    # the run closed in batch 2, the fourth on arrival)
    assert got == {(1, "00:00"), (1, "00:10"), (1, "00:20"), (1, "00:30")}


def test_windowed_stream_agg_late_data_semantics(spark, tmp_path):
    """Value-level watermark semantics over two AvailableNow runs: batch 1
    closes the 10:00 window once the watermark (max event time - 1h)
    passes its end; a batch-2 row landing back inside that closed window
    is late beyond the watermark and must NOT re-emit or grow the window,
    while an on-time batch-2 row finalizes the next window."""
    import datetime as dt
    import glob

    from pyspark.sql import types as T

    from weatherdb_spark.streaming.ingest import windowed_stream_agg

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType([
        T.StructField("station_id", T.IntegerType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("raw", T.DoubleType()),
    ])

    def run_batch(name, rows):
        (src / name).write_text(
            "station_id;timestamp;raw\n"
            + "\n".join(f"{s};{t};{v}" for s, t, v in rows)
        )
        stream = (
            spark.readStream.schema(schema).option("sep", ";")
            .option("header", "true").csv(str(src))
        )
        agg = windowed_stream_agg(
            stream, window="1 hour", watermark="1 hour"
        )
        q = (
            agg.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).outputMode("append").start()
        )
        q.awaitTermination()

    # batch 1: two rows in the 10:00 window, one at 13:00 -> watermark
    # reaches 12:00, the 10:00-11:00 window finalizes with sum=3
    run_batch("b1.csv", [
        (1, "2024-01-01 10:05:00", 1.0),
        (1, "2024-01-01 10:45:00", 2.0),
        (1, "2024-01-01 13:00:00", 10.0),
    ])
    first = {
        (r.window_start, r.raw_sum)
        for r in spark.read.parquet(out).collect()
    }
    assert (dt.datetime(2024, 1, 1, 10, 0), 3.0) in first
    # the 13:00 window is still open (watermark 12:00 < its end)
    assert not any(ws == dt.datetime(2024, 1, 1, 13, 0) for ws, _ in first)

    # batch 2: a late row back in the closed 10:00 window (beyond the
    # watermark -> dropped) and a 15:00 row that pushes the watermark to
    # 14:00, finalizing the 13:00 window WITHOUT the late row's value
    run_batch("b2.csv", [
        (1, "2024-01-01 10:50:00", 100.0),
        (1, "2024-01-01 15:00:00", 20.0),
    ])
    rows = spark.read.parquet(out).collect()
    sums = {}
    for r in rows:
        sums.setdefault(r.window_start, []).append(r.raw_sum)
    # closed window unchanged: still exactly one emission with sum=3
    assert sums[dt.datetime(2024, 1, 1, 10, 0)] == [3.0]
    # 13:00 window finalized from batch-1 data only
    assert sums[dt.datetime(2024, 1, 1, 13, 0)] == [10.0]


def test_f7_dedup_one_winner_when_basenames_collide(spark):
    """Two distinct source files sharing a basename (e.g. a dir plus a
    staging copy) must still yield exactly ONE row per (station, ts):
    the dedup key is (file name, full path), name first so zip-staging
    paths don't decide the winner, path as the deterministic tie-break."""
    import datetime as dt

    from weatherdb_spark.sources.dwd import ingest_p_raw

    rows = [
        (3, dt.datetime(2024, 1, 1, 0, 0), 1.5, 1, "/a/produkt_rr_003.txt"),
        (3, dt.datetime(2024, 1, 1, 0, 0), 9.9, 1, "/b/produkt_rr_003.txt"),
        # control: differing basenames keep the smaller NAME even when
        # its full path sorts larger
        (4, dt.datetime(2024, 1, 1, 0, 0), 2.5, 1, "/z/produkt_aa_004.txt"),
        (4, dt.datetime(2024, 1, 1, 0, 0), 8.8, 1, "/a/produkt_zz_004.txt"),
    ]
    df = spark.createDataFrame(
        rows,
        "STATIONS_ID int, MESS_DATUM timestamp, RWS_10 double, QN int, _src_file string",
    )
    out = {r.station_id: r.raw for r in ingest_p_raw(df).collect()}
    assert out == {3: 1.5, 4: 2.5}
    assert ingest_p_raw(df).count() == 2


def test_stream_into_broker_two_drops(spark, tmp_path):
    """foreachBatch -> Broker.append_raw bridge: two CSV drops processed
    as separate availableNow runs merge into the versioned fact table and
    the pending last_imp window widens across both (neither drop is
    orphaned when the stages run later). A full replay of the stream
    (fresh checkpoint) must be idempotent — the sink is a keyed merge."""
    import datetime as dt

    import pandas as pd

    from weatherdb_spark.broker import Broker
    from weatherdb_spark.streaming.ingest import stream_into_broker

    b = Broker(spark, str(tmp_path / "wh"))
    src = tmp_path / "drops"
    src.mkdir()
    day0 = dt.datetime(2024, 1, 1)
    for part, d0 in ((0, 0), (1, 4)):
        pd.DataFrame({
            "station_id": [1] * 4,
            "timestamp": [day0 + dt.timedelta(days=d0 + k) for k in range(4)],
            "raw": [20.0 + d0 + k for k in range(4)],
        }).to_csv(src / f"drop_{part}.csv", index=False, sep=";")

    def run(ckpt):
        stream_into_broker(
            spark, str(src), b, "t", str(tmp_path / ckpt),
            schema="station_id int, timestamp timestamp, raw double",
        )

    # two sequential availableNow runs over a shared checkpoint: run 1
    # sees only drop_0, run 2 drains drop_1 — the two-batch append path
    (src / "drop_1.csv").rename(tmp_path / "stash.csv")
    run("ckpt")
    (tmp_path / "stash.csv").rename(src / "drop_1.csv")
    run("ckpt")

    got = b.read("ts_t")
    vals = {r["raw"] for r in got.filter(F.col("raw").isNotNull()).collect()}
    assert vals == {20.0 + i for i in range(8)}
    assert b.last_imp("t") == ("2024-01-01 00:00:00", "2024-01-08 00:00:00")

    # full replay with a fresh checkpoint: keyed merge -> same state
    run("ckpt2")
    assert b.read("ts_t").count() == got.count()
    assert b.last_imp("t") == ("2024-01-01 00:00:00", "2024-01-08 00:00:00")


def test_stream_dedup_exact_drops_within_watermark(spark, tmp_path):
    """Same content hash arriving twice inside the watermark window (even
    with different event times) emits once; distinct hashes all pass."""
    import pandas as pd

    from weatherdb_spark.streaming.ingest import stream_dedup_exact

    src = tmp_path / "feed"
    src.mkdir()
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "content_hash": ["aaa", "aaa", "bbb", "ccc"],
        "event_ts": ["2024-01-01 10:00:00", "2024-01-01 10:20:00",
                     "2024-01-01 10:05:00", "2024-01-01 10:06:00"],
    }).to_csv(src / "a.csv", index=False)
    stream = (
        spark.readStream.schema(
            "doc_id long, content_hash string, event_ts timestamp"
        ).option("header", "true").csv(str(src))
    )
    q = (
        stream_dedup_exact(stream)
        .writeStream.format("memory").queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT content_hash FROM dedup_stream").collect()
    hashes = sorted(r["content_hash"] for r in rows)
    assert hashes == ["aaa", "bbb", "ccc"]


def test_row_minhash_signature_matches_batch(spark):
    """The stateless per-row signature is bit-identical to the batch
    explode+agg signature — the property the streaming near-dup
    operator's equivalence rests on."""
    from weatherdb_spark.llm.dedup import minhash_signatures
    from weatherdb_spark.streaming.neardup import row_minhash_signature

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat today"),
         (3, "completely different words in this document body here")],
        "doc_id long, text string",
    )
    batch = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures(docs, num_perm=16).collect()
    }
    stream_style = {
        r["doc_id"]: list(r["sig"])
        for r in docs.select(
            "doc_id",
            row_minhash_signature(F.col("text"), num_perm=16).alias("sig"),
        ).collect()
    }
    assert batch == stream_style


def test_stream_neardup_pairs_across_batches(spark, tmp_path):
    """A near-dup arriving in a LATER micro-batch than its twin still
    pairs (bucket state crosses batch boundaries); distinct docs never
    pair; the pair agrees with the batch signature estimate."""
    import pandas as pd

    from weatherdb_spark.streaming.neardup import stream_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog near the river"
    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame({
        "doc_id": [1],
        "text": [base],
        "event_ts": ["2024-01-01 10:00:00"],
    }).to_csv(src / "a.csv", index=False)
    pd.DataFrame({
        "doc_id": [2, 3],
        "text": [base,  # exact twin -> est_jaccard 1.0
                 "totally unrelated content about weather stations data"],
        "event_ts": ["2024-01-01 10:05:00", "2024-01-01 10:06:00"],
    }).to_csv(src / "b.csv", index=False)
    # the file source orders batches by modification time; both files
    # land within the same clock tick, so pin distinct mtimes or the
    # "twin arrives later" premise flips at random
    os.utime(src / "a.csv", (1_700_000_000, 1_700_000_000))
    os.utime(src / "b.csv", (1_700_000_100, 1_700_000_100))
    stream = (
        spark.readStream.schema("doc_id long, text string, event_ts timestamp")
        .option("header", "true").option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        stream_neardup_pairs(stream, threshold=0.8, num_perm=16, bands=4)
        .writeStream.format("memory").queryName("neardup_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination()
    pairs = (
        spark.sql("SELECT * FROM neardup_stream")
        .dropDuplicates(["id_a", "id_b"])
        .collect()
    )
    assert [(r["id_a"], r["id_b"], r["est_jaccard"]) for r in pairs] == [
        (1, 2, 1.0)
    ]


def test_stream_neardup_bucket_cap_bounds_state(spark, tmp_path):
    """max_bucket_docs=1: only the first arrival becomes a bucket
    resident, later docs still pair against it on arrival (1-2, 1-3)
    but never against each other (2-3) — state stays O(cap)."""
    import pandas as pd

    from weatherdb_spark.streaming.neardup import stream_neardup_pairs

    text = "the quick brown fox jumps over the lazy dog near the river"
    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [text, text, text],
        "event_ts": ["2024-01-01 10:00:00", "2024-01-01 10:01:00",
                     "2024-01-01 10:02:00"],
    }).to_csv(src / "a.csv", index=False)
    stream = (
        spark.readStream.schema("doc_id long, text string, event_ts timestamp")
        .option("header", "true").csv(str(src))
    )
    q = (
        stream_neardup_pairs(
            stream, threshold=0.8, num_perm=16, bands=4, max_bucket_docs=1
        )
        .writeStream.format("memory").queryName("neardup_cap")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination()
    pairs = {
        (r["id_a"], r["id_b"])
        for r in spark.sql("SELECT id_a, id_b FROM neardup_cap").collect()
    }
    assert pairs == {(1, 2), (1, 3)}


def test_stream_embedding_neardup_across_batches(spark, tmp_path):
    """Exact-cosine verify against bucket residents across micro-batch
    boundaries; orthogonal vectors never pair; bucket keys reuse the
    batch hyperplanes so the batch LSH would bucket them identically."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weatherdb_spark.streaming.neardup import stream_embedding_neardup

    dim = 8
    v1 = [1.0, 0.2, -0.3, 0.5, 0.0, 0.7, -0.1, 0.4]
    v2 = [x * 2.0 for x in v1]          # cos = 1.0 with v1
    v3 = [-x for x in v1]               # cos = -1.0, never pairs
    src = tmp_path / "vecs"
    src.mkdir()
    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float64())),
        ("event_ts", pa.timestamp("us")),
    ])
    t0 = np.datetime64("2024-01-01T10:00:00", "us")

    def write(path, rows):
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)

    write(src / "a.parquet", [
        {"vec_id": 1, "embedding": v1, "event_ts": t0.item()},
    ])
    write(src / "b.parquet", [
        {"vec_id": 2, "embedding": v2,
         "event_ts": (t0 + np.timedelta64(60, "s")).item()},
        {"vec_id": 3, "embedding": v3,
         "event_ts": (t0 + np.timedelta64(90, "s")).item()},
    ])
    # pin distinct mtimes: the file source orders batches by mtime, and
    # same-tick files flip the "v1 is the bucket resident" premise
    os.utime(src / "a.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(src / "b.parquet", (1_700_000_100, 1_700_000_100))
    stream = (
        spark.readStream.schema(
            "vec_id long, embedding array<double>, event_ts timestamp"
        ).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = (
        stream_embedding_neardup(
            stream, threshold=0.4, planes=2, dim=dim, n_tables=4
        )
        .writeStream.format("memory").queryName("emb_neardup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination()
    pairs = (
        spark.sql("SELECT * FROM emb_neardup")
        .dropDuplicates(["id_a", "id_b"])
        .collect()
    )
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert abs(pairs[0]["cos"] - 1.0) < 1e-9


def test_row_simhash_fingerprint_matches_batch(spark):
    """The stateless per-row SimHash is bit-identical to the batch
    explode+agg fingerprint — the equivalence the streaming SimHash
    near-dup rests on (same tokens, hash, weighting, sign rule)."""
    from weatherdb_spark.llm.dedup import simhash
    from weatherdb_spark.streaming.neardup import row_simhash_fingerprint

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat today"),
         (3, "completely different words in this document body here"),
         (4, "repeated repeated repeated words weight the bit sums")],
        "doc_id long, text string",
    )
    batch = {r["doc_id"]: r["simhash"]
             for r in simhash(docs, bits=32).collect()}
    streamed = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", row_simhash_fingerprint(F.col("text"), 32).alias("fp")
        ).collect()
    }
    assert batch == streamed


def test_stream_simhash_neardup_across_batches(spark, tmp_path):
    """A near-identical doc arriving in a LATER micro-batch pairs with
    its earlier twin (pigeonhole block state crosses batches); unrelated
    docs never pair; the emitted hamming distance is exact (0 for an
    exact twin) and agrees with the batch pair join."""
    import pandas as pd

    from weatherdb_spark.llm.dedup import simhash_pairs_exact
    from weatherdb_spark.streaming.neardup import stream_simhash_neardup

    base = "the quick brown fox jumps over the lazy dog near the river"
    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame({
        "doc_id": [1],
        "text": [base],
        "event_ts": ["2024-01-01 10:00:00"],
    }).to_csv(src / "a.csv", index=False)
    pd.DataFrame({
        "doc_id": [2, 3],
        "text": [base,
                 "totally unrelated content about weather stations data"],
        "event_ts": ["2024-01-01 10:05:00", "2024-01-01 10:06:00"],
    }).to_csv(src / "b.csv", index=False)
    os.utime(src / "a.csv", (1_700_000_000, 1_700_000_000))
    os.utime(src / "b.csv", (1_700_000_100, 1_700_000_100))
    stream = (
        spark.readStream.schema("doc_id long, text string, event_ts timestamp")
        .option("header", "true").option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        stream_simhash_neardup(stream, max_hamming=6, bits=32)
        .writeStream.format("memory").queryName("simhash_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination()
    pairs = (
        spark.sql("SELECT * FROM simhash_stream")
        .dropDuplicates(["id_a", "id_b"])
        .collect()
    )
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [
        (1, 2, 0)
    ]
    # the batch join over the same corpus finds the same (only) pair
    docs = spark.createDataFrame(
        [(1, base), (2, base),
         (3, "totally unrelated content about weather stations data")],
        "doc_id long, text string",
    )
    batch_pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs_exact(docs, max_hamming=6, bits=32).collect()
    }
    assert batch_pairs == {(1, 2)}


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    """Decontamination at ingest: documents arriving across micro-batches
    flag against a STATIC eval-set reference, emitting exactly the pairs
    the batch minhash_contamination finds on the same corpus — stateless
    (no watermark, no state store), so a replay from source offsets is
    idempotent."""
    import os

    import pandas as pd

    from weatherdb_spark.llm.dedup import minhash_contamination
    from weatherdb_spark.streaming.neardup import stream_decontaminate

    eval_text = "the quick brown fox jumps over the lazy dog near the river"
    other = "totally unrelated content about weather stations data rows"
    reference = spark.createDataFrame(
        [(100, eval_text), (101, other)], "doc_id long, text string"
    )

    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame({
        "doc_id": [1, 2],
        "text": [eval_text, "completely different words entirely here okay"],
    }).to_csv(src / "a.csv", index=False)
    pd.DataFrame({
        "doc_id": [3],
        "text": [eval_text + " extra"],  # near-dup of ref 100
    }).to_csv(src / "b.csv", index=False)
    os.utime(src / "a.csv", (1_700_000_000, 1_700_000_000))
    os.utime(src / "b.csv", (1_700_000_100, 1_700_000_100))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("header", "true").option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        stream_decontaminate(stream, reference, threshold=0.8, num_perm=16,
                             bands=4)
        .writeStream.format("memory").queryName("decon_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.ref_id, r.jaccard)
        for r in spark.sql("SELECT * FROM decon_stream").collect()
    }

    corpus = spark.createDataFrame(
        [(1, eval_text),
         (2, "completely different words entirely here okay"),
         (3, eval_text + " extra")],
        "doc_id long, text string",
    )
    want = {
        (r.doc_id, r.ref_id, r.jaccard)
        for r in minhash_contamination(
            corpus, reference, threshold=0.8, num_perm=16, bands=4
        ).collect()
    }
    assert got == want
    assert (1, 100, 1.0) in got          # exact copy flagged
    assert any(d == 3 for d, _, _ in got)  # near-dup flagged
    assert not any(d == 2 for d, _, _ in got)


def test_text_shaping_chain_is_stream_stateless(spark, tmp_path):
    """The text-shaping family (PII scrub -> quality score -> context
    chunking) is pure projection + bounded explode, so the SAME
    functions run unchanged on a readStream and emit exactly the batch
    rows — no watermark, no state store, idempotent replay. This is the
    ingest-time shape of a 100 TB training pipeline: shaping rides the
    stream; only dedup needs state."""
    import os

    import pandas as pd

    from weatherdb_spark.llm.packing import chunk_windows
    from weatherdb_spark.llm.text import quality_score, scrub_pii

    rows = {
        "doc_id": [1, 2, 3],
        "text": [
            "the quick brown fox mail me at fox@den.example now",
            " ".join(f"w{i}" for i in range(11)),
            "tiny doc",
        ],
    }
    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame({k: v[:2] for k, v in rows.items()}).to_csv(
        src / "a.csv", index=False)
    pd.DataFrame({k: v[2:] for k, v in rows.items()}).to_csv(
        src / "b.csv", index=False)
    os.utime(src / "a.csv", (1_700_000_000, 1_700_000_000))
    os.utime(src / "b.csv", (1_700_000_100, 1_700_000_100))

    def shape(df):
        scrubbed = scrub_pii(df).drop("text").withColumnRenamed(
            "text_scrubbed", "text")
        return chunk_windows(quality_score(scrubbed), window=4, stride=3)

    batch_df = spark.read.schema("doc_id long, text string").option(
        "header", "true").csv(str(src))
    expected = sorted(map(tuple, shape(batch_df).collect()))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("header", "true").option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        shape(stream)
        .writeStream.format("memory").queryName("shape_stream")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = sorted(map(tuple, spark.sql(
            "SELECT * FROM shape_stream").collect()))
    finally:
        q.stop()
    assert got == expected and len(got) > 0
    # the scrub really happened inside the stream
    assert not any("fox@den.example" in t[-1] for t in got)
    assert any("<EMAIL>" in t[-1] for t in got)


def test_stream_ngram_decontaminate_matches_batch(spark, tmp_path):
    """The n-gram decontamination stream (stateless collision events)
    folds to exactly the batch operator's (doc_id, n_collisions) rows,
    across micro-batch boundaries."""
    import os

    import pandas as pd

    from weatherdb_spark.llm.dedup import ngram_contamination
    from weatherdb_spark.streaming.neardup import (
        count_collision_events,
        stream_ngram_decontaminate,
    )

    eval_text = " ".join(f"e{i}" for i in range(20))
    rows = {
        "doc_id": [1, 2, 3],
        "text": [
            "prefix words here " + " ".join(f"e{i}" for i in range(13)),
            "no overlap " + " ".join(f"u{i}" for i in range(15)),
            eval_text,
        ],
    }
    reference = spark.createDataFrame(
        [(100, eval_text)], "doc_id long, text string"
    )
    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame({k: v[:2] for k, v in rows.items()}).to_csv(
        src / "a.csv", index=False)
    pd.DataFrame({k: v[2:] for k, v in rows.items()}).to_csv(
        src / "b.csv", index=False)
    os.utime(src / "a.csv", (1_700_000_000, 1_700_000_000))
    os.utime(src / "b.csv", (1_700_000_100, 1_700_000_100))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("header", "true").option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        stream_ngram_decontaminate(stream, reference, n=13)
        .writeStream.format("memory").queryName("ngram_decon")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        events = spark.sql("SELECT * FROM ngram_decon")
        folded = {(r.doc_id, r.n_collisions)
                  for r in count_collision_events(events).collect()}
    finally:
        q.stop()
    batch_docs = spark.createDataFrame(
        list(zip(rows["doc_id"], rows["text"])), "doc_id long, text string"
    )
    expect = {(r.doc_id, r.n_collisions)
              for r in ngram_contamination(batch_docs, reference, n=13).collect()}
    assert folded == expect
    assert {d for d, _ in folded} == {1, 3}  # quote + copy, not doc 2


def test_stream_image_neardup_across_batches(spark, tmp_path):
    """The multimodal member of the streaming dedup family: a
    re-encoded image (same gradients, shifted byte values) arriving in
    a LATER micro-batch pairs with its earlier twin by dHash; an
    inverted-gradient image never pairs; NULL payloads are dropped.
    The per-row fingerprints are the batch dhash_images values exactly
    (one shared dhash_bytes definition), incl. NEGATIVE 64-bit hashes
    — the sign-safe block keys are what make that work."""
    from weatherdb_spark.llm.multimodal import (
        dhash_bytes,
        image_neardup_pairs,
    )
    from weatherdb_spark.streaming.neardup import stream_image_neardup

    base = bytes(range(72))                       # rising gradient
    reenc = bytes(v + 100 for v in range(72))     # same comparisons
    other = bytes(reversed(range(72)))            # inverted gradient
    assert dhash_bytes(base) < 0                  # all-ones: negative
    import glob
    import shutil

    src = tmp_path / "imgs"
    src.mkdir()
    # the file stream source does not recurse: stage each micro-batch's
    # parquet and move its single part file into the watched dir with
    # ordered mtimes (the csv twin of the simhash test can't carry
    # binary columns)
    batches = [
        [(1, bytearray(base), "2024-01-01 10:00:00")],
        [(2, bytearray(reenc), "2024-01-01 10:05:00"),
         (3, bytearray(other), "2024-01-01 10:06:00"),
         (4, None, "2024-01-01 10:07:00")],
    ]
    for i, rows in enumerate(batches):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(
            rows, "doc_id long, payload binary, event_ts string",
        ).coalesce(1).write.parquet(str(stage))
        [part] = glob.glob(str(stage / "part-*.parquet"))
        dst = src / f"{chr(97 + i)}.parquet"
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)
    stream = (
        spark.readStream
        .schema("doc_id long, payload binary, event_ts string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    )
    q = (
        stream_image_neardup(stream, max_hamming=6)
        .writeStream.format("memory").queryName("image_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination()
    pairs = (
        spark.sql("SELECT * FROM image_stream")
        .dropDuplicates(["id_a", "id_b"])
        .collect()
    )
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [
        (1, 2, 0)
    ]
    # the batch join over the same corpus finds the same (only) pair
    docs = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(reenc)),
         (3, bytearray(other))],
        "doc_id long, payload binary",
    )
    assert {(r["id_a"], r["id_b"]) for r in
            image_neardup_pairs(docs, max_hamming=6).collect()} == {(1, 2)}
