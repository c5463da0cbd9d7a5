"""Regression tests for the round-7 ADVICE findings: BM25 dropped-term
reporting, chunk_windows under legacy sizeOfNull semantics,
ngram_contamination cache hygiene outside a scope, the partition-append
legacy-migration overlap guard, and read-only DataFixMigration state
predicates."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker, DataFixMigration


def test_bm25_dropped_terms_reports_gated_terms(spark):
    """The companion report names exactly the terms the gate removes —
    and with every gated term removed, the gated top-k equals the
    ungated one on the remaining terms."""
    from weatherdb_spark.llm.search import bm25_dropped_terms, bm25_topk

    docs = spark.createDataFrame(
        [(i, f"the common filler doc{i} " + ("rare" if i == 3 else "word"))
         for i in range(10)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "the rare")], "query_id long, query string"
    )
    dropped = bm25_dropped_terms(docs, queries, max_df_share=0.5)
    rows = {r.word for r in dropped.collect()}
    assert rows == {"the"}  # present in 10/10 docs; 'rare' in 1/10
    # parity: the report and the gate share the df definition, so
    # scoring only the kept term gives identical ranked ids
    gated = bm25_topk(docs, queries, k=3, max_df_share=0.5)
    assert [r.doc_id for r in gated.orderBy("rank").collect()] == [3]


def test_bm25_all_terms_gated_empty_report_nonempty(spark):
    from weatherdb_spark.llm.search import bm25_dropped_terms, bm25_topk

    docs = spark.createDataFrame(
        [(i, "the same text") for i in range(4)], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(1, "the same")], "query_id long, query string"
    )
    assert bm25_topk(docs, queries, max_df_share=0.5).count() == 0
    assert bm25_dropped_terms(docs, queries, 0.5).count() == 2


def test_chunk_windows_null_text_under_legacy_size_of_null(spark):
    """size(NULL) = -1 under the legacy flag; the NULL-text filter must
    key on the token ARRAY's nullness, not the size column."""
    from weatherdb_spark.llm.packing import chunk_windows

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, None)], "doc_id long, text string"
    )
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try:
        out = chunk_windows(docs, window=3, stride=2).collect()
    finally:
        spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    assert {r.doc_id for r in out} == {1}
    assert all(r.n_chunk_tokens > 0 for r in out)


def test_ngram_contamination_no_scope_leaves_no_cached_blocks(spark):
    """Calling the public operator WITHOUT a cache_scope must not
    accumulate persisted reference sets (the dead-block leak)."""
    from weatherdb_spark.llm.dedup import ngram_contamination

    base = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n")], "doc_id long, text string"
    )
    ref = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n")], "doc_id long, text string"
    )
    flagged = ngram_contamination(corpus, ref, n=13)
    assert flagged.count() == 1
    ids = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert ids - base == set()


def test_ngram_contamination_scope_still_reuses_persist(spark):
    from weatherdb_spark.functions.caching import cache_scope
    from weatherdb_spark.llm.dedup import ngram_contamination

    base = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n")], "doc_id long, text string"
    )
    ref = corpus
    with cache_scope():
        flagged = ngram_contamination(corpus, ref, n=13)
        assert flagged.count() == 1
        inside = set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
        assert inside - base  # the scope's persist was actually taken
    ids = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert ids - base == set()  # ... and released on exit


def test_partition_append_legacy_value_clash_raises(spark, tmp_path):
    """A legacy flat snapshot whose part_col values include the new
    leaf's value must fail loudly, not silently merge."""
    b = Broker(spark, str(tmp_path / "wh"))
    legacy = spark.createDataFrame(
        [(1, "x", 7)], "id long, payload string, epoch int"
    )
    b.write("dimtab", legacy)
    batch = spark.createDataFrame([(2, "y")], "id long, payload string")
    with pytest.raises(ValueError, match="legacy snapshot"):
        b.write_partition_append("dimtab", batch, "epoch", 7)
    # a non-clashing value migrates fine and keeps both value sets
    b.write_partition_append("dimtab", batch, "epoch", 8)
    got = {(r.id, r.epoch) for r in b.read("dimtab").collect()}
    assert got == {(1, 7), (2, 8)}


def test_datafix_state_predicates_do_not_write(spark, tmp_path):
    """incomplete()/partially_applied() on a warehouse carrying the
    legacy record must leave the warehouse byte-identical (no
    conversion writes, no settings mutation) while still reporting the
    recorded tables as done."""
    b = Broker(spark, str(tmp_path / "wh"))
    b.write("meta_x", spark.createDataFrame([(1, 2.0)], "station_id int, v double"))
    fix = DataFixMigration(
        99, "test", {"meta_x": (lambda df: df, lambda df: df)}
    )
    b.set_setting(fix._setting_key, json.dumps(["meta_x"]))
    ver_before = b.table_version("meta_x")

    def _tree(root):
        out = []
        for r, _d, files in os.walk(root):
            for f in files:
                p = os.path.join(r, f)
                out.append((os.path.relpath(p, root), os.path.getmtime(p),
                            os.path.getsize(p)))
        return sorted(out)

    snap = _tree(str(tmp_path / "wh"))
    assert fix.incomplete(b) is False        # record covers the table
    assert fix.partially_applied(b) is True  # ... and marks it applied
    assert _tree(str(tmp_path / "wh")) == snap  # NOTHING written
    assert b.table_version("meta_x") == ver_before
    assert b.get_setting(fix._setting_key) is not None  # record intact
    # the WALK still converts: record -> sentinel, key retired
    fix._upgrade(b)
    assert b.get_setting(fix._setting_key) is None
    assert fix.incomplete(b) is False


def test_partest_parses_workers_flag():
    import sys

    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools)
    try:
        from partest import parse_workers
    finally:
        sys.path.pop(0)
    assert parse_workers(["partest.py"]) == 4
    assert parse_workers(["partest.py", "6"]) == 6
    assert parse_workers(["partest.py", "--workers", "6"]) == 6
    assert parse_workers(["partest.py", "--workers=5"]) == 5
    assert parse_workers(["partest.py", "-w", "3"]) == 3
