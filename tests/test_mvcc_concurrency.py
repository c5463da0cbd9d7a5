"""Concurrent-reader integration stress for the two MVCC warehouses
(r8 verdict ask #7): slow scans/probes run WHILE an append and a
compaction rewrite the corpus and the IVF index underneath them. Every
read must land on one consistent snapshot — the pre-write state or the
post-write state, never a mix or a torn file listing. The per-table
crash windows are pinned elsewhere (test_broker_versioning,
test_llm_similarity, test_corpus_store); this is the live-concurrency
complement, in its own FILE so partest gives it its own session."""

from __future__ import annotations

import threading
import time

from pyspark.sql import functions as F


def _slow(df, seconds: float = 0.3):
    """Stretch a scan so snapshot flips happen while it is mid-read."""
    def gen(batches):
        for pdf in batches:
            time.sleep(seconds)
            yield pdf

    return df.mapInPandas(gen, df.schema)


def test_corpus_reads_consistent_under_append_and_compaction(
        spark, tmp_path):
    from weatherdb_spark.llm.corpus import CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, text string")
    # a few epochs so compact_epochs has something to fold
    for e in range(4):
        store.append(mk([
            (e * 100 + i, f"epoch {e} doc {i} " + " ".join(
                f"w{e}x{i}y{j}" for j in range(8)))
            for i in range(40)
        ]))
    n_before = store.read().count()
    assert n_before == 160

    counts: list[int] = []
    errors: list[Exception] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                counts.append(_slow(store.read()).count())
            except Exception as exc:  # noqa: BLE001 — the failure mode
                errors.append(exc)
                return

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        # writer: one admitting append, then fold every old epoch, then
        # vacuum (reclaims superseded snapshots under the readers)
        store.append(mk([
            (9000 + i, f"late arrival {i} " + " ".join(
                f"z{i}q{j}" for j in range(8)))
            for i in range(40)
        ]))
        store.compact_epochs(keep_last=1)
        store.broker.vacuum()
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=180)
    assert not errors, f"concurrent corpus reader failed: {errors[0]}"
    n_after = n_before + 40
    assert counts, "readers never completed a scan"
    bad = [c for c in counts if c not in (n_before, n_after)]
    assert not bad, f"reader saw a torn corpus snapshot: {bad}"
    assert store.read().count() == n_after


def test_ivf_probes_consistent_under_append_and_compaction(
        spark, tmp_path):
    from weatherdb_spark.llm.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        ivf_topk_indexed,
    )

    def vec(seed):
        return [float(((seed * 31 + i * 7) % 100) / 50.0 - 1.0)
                for i in range(16)]

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    part1 = emb.filter(F.col("vec_id") % 2 == 0)
    part2 = emb.filter(F.col("vec_id") % 2 == 1)
    q = emb.filter(F.col("vec_id") < 6)
    idx = str(tmp_path / "ivf")
    build_ivf_index(part1, idx, n_cells=8, seed=42)

    def probe():
        return frozenset(
            tuple(r) for r in
            ivf_topk_indexed(spark, idx, q, k=5, n_probe=3).collect()
        )

    before = probe()
    results: list[frozenset] = []
    errors: list[Exception] = []
    stop = threading.Event()

    def prober():
        while not stop.is_set():
            try:
                results.append(probe())
            except Exception as exc:  # noqa: BLE001 — the failure mode
                errors.append(exc)
                return

    threads = [threading.Thread(target=prober) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        append_to_ivf_index(spark, idx, part2)
        compact_ivf_index(spark, idx)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=180)
    assert not errors, f"concurrent IVF probe failed: {errors[0]}"
    after = probe()
    assert after != before  # the append genuinely changed the results
    assert results, "probers never completed a probe"
    bad = [r for r in results if r not in (before, after)]
    assert not bad, (
        f"probe saw a torn index state ({len(bad)} inconsistent probes)"
    )
