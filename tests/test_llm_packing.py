"""Semantic invariants for the sequence-shaping operators
(llm/packing.py) and the per-source quota sampler — properties the
oracle value-compare can't express: strategy invariance, monotonicity,
exact coverage, layout independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.llm.packing import chunk_windows, pack_concat_chunk, shuffle_shard
from weatherdb_spark.llm.sampling import source_quota_cap


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "a b c d e f g h i j", "s1"),
        (2, "k l m", "s1"),
        (3, "n", "s2"),
        (4, " ".join(f"w{i}" for i in range(40)), "s2"),
        (5, "x y", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_chunk_windows_reconstructs_every_token(docs):
    out = chunk_windows(docs, window=4, stride=3).collect()
    texts = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    seen: dict[int, set[int]] = {d: set() for d in texts}
    for r in out:
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.n_chunk_tokens <= 4
        for i, t in enumerate(toks):
            assert texts[r.doc_id][r.chunk_start + i] == t
            seen[r.doc_id].add(r.chunk_start + i)
    for d, n in ((d, len(t)) for d, t in texts.items()):
        assert seen[d] == set(range(n)), f"doc {d} not fully covered"


def test_chunk_windows_null_text_emits_nothing(spark):
    # CorpusStore admits one NULL-text representative per dedup group,
    # so NULL texts DO reach chunking; each must emit zero chunks — not
    # the phantom (chunk_id=0, NULL n_chunk_tokens, NULL text) row that
    # greatest(NULL - window, 0) = 0 would otherwise schedule.
    rows = [(1, "a b c d e"), (2, None), (3, "f g")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_windows(df, window=4, stride=3)
    assert out.filter(F.col("doc_id") == 2).count() == 0
    assert out.filter(F.col("n_chunk_tokens").isNull()).count() == 0
    assert out.filter(F.col("chunk_text").isNull()).count() == 0
    # non-NULL docs are untouched by the guard
    assert {r.doc_id for r in out.collect()} == {1, 3}


def test_chunk_windows_rejects_bad_stride(docs):
    with pytest.raises(ValueError):
        chunk_windows(docs, window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_windows(docs, window=4, stride=0)


def test_pack_tiles_sequences_exactly_and_ignores_bucketing(docs):
    a = pack_concat_chunk(docs, capacity=8, bucket_docs=2)
    b = pack_concat_chunk(docs, capacity=8, bucket_docs=1000)
    rows_a = sorted(map(tuple, a.collect()))
    # bucket_docs is a compute strategy, never a semantic knob
    assert rows_a == sorted(map(tuple, b.collect()))
    # every document's segments tile its tokens exactly
    per_doc = a.groupBy("doc_id").agg(
        F.sum("seg_len").alias("s"), F.min("n_tokens").alias("n")
    )
    assert all(r.s == r.n for r in per_doc.collect())
    # every sequence holds exactly `capacity` tokens except the last
    total = sum(len(r.text.split(" ")) for r in docs.collect())
    per_seq = {r.seq_id: r.s for r in
               a.groupBy("seq_id").agg(F.sum("seg_len").alias("s")).collect()}
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))  # dense sequence ids
    for sid, s in per_seq.items():
        assert s == (8 if sid < last else total - 8 * last)


def test_pack_auto_sized_bucket_docs_is_value_identical(docs):
    """bucket_docs=None auto-sizes to ~sqrt(max_id + 1) — a pure
    compute strategy, so the rows are bit-identical to any explicit
    value (the VERDICT r6 foot-gun: a 10^10-doc corpus at the fixed
    default 1000 puts a 10^7-row bucket dim in one window task)."""
    auto = sorted(map(tuple, pack_concat_chunk(
        docs, capacity=8, bucket_docs=None).collect()))
    explicit = sorted(map(tuple, pack_concat_chunk(
        docs, capacity=8, bucket_docs=1000).collect()))
    assert auto == explicit


def test_pack_offsets_follow_doc_id_order(docs):
    out = {r.doc_id: r.tok_offset for r in
           pack_concat_chunk(docs, capacity=8).select(
               "doc_id", "tok_offset").distinct().collect()}
    lens = {r.doc_id: len(r.text.split(" ")) for r in docs.collect()}
    off = 0
    for d in sorted(lens):
        assert out[d] == off
        off += lens[d]


def test_shuffle_shard_positions_and_salt_independence(docs):
    out = shuffle_shard(docs, n_shards=3, salt="a").collect()
    assert {r.shard for r in out} <= {0, 1, 2}
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: (r.sort_key, r.doc_id))
        assert [r.shard_pos for r in rows] == list(range(1, len(rows) + 1))
    other = shuffle_shard(docs, n_shards=3, salt="b").collect()
    assert {r.doc_id: r.sort_key for r in out} != {r.doc_id: r.sort_key for r in other}
    # projection-only path drops the window entirely
    proj = shuffle_shard(docs, n_shards=3, salt="a", with_position=False)
    assert "shard_pos" not in proj.columns
    assert "Window" not in proj._jdf.queryExecution().executedPlan().toString()


def test_packing_plan_shapes(docs, spark):
    # chunk_windows rides the scan: no exchange anywhere in the plan
    chunk_plan = chunk_windows(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in chunk_plan
    # the quota sampler never sorts a stratum in a window — exact top-N
    # comes from bounded hash aggregates
    df = spark.createDataFrame([(i, f"s{i % 3}") for i in range(30)],
                               "doc_id long, source string")
    quota_plan = source_quota_cap(df, quota=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in quota_plan
    # pack's cross-bucket base rides a broadcast join, not a shuffle join
    pack_plan = pack_concat_chunk(docs, capacity=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in pack_plan or "BroadcastNestedLoop" in pack_plan


def test_source_quota_exact_monotone_and_layout_stable(spark):
    rows = [(i, f"src{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    q5 = source_quota_cap(df, quota=5, id_col="doc_id")
    counts = {r.source: r.c for r in
              q5.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts == {"src0": 5, "src1": 5, "src2": 5}
    # monotone: quota 5 kept set is a subset of quota 9's
    kept5 = {(r.doc_id, r.source) for r in q5.collect()}
    kept9 = {(r.doc_id, r.source)
             for r in source_quota_cap(df, quota=9).collect()}
    assert kept5 < kept9 and len(kept9) == 27
    # layout independence: same result at any partitioning / merge_buckets
    alt = source_quota_cap(df.repartition(13), quota=5, merge_buckets=3)
    assert {(r.doc_id, r.source, r.keep_rank) for r in alt.collect()} == {
        (r.doc_id, r.source, r.keep_rank) for r in q5.collect()
    }
    # small strata keep everything
    tiny = source_quota_cap(df.filter(F.col("doc_id") < 4), quota=50)
    assert tiny.count() == 4
    with pytest.raises(ValueError):
        source_quota_cap(df, quota=0)


def test_bm25_ranks_exact_term_matches_first(spark):
    from weatherdb_spark.llm.search import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry date"),
            (2, "apple apple apple banana"),
            (3, "kiwi lemon mango peach"),
            (4, "apple kiwi kiwi kiwi"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(1, "apple"), (2, "kiwi lemon")], "query_id long, query string"
    )
    # guard off: this test checks the raw ranking math, and in a
    # 4-doc corpus 'apple' (df 3) trips the 0.5 df-share default
    out = bm25_topk(docs, qs, k=3, max_df_share=None).collect()
    by_q = {}
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.doc_id)
    # doc 2 repeats 'apple' most; doc 3 never appears for q1
    assert by_q[1][0] == 2 and 3 not in by_q[1]
    # 'lemon' is rarer than 'kiwi' (df 1 vs 2): doc 3 with both wins
    assert by_q[2][0] == 3 and set(by_q[2]) == {3, 4}
    ranks = [r.rank for r in out if r.query_id == 1]
    assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_bm25_degenerate_term_guard_bounds_candidates(spark):
    """A corpus-ubiquitous query term ('the', df = N) must not pull the
    whole corpus through the candidate join: with the default
    max_df_share it is dropped before scoring, the candidate set is
    bounded by the distinctive terms' postings, and the top-k ranks are
    unchanged (an idf ~ 0 term cannot reorder them here)."""
    from weatherdb_spark.llm.search import bm25_topk

    # every doc contains 'the' once; only docs 0-4 contain 'apple',
    # with descending tf so the apple contribution dictates the order
    rows = [
        (d, "the " + " ".join(["apple"] * (5 - d)) + f" filler{d}")
        for d in range(5)
    ] + [(d, f"the noise{d} pad{d}") for d in range(5, 30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs = spark.createDataFrame([(1, "the apple")],
                               "query_id long, query string")

    guarded = bm25_topk(docs, qs, k=3).collect()
    unguarded = bm25_topk(docs, qs, k=3, max_df_share=None).collect()
    # bounded: only apple's 5 postings are candidates — no doc that
    # matches solely via 'the' appears at any k
    all_guarded = bm25_topk(docs, qs, k=30).collect()
    assert {r.doc_id for r in all_guarded} == {0, 1, 2, 3, 4}
    assert len(bm25_topk(docs, qs, k=30, max_df_share=None).collect()) == 30
    # unchanged top-k: same docs in the same order
    assert [r.doc_id for r in sorted(guarded, key=lambda r: r.rank)] \
        == [r.doc_id for r in sorted(unguarded, key=lambda r: r.rank)] \
        == [0, 1, 2]
    # a query of ONLY degenerate terms matches nothing (documented)
    only_the = spark.createDataFrame([(9, "the")],
                                     "query_id long, query string")
    assert bm25_topk(docs, only_the, k=3).count() == 0
    with pytest.raises(ValueError, match="max_df_share"):
        bm25_topk(docs, qs, k=3, max_df_share=1.5)


# ------------------------- property-based invariants (random corpora)

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_corpus = st.lists(
    st.integers(min_value=1, max_value=30),  # token count per doc
    min_size=1, max_size=12,
)


def _mkdocs(spark, lens):
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(n)))
            for i, n in enumerate(lens)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lens=_corpus, window=st.integers(2, 8), stride_off=st.integers(0, 6))
def test_chunk_windows_property_full_cover_no_invent(spark, lens, window,
                                                     stride_off):
    stride = max(1, window - stride_off)
    out = chunk_windows(_mkdocs(spark, lens), window=window,
                        stride=stride).collect()
    for d, n in enumerate(lens):
        chunks = sorted((r for r in out if r.doc_id == d),
                        key=lambda r: r.chunk_id)
        covered = []
        for r in chunks:
            toks = r.chunk_text.split(" ")
            # chunk content is the doc's own tokens at the right offsets
            assert toks == [f"t{d}_{j}" for j in
                            range(r.chunk_start, r.chunk_start + len(toks))]
            covered.extend(range(r.chunk_start, r.chunk_start + len(toks)))
        assert set(covered) == set(range(n))
        # stride dedups starts: no chunk begins past the end
        assert all(r.chunk_start < n for r in chunks)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lens=_corpus, capacity=st.integers(1, 40),
       bucket_docs=st.integers(1, 6))
def test_pack_property_matches_sequential_model(spark, lens, capacity,
                                                bucket_docs):
    out = pack_concat_chunk(_mkdocs(spark, lens), capacity=capacity,
                            bucket_docs=bucket_docs).collect()
    # oracle: a plain python walk of the concatenated stream
    expect = []
    off = 0
    for d, n in enumerate(lens):
        for seq in range(off // capacity, (off + n - 1) // capacity + 1):
            lo = max(off, seq * capacity)
            hi = min(off + n, (seq + 1) * capacity)
            expect.append((d, n, off, seq, lo - off, hi - lo))
        off += n
    got = sorted((r.doc_id, r.n_tokens, r.tok_offset, r.seq_id,
                  r.seg_start, r.seg_len) for r in out)
    assert got == sorted(expect)


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark):
    from weatherdb_spark.llm.text import winnow_fingerprints

    k, w = 5, 3
    shared = "XYZQWERTYUIOPX"  # len 14 >= w + k - 1 = 7
    docs = spark.createDataFrame(
        [
            (1, "aaaa bbbb " + shared + " cccc dddd"),
            (2, "completely other prefix " + shared),
            (3, "no overlap here at all with anything"),
            (4, "tiny"),  # shorter than k + w - 1: no fingerprints
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=k, window=w).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # winnowing guarantee: the shared >= w+k-1 substring forces overlap
    assert by_doc[1] & by_doc[2]
    # unrelated docs share nothing
    assert not (by_doc[3] & by_doc[1]) and not (by_doc[3] & by_doc[2])
    # density ~ 2/(w+1): far fewer fingerprints than characters
    assert 0 < len(by_doc[1]) < len("aaaa bbbb " + shared + " cccc dddd")
    assert 4 not in by_doc


def test_pack_rejects_non_numeric_ids(spark):
    df = spark.createDataFrame(
        [("doc-1", "a b c")], "doc_id string, text string"
    )
    with pytest.raises(TypeError, match="integral"):
        pack_concat_chunk(df, capacity=4)
    # the auto-size path must hit the same curated error, not a raw
    # int() ValueError after a wasted max-aggregate job
    with pytest.raises(TypeError, match="integral"):
        pack_concat_chunk(df, capacity=4, bucket_docs=None)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_bm25_property_matches_python_model(spark, data):
    from weatherdb_spark.llm.search import bm25_topk

    vocab = ["red", "blue", "green", "ash", "oak", "fir", "sun", "rain"]
    n_docs = data.draw(st.integers(2, 8))
    docs_py = {
        d: data.draw(st.lists(st.sampled_from(vocab), min_size=1, max_size=12))
        for d in range(n_docs)
    }
    q_words = data.draw(st.lists(st.sampled_from(vocab), min_size=1,
                                 max_size=3, unique=True))
    k = data.draw(st.integers(1, 4))

    docs = spark.createDataFrame(
        [(d, " ".join(ws)) for d, ws in docs_py.items()],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(1, " ".join(q_words))],
                               "query_id long, query string")
    got = [(r.rank, r.doc_id, r.score_bm25)
           for r in sorted(bm25_topk(docs, qs, k=k).collect(),
                           key=lambda r: r.rank)]

    # brute python model with the same micro-quantization. NOTE the
    # rounding: Spark F.round is HALF_UP on the double's shortest
    # decimal repr; Python round() is banker's on the binary value —
    # the exact trap the daily-adjust model hit (commit history), so
    # quantize via Decimal(repr(x)) like _spark_round there.
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def _micro(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal(1),
                                             rounding=ROUND_HALF_UP))

    n = len(docs_py)
    avgdl = sum(len(ws) for ws in docs_py.values()) / n
    dfreq = {w: sum(1 for ws in docs_py.values() if w in ws) for w in q_words}
    scores = {}
    for d, ws in docs_py.items():
        micro = 0
        for w in q_words:
            tf = ws.count(w)
            if tf == 0:
                continue
            if dfreq[w] > 0.5 * n:
                # the engine's default degenerate-term guard
                # (max_df_share=0.5), mirrored — random small corpora
                # trip it constantly, so the default path stays under
                # property test
                continue
            idf = math.log(1.0 + (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
            tfn = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ws) / avgdl))
            micro += _micro(idf * tfn * 1e6)
        if micro:
            scores[d] = micro
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == [(i + 1, d, round(m / 1e6, 6))
                   for i, (d, m) in enumerate(expect)]


def test_tokenizer_seam_default_path_unchanged(docs):
    """Passing tokens=tokens_expr explicitly is bit-identical to the
    default — the seam is a pure parameterization, not a fork."""
    from weatherdb_spark.llm.text import tokens_expr

    a = sorted(map(tuple, chunk_windows(docs, window=4, stride=3).collect()))
    b = sorted(map(tuple, chunk_windows(
        docs, window=4, stride=3, tokens=tokens_expr).collect()))
    assert a == b
    c = sorted(map(tuple, pack_concat_chunk(docs, capacity=8).collect()))
    d = sorted(map(tuple, pack_concat_chunk(
        docs, capacity=8, tokens=tokens_expr).collect()))
    assert c == d


def test_arrow_tokenizer_flows_through_packing_bm25_unigram(spark):
    """A custom Arrow-backed tokenizer (the real-tokenizer integration
    shape) flows end-to-end: packing counts ITS tokens, chunking cuts
    ITS token stream, BM25 matches terms it alone can split out, and
    unigram scoring fits on its vocabulary."""
    import re

    from weatherdb_spark.llm.search import bm25_topk
    from weatherdb_spark.llm.text import arrow_regex_tokens, unigram_logprob

    rx = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    tok = arrow_regex_tokens()
    rows = [
        (0, "alpha,beta gamma!"),          # 5 regex tokens, 2 ws tokens
        (1, "delta epsilon"),
        (2, "x1:y2 alpha"),                # 6 regex tokens
        (3, None),                         # NULL rides the seam too
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    py_toks = {d: rx.findall(t) for d, t in rows if t is not None}

    # packing: n_tokens is the custom tokenizer's count; segments tile
    packed = pack_concat_chunk(docs, capacity=4, tokens=tok).collect()
    n_by_doc = {r.doc_id: r.n_tokens for r in packed}
    assert n_by_doc == {d: len(ts) for d, ts in py_toks.items()}
    per_doc = {}
    for r in packed:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.seg_len
    assert per_doc == n_by_doc

    # chunking: chunk text is the custom token stream, space-joined
    chunks = chunk_windows(docs, window=3, stride=2, tokens=tok).collect()
    assert {r.doc_id for r in chunks} == {0, 1, 2}
    for r in chunks:
        want = py_toks[r.doc_id][r.chunk_start:r.chunk_start + 3]
        assert r.chunk_text.split(" ") == want

    # BM25: 'beta' exists as a term ONLY under the custom tokenizer
    qs = spark.createDataFrame([(1, "beta")], "query_id long, query string")
    assert bm25_topk(docs, qs, k=3).count() == 0          # ws default
    hit = bm25_topk(docs, qs, k=3, tokens=tok).collect()
    assert [r.doc_id for r in hit] == [0]

    # unigram LM: n_words counts the custom tokens
    ug = {r.doc_id: r.n_words
          for r in unigram_logprob(docs, tokens=tok).collect()}
    assert ug == {d: len(ts) for d, ts in py_toks.items()}


def test_write_training_shards_layout_and_replay(spark, tmp_path):
    import os

    from weatherdb_spark.llm.packing import write_training_shards

    docs = spark.createDataFrame(
        [(i, f"text {i}", f"s{i % 2}") for i in range(40)],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4, salt="e1")
    # addressable shard dirs, one data file each (a loader streams one
    # file per worker)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1
    back = spark.read.parquet(out)
    assert back.count() == 40 and set(back.columns) >= {
        "doc_id", "text", "source", "sort_key", "shard"}
    # shard assignment matches the shuffle_shard operator (same salt)
    expect = {r.doc_id: r.shard
              for r in shuffle_shard(docs, n_shards=4, salt="e1").collect()}
    assert {r.doc_id: r.shard for r in back.collect()} == expect
    # in-file order IS the shard-key order (no row_number was needed)
    for i in range(4):
        part = spark.read.parquet(os.path.join(out, f"shard={i}"))
        rows = part.collect()  # single parquet file: read order = file order
        keys = [(r.sort_key, r.doc_id) for r in rows]
        assert keys == sorted(keys)
    # replay is bit-identical
    out2 = str(tmp_path / "shards2")
    write_training_shards(docs, out2, n_shards=4, salt="e1")
    a = sorted(map(tuple, spark.read.parquet(out).collect()))
    b = sorted(map(tuple, spark.read.parquet(out2).collect()))
    assert a == b


def test_compression_ratio_matches_zlib_and_ranks_repetition(spark):
    import zlib

    from weatherdb_spark.llm.text import compression_ratio

    docs = spark.createDataFrame(
        [
            (1, "spam " * 200),                      # highly repetitive
            (2, " ".join(f"u{i}x{i*7%13}" for i in range(200))),  # varied
            (3, ""),                                  # empty -> NULL ratio
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in compression_ratio(docs).collect()}
    for d, text in ((1, "spam " * 200),
                    (2, " ".join(f"u{i}x{i*7%13}" for i in range(200)))):
        raw = text.encode("utf-8")
        assert out[d].n_bytes == len(raw)
        assert out[d].n_compressed == len(zlib.compress(raw, 6))
        assert out[d].compression_ratio == round(
            len(zlib.compress(raw, 6)) / len(raw), 6)
    assert out[1].compression_ratio < 0.1 < out[2].compression_ratio
    assert out[3].compression_ratio is None and out[3].n_bytes == 0
    with pytest.raises(ValueError):
        compression_ratio(docs, level=11)


def test_prepare_training_corpus_stage_order_semantics(spark):
    from weatherdb_spark.llm.pipeline import prepare_training_corpus

    good = ("the fast table row scan is a good line of data and it "
            "works in the end for all of us here")
    rows = [
        # docs 1 and 2 differ ONLY in PII: scrub-before-dedup must
        # collapse them (doc 1 survives)
        (1, good + " mail a@x.example", "s1"),
        (2, good + " mail b@y.example", "s1"),
        # low-quality doc: punctuation soup fails the quality gate
        (3, ";;; ??? !!! ### $$$ %%% ^^^ &&& *** ((( )))", "s1"),
        # German doc fails the language gate
        (4, "der die das und ist ein zu den der die das und ist", "s2"),
        # normal survivors in s2
        (5, good, "s2"),
        (6, good + " more of the same kind of words in it", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = prepare_training_corpus(
        docs, min_quality=0.5, lang="en", quota=10, capacity=16
    )
    survivors = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert 2 not in survivors          # deduped against 1 AFTER scrub
    assert 1 in survivors
    assert 3 not in survivors          # quality gate
    assert 4 not in survivors          # language gate
    assert {5, 6} <= survivors
    # packing tiles the survivors exactly
    per_doc = {r.doc_id: r.s for r in out.groupBy("doc_id").agg(
        F.sum("seg_len").alias("s")).collect()}
    for d, text, _ in rows:
        if d in survivors:
            # token count AFTER scrub (emails redacted, same count)
            assert per_doc[d] == len(text.split(" "))


def test_prepare_training_corpus_custom_tokenizer_packs_its_counts(spark):
    """The tokenizer seam flows through the flagship composition: with
    an Arrow tokenizer, packing tiles the model's token counts, not
    whitespace words; the gates keep their heuristic convention."""
    import re

    from weatherdb_spark.llm.pipeline import prepare_training_corpus
    from weatherdb_spark.llm.text import arrow_regex_tokens

    good = ("the fast table, row scan is a good line of data and it "
            "works in the end for all of us here")
    docs = spark.createDataFrame(
        [(1, good, "s1"), (2, good + " more of the same kind", "s1")],
        "doc_id long, text string, source string",
    )
    out = prepare_training_corpus(
        docs, min_quality=0.5, lang="en", quota=10, capacity=16,
        tokens=arrow_regex_tokens(),
    )
    rx = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    per_doc = {r.doc_id: r.s for r in out.groupBy("doc_id").agg(
        F.sum("seg_len").alias("s")).collect()}
    assert per_doc[1] == len(rx.findall(good))        # 1 extra: the comma
    assert per_doc[1] == len(good.split(" ")) + 1


def test_wordpiece_tokens_greedy_longest_match(spark):
    """The published WordPiece semantics: greedy longest-match-first,
    ## continuations, whole-word UNK on unsegmentable words, NULL in ->
    NULL array out."""
    from weatherdb_spark.llm.text import wordpiece_tokens

    tok = wordpiece_tokens(
        ["un", "##afford", "##able", "##b", "a", "able", "affordable"])
    df = spark.createDataFrame(
        [(1, "unaffordable"), (2, "affordable"), (3, "a ab"),
         (4, "zzz"), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.t for r in
           df.select("doc_id", tok("text").alias("t")).collect()}
    assert got[1] == ["un", "##afford", "##able"]
    assert got[2] == ["affordable"]          # longest match, no split
    assert got[3] == ["a", "a", "##b"]
    assert got[4] == ["[UNK]"]
    assert got[5] is None


def test_wordpiece_vocab_file_and_guards(spark, tmp_path):
    import pytest as _pytest

    from weatherdb_spark.llm.text import wordpiece_tokens

    vf = tmp_path / "vocab.txt"
    vf.write_text("the\ndata\n##set\n\n")   # blank line ignored
    tok = wordpiece_tokens(str(vf))
    df = spark.createDataFrame([(1, "the dataset")], "doc_id long, text string")
    [r] = df.select(tok("text").alias("t")).collect()
    assert r.t == ["the", "data", "##set"]
    with _pytest.raises(ValueError, match="non-empty"):
        wordpiece_tokens([])
    # adversarial megaword short-circuits to UNK instead of O(n^2)
    longword = "x" * 500
    tok2 = wordpiece_tokens(["x", "##x"], max_word_chars=100)
    df2 = spark.createDataFrame([(1, longword)], "doc_id long, text string")
    [r2] = df2.select(tok2("text").alias("t")).collect()
    assert r2.t == ["[UNK]"]


def test_prepare_training_corpus_wordpiece_packs_subword_counts(spark):
    """A trained-vocab tokenizer through the flagship composition:
    sequence boundaries follow SUBWORD counts (7 pieces), not
    whitespace words (5) — the proof the seam carries a real model
    tokenizer, not just a regex."""
    from weatherdb_spark.llm.pipeline import prepare_training_corpus
    from weatherdb_spark.llm.text import wordpiece_tokens

    good = ("the fast table, row scan is a good line of data and it "
            "works in the end for all of us here")
    # every word of the fixture, except 'works' and 'table' segment
    # into two pieces each (+ the comma as its own piece)
    words = set(good.replace(",", "").split())
    vocab = sorted((words - {"works", "table"})
                   | {"work", "##s", "tab", "##le", ","})
    tok = wordpiece_tokens(vocab)
    docs = spark.createDataFrame(
        [(1, good, "s1")], "doc_id long, text string, source string",
    )
    out = prepare_training_corpus(
        docs, min_quality=0.5, lang="en", quota=10, capacity=16,
        tokens=tok,
    )
    n_ws = len(good.split(" "))
    n_subword = n_ws + 1 + 2   # comma piece + one extra per split word
    per_doc = {r.doc_id: r.s for r in out.groupBy("doc_id").agg(
        F.sum("seg_len").alias("s")).collect()}
    assert per_doc[1] == n_subword
    assert per_doc[1] != n_ws
    # the 16-token capacity cuts at subword boundaries: segment rows
    # tile [0, n_subword) exactly
    segs = sorted((r.seg_start, r.seg_len) for r in
                  out.filter(F.col("doc_id") == 1).collect())
    covered = []
    for s, ln in segs:
        covered.extend(range(s, s + ln))
    assert covered == list(range(n_subword))


def test_bpe_tokens_rank_greedy_merges(spark):
    """The published BPE semantics (Sennrich et al. 2016): adjacent
    pairs merge in trained-rank order, every adjacent occurrence in one
    pass, unmergeable characters stay single tokens (no UNK), NULL in
    -> NULL array out."""
    from weatherdb_spark.llm.text import bpe_tokens

    tok = bpe_tokens([("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")])
    df = spark.createDataFrame(
        [(1, "lower"), (2, "lowest"), (3, "zzz"), (4, "abab"), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.t for r in
           df.select("doc_id", tok("text").alias("t")).collect()}
    assert got[1] == ["lower"]                     # full merge chain
    assert got[2] == ["low", "e", "s", "t"]        # partial coverage
    assert got[3] == ["z", "z", "z"]               # no UNK in BPE
    assert got[4] == ["a", "b", "a", "b"]          # no (a,b) rank: chars
    assert got[5] is None

    # every adjacent occurrence of the best pair merges in ONE pass
    tok2 = bpe_tokens([("a", "b")])
    [r] = spark.createDataFrame([(1, "abab")], "doc_id long, text string") \
        .select(tok2("text").alias("t")).collect()
    assert r.t == ["ab", "ab"]

    # Sennrich end-of-word marker: the last char carries it, so merges
    # distinguish word-final from word-internal pairs
    tok3 = bpe_tokens([("a", "b</w>")], end_of_word="</w>")
    [r3] = spark.createDataFrame([(1, "ab abc")], "doc_id long, text string") \
        .select(tok3("text").alias("t")).collect()
    assert r3.t == ["ab</w>", "a", "b", "c</w>"]


def test_bpe_merges_file_and_guards(spark, tmp_path):
    import pytest as _pytest

    from weatherdb_spark.llm.text import bpe_tokens

    mf = tmp_path / "merges.txt"
    mf.write_text("#version: 0.2\nt h\nth e\n\n")  # header + blank ignored
    tok = bpe_tokens(str(mf))
    df = spark.createDataFrame([(1, "the that")], "doc_id long, text string")
    [r] = df.select(tok("text").alias("t")).collect()
    assert r.t == ["the", "th", "a", "t"]

    with _pytest.raises(ValueError, match="non-empty"):
        bpe_tokens([])
    bad = tmp_path / "bad.txt"
    bad.write_text("a b c\n")
    with _pytest.raises(ValueError, match="left right"):
        bpe_tokens(str(bad))

    # a duplicated pair keeps its FIRST (earliest-learned) rank: a
    # hand-concatenated merges file repeating ('t','h') at the end must
    # not demote it below ('h','e') — last-wins would segment "the" as
    # t + he
    dup = bpe_tokens([("t", "h"), ("h", "e"), ("th", "e"), ("t", "h")])
    [rd] = spark.createDataFrame([(1, "the")], "doc_id long, text string") \
        .select(dup("text").alias("t")).collect()
    assert rd.t == ["the"]

    # adversarial megaword stays ONE unsplit token (no merge pass)
    tok2 = bpe_tokens([("x", "x")], max_word_chars=100)
    longword = "x" * 500
    [r2] = spark.createDataFrame([(1, longword)], "doc_id long, text string") \
        .select(tok2("text").alias("t")).collect()
    assert r2.t == [longword]


def test_prepare_training_corpus_bpe_packs_merge_counts(spark):
    """BPE through the flagship composition: sequence boundaries follow
    the MERGE-derived counts — a third token arithmetic, pairwise
    distinct from whitespace and WordPiece on the same document, packed
    through the same seam."""
    import re

    from weatherdb_spark.llm.pipeline import prepare_training_corpus
    from weatherdb_spark.llm.text import bpe_tokens

    good = ("the fast table, row scan is a good line of data and it "
            "works in the end for all of us here")
    # only 'the' has merges: every other word explodes to characters
    tok = bpe_tokens([("t", "h"), ("th", "e")])
    pre = re.findall(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]", good)
    n_bpe = sum(1 if w == "the" else len(w) for w in pre)
    n_ws = len(good.split(" "))
    n_wp = n_ws + 1 + 2  # the wordpiece fixture's subword count
    assert len({n_ws, n_wp, n_bpe}) == 3  # three distinct arithmetics

    docs = spark.createDataFrame(
        [(1, good, "s1")], "doc_id long, text string, source string",
    )
    out = prepare_training_corpus(
        docs, min_quality=0.5, lang="en", quota=10, capacity=16,
        tokens=tok,
    )
    per_doc = {r.doc_id: r.s for r in out.groupBy("doc_id").agg(
        F.sum("seg_len").alias("s")).collect()}
    assert per_doc[1] == n_bpe
    # the capacity cuts at BPE boundaries: segments tile [0, n_bpe)
    segs = sorted((r.seg_start, r.seg_len) for r in
                  out.filter(F.col("doc_id") == 1).collect())
    covered = []
    for s, ln in segs:
        covered.extend(range(s, s + ln))
    assert covered == list(range(n_bpe))
