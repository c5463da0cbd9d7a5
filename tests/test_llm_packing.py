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


def test_corpus_store_dedup_at_append_and_time_travel(spark, tmp_path):
    """CorpusStore: MVCC corpus snapshots with dedup AT APPEND — the
    incremental corpus-management shape (batch checks first, then the
    asymmetric archive checks; every drop logged with its reason)."""
    from weatherdb_spark.llm.corpus import CorpusStore

    # baseline the persisted-RDD set: earlier tests in the shared
    # session may hold scope-less persists or lingering localCheckpoint
    # RDDs (e.g. connected-components runs); the hygiene claim below is
    # about what THIS test's appends add, so assert on the delta
    spark.catalog.clearCache()
    _baseline = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    store = CorpusStore(spark, str(tmp_path / "wh"), near_threshold=0.8)
    base = "the quick brown fox jumps over the lazy dog by the river today"
    b1 = spark.createDataFrame(
        [(1, base, "s1"),
         (2, "totally different words entirely here now ok", "s1"),
         (3, base, "s2")],                      # exact dup of 1 in-batch
        "doc_id long, text string, source string")
    assert store.append(b1) == {"admitted": 2, "rejected": 1, "version": 1}

    b2 = spark.createDataFrame(
        [(10, base, "s3"),                      # exact vs archive
         (11, base + " extra", "s3"),           # ALSO near dup of 10 in-batch
         (12, "fresh unique content nothing like the others at all", "s3")],
        "doc_id long, text string, source string")
    assert store.append(b2) == {"admitted": 1, "rejected": 2, "version": 2}
    # time travel: the immediately previous snapshot is retained
    # (Broker MVCC contract; older ones are vacuum-reclaimed)
    assert store.read(version=1).count() == 2

    b3 = spark.createDataFrame(
        [(20, base + " extra2", "s4")],         # near dup vs archive ONLY
        "doc_id long, text string, source string")
    assert store.append(b3) == {"admitted": 0, "rejected": 1, "version": 3}

    assert store.read().count() == 3
    assert store.read(version=2).count() == 3
    assert store.versions() == [2, 3]
    # cache hygiene: appends leave NOTHING persisted (scoped_persist +
    # cache_scope, not localCheckpoint — the latter lingered until GC).
    # unpersist is async (blocking=False), so poll briefly.
    import time as _time

    def _new_rdds():
        ids = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
        return ids - _baseline

    for _ in range(50):
        if not _new_rdds():
            break
        _time.sleep(0.1)
    assert not _new_rdds()
    reasons = {(r.doc_id, r.reason, r.blocked_by)
               for r in store.rejections().collect()}
    assert reasons == {
        (3, "batch_exact", 1),     # kept copy named in the audit trail
        (10, "archive_exact", 1),
        (11, "batch_near", 10),
        (20, "archive_near", 1),
    }


def test_stream_into_corpus_cross_batch_dedup(spark, tmp_path):
    """Documents arriving in different micro-batches dedup against each
    other through the CorpusStore archive — warehouse-backed, stateless,
    and idempotent under replay (a replayed doc is an exact dup of its
    own archived copy)."""
    import os

    import pandas as pd

    from weatherdb_spark.llm.corpus import CorpusStore, stream_into_corpus

    base = "the quick brown fox jumps over the lazy dog by the river today"
    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame({"doc_id": [1, 2],
                  "text": [base, "totally different words entirely here"]}
                 ).to_csv(src / "a.csv", index=False)
    pd.DataFrame({"doc_id": [3, 4],
                  "text": [base + " extra",  # near-dup of batch-1 doc
                           "fresh unique content nothing like the others"]}
                 ).to_csv(src / "b.csv", index=False)
    os.utime(src / "a.csv", (1_700_000_000, 1_700_000_000))
    os.utime(src / "b.csv", (1_700_000_100, 1_700_000_100))

    store = CorpusStore(spark, str(tmp_path / "wh"), near_threshold=0.8)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("header", "true").option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    stream_into_corpus(stream, store, str(tmp_path / "ck"))
    assert {r.doc_id for r in store.read().collect()} == {1, 2, 4}
    rej = {(r.doc_id, r.reason, r.blocked_by)
           for r in store.rejections().collect()}
    assert rej == {(3, "archive_near", 1)}   # caught ACROSS batches


def test_corpus_append_is_o_batch_with_hardlinked_epochs(spark, tmp_path):
    """The epoch-partitioned append contract: each append materializes
    ONLY its own ingest_epoch leaf; every archived epoch's files enter
    the new snapshot as HARD LINKS of the previous snapshot's —
    byte-identical with no data pass (inode equality, the tree-hash
    twin of the data-fix rung's untouched-table check)."""
    import hashlib
    import os

    from weatherdb_spark.llm.corpus import DOCS_TABLE, CorpusStore

    def _tree_hash(root):
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(f for f in filenames if f.endswith(".parquet")):
                p = os.path.join(dirpath, fn)
                h.update(os.path.relpath(p, root).encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
        return h.hexdigest()

    store = CorpusStore(spark, str(tmp_path / "wh"))
    b = store.broker
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    store.append(mk([(1, "one unique doc of words"),
                     (2, "another set of other words")]))
    v1_leaf = os.path.join(b.data_path(DOCS_TABLE, 1), "ingest_epoch=1")
    before = _tree_hash(v1_leaf)
    inodes = {f: os.stat(os.path.join(v1_leaf, f)).st_ino
              for f in os.listdir(v1_leaf) if f.endswith(".parquet")}

    store.append(mk([(3, "a third thing entirely fresh")]))
    v2 = b.data_path(DOCS_TABLE, 2)
    linked = os.path.join(v2, "ingest_epoch=1")
    # byte-identical AND the very same inodes: a hard link, not a copy
    assert _tree_hash(linked) == before
    for f, ino in inodes.items():
        assert os.stat(os.path.join(linked, f)).st_ino == ino, \
            f"epoch-1 file {f} was rewritten, not linked"
    assert os.path.isdir(os.path.join(v2, "ingest_epoch=2"))
    # reads see the union, epochs recoverable on demand
    assert store.read().count() == 3
    assert {r.ingest_epoch for r in
            store.read(with_epoch=True).collect()} == {1, 2}
    # misuse guard: an already-written epoch value must not be shadowed
    import pytest as _pytest
    with _pytest.raises(ValueError, match="fresh"):
        b.write_partition_append(DOCS_TABLE, mk([(9, "x")]),
                                 "ingest_epoch", 2)


def test_compact_epochs_folds_old_leaves_and_keeps_semantics(spark, tmp_path):
    """compact_epochs bounds leaf-count growth: after thousands of
    appends the folded tail becomes ONE leaf per table (docs + both
    signature side tables, same epoch set — the sync invariant holds),
    the kept recent epochs hard-link untouched, content and archive
    dedup are unchanged, and appending continues normally."""
    import os

    from pyspark.sql import functions as F

    from weatherdb_spark.llm.corpus import (
        BANDS_TABLE,
        DOCS_TABLE,
        HASH_TABLE,
        CorpusStore,
    )

    store = CorpusStore(spark, str(tmp_path / "wh"))
    for lo in (0, 100, 200, 300, 400):
        store.append(spark.range(lo, lo + 20).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("unique doc words "), F.col("id").cast("string"))
            .alias("text")))
    assert store._epoch_values(DOCS_TABLE) == {1, 2, 3, 4, 5}
    kept_leaf = os.path.join(store.broker.data_path(DOCS_TABLE),
                             "ingest_epoch=5")
    kept_ino = {f: os.stat(os.path.join(kept_leaf, f)).st_ino
                for f in os.listdir(kept_leaf) if f.endswith(".parquet")}

    out = store.compact_epochs(keep_last=2)
    assert out == {"folded": 3, "into_epoch": 3}
    for t in (DOCS_TABLE, HASH_TABLE, BANDS_TABLE):
        assert store._epoch_values(t) == {3, 4, 5}, t
    # content identical; kept epochs hard-linked, not rewritten
    assert store.read().count() == 100
    assert {r.ingest_epoch for r in store.read(with_epoch=True)
            .filter(F.col("doc_id") < 60).collect()} == {3}
    new_kept = os.path.join(store.broker.data_path(DOCS_TABLE),
                            "ingest_epoch=5")
    for f, ino in kept_ino.items():
        assert os.stat(os.path.join(new_kept, f)).st_ino == ino

    # archive dedup still sees the folded docs (index folded alongside)
    out2 = store.append(spark.createDataFrame(
        [(900, "unique doc words 0"),         # exact dup of folded doc 0
         (901, "entirely new final words")],
        "doc_id long, text string"))
    assert out2["admitted"] == 1
    assert (900, "archive_exact", 0) in {
        (r.doc_id, r.reason, r.blocked_by)
        for r in store.rejections().collect()}
    # nothing-to-do path
    fresh = CorpusStore(spark, str(tmp_path / "wh2"))
    fresh.append(spark.createDataFrame([(1, "only words")],
                                       "doc_id long, text string"))
    assert fresh.compact_epochs()["folded"] == 0


def test_compact_epochs_stops_at_unindexed_crash_gap(spark, tmp_path):
    """Folding must never rename away an epoch the signature index has
    not seen (a crash between the corpus flip and the side-table
    flips): if it did, the epoch sets would match and the sync diff
    could never backfill the missing signatures — silent dedup misses
    forever. compact_epochs stops at the gap; the next append heals it
    via sync, after which it folds normally."""
    from pyspark.sql import functions as F

    from weatherdb_spark.llm.corpus import DOCS_TABLE, HASH_TABLE, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    for lo in (0, 100):
        store.append(spark.range(lo, lo + 10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("words "), F.col("id").cast("string")).alias("text")))
    ghost = "an epoch the index never saw"
    store.broker.write_partition_append(   # the crash-window state
        DOCS_TABLE,
        spark.createDataFrame([(500, ghost)], "doc_id long, text string"),
        "ingest_epoch", 3,
    )
    # fold-everything must stop BEFORE the un-indexed epoch 3
    out = store.compact_epochs(keep_last=0)
    assert out == {"folded": 2, "into_epoch": 2}
    assert store._epoch_values(DOCS_TABLE) == {2, 3}
    assert store._epoch_values(HASH_TABLE) == {2}   # gap still visible
    # the next append self-heals epoch 3 and the dup is caught
    res = store.append(spark.createDataFrame(
        [(600, ghost)], "doc_id long, text string"))
    assert res["admitted"] == 0
    # healed: now the whole tail folds
    assert store.compact_epochs(keep_last=0)["folded"] >= 2
    assert store.read().count() == 21


def test_vacuum_compacts_per_epoch_and_keeps_the_layout(spark, tmp_path):
    """Vacuum on an epoch-partitioned corpus compacts each epoch LEAF to
    one file but keeps the epoch dirs — a flat rewrite would lose the
    pruning key and force the next append back through the legacy
    migration. Values, epochs, and the link-on-append contract survive."""
    import os

    from pyspark.sql import functions as F

    from weatherdb_spark.llm.corpus import DOCS_TABLE, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    for lo in (0, 100, 200):
        store.append(
            spark.range(lo, lo + 50).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("doc words "), F.col("id").cast("string"))
                .alias("text"),
            )
        )
    before = {r.doc_id: r.ingest_epoch
              for r in store.read(with_epoch=True).collect()}
    res = store.broker.vacuum(max_files_per_bucket=0)
    assert DOCS_TABLE in res
    root = store.broker.data_path(DOCS_TABLE)
    leaves = sorted(e for e in os.listdir(root) if e.startswith("ingest_epoch="))
    assert leaves == ["ingest_epoch=1", "ingest_epoch=2", "ingest_epoch=3"]
    for leaf in leaves:
        n = sum(f.endswith(".parquet")
                for f in os.listdir(os.path.join(root, leaf)))
        assert n == 1, f"{leaf} has {n} files after compaction"
    assert {r.doc_id: r.ingest_epoch
            for r in store.read(with_epoch=True).collect()} == before
    # the compacted layout still link-appends (no re-migration)
    assert store.broker._is_partitioned_by(DOCS_TABLE, "ingest_epoch")
    store.append(spark.createDataFrame(
        [(999, "a totally new final doc")], "doc_id long, text string"))
    assert store.read().count() == 151


def test_corpus_store_migrates_legacy_flat_layout_once(spark, tmp_path):
    """A corpus written by a pre-epoch engine (flat snapshot, no
    ingest_epoch dirs) migrates on its first append: the legacy rows
    land once under ingest_epoch=0, the batch under its own epoch, and
    the NEXT append hard-links both — O(batch) from then on."""
    import os

    from weatherdb_spark.llm.corpus import DOCS_TABLE, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    legacy = spark.createDataFrame(
        [(1, "the old corpus doc of words"), (2, "a second archived doc")],
        "doc_id long, text string",
    )
    store.broker.write(DOCS_TABLE, legacy)          # the pre-epoch layout
    assert not store.broker._is_partitioned_by(DOCS_TABLE, "ingest_epoch")

    out = store.append(spark.createDataFrame(
        [(3, "a brand new third document"),
         (1, "the old corpus doc of words")],      # exact dup vs archive
        "doc_id long, text string",
    ))
    assert out == {"admitted": 1, "rejected": 1, "version": 2}
    v2 = store.broker.data_path(DOCS_TABLE, 2)
    assert os.path.isdir(os.path.join(v2, "ingest_epoch=0"))
    assert os.path.isdir(os.path.join(v2, "ingest_epoch=2"))
    assert store.read().count() == 3
    assert {r.doc_id: r.ingest_epoch
            for r in store.read(with_epoch=True).collect()} \
        == {1: 0, 2: 0, 3: 2}
    # next append links the migrated epoch instead of rewriting it
    ino = {f: os.stat(os.path.join(v2, "ingest_epoch=0", f)).st_ino
           for f in os.listdir(os.path.join(v2, "ingest_epoch=0"))
           if f.endswith(".parquet")}
    store.append(spark.createDataFrame(
        [(4, "and a completely distinct fourth")],
        "doc_id long, text string"))
    v3 = store.broker.data_path(DOCS_TABLE, 3)
    for f, i in ino.items():
        assert os.stat(os.path.join(v3, "ingest_epoch=0", f)).st_ino == i
    assert store.read().count() == 4


def test_corpus_side_tables_track_epochs_and_self_heal(spark, tmp_path):
    """The persisted signature index (text md5 + MinHash band keys)
    makes archive checks O(batch): its epoch leaves mirror the corpus's,
    and a stale index — a crash between the corpus flip and the side
    flips, or a lost side table — is healed by the next append's sync,
    so duplicates of un-indexed documents are still caught."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from weatherdb_spark.llm.corpus import (
        BANDS_TABLE,
        DOCS_TABLE,
        HASH_TABLE,
        CorpusStore,
    )

    base = "the quick brown fox jumps over the lazy dog by the river today"
    store = CorpusStore(spark, str(tmp_path / "wh"), near_threshold=0.8)
    store.append(spark.createDataFrame(
        [(1, base), (2, "totally different words entirely here now ok")],
        "doc_id long, text string"))

    b = store.broker
    # index leaves mirror the corpus epoch; one hash row per doc, one
    # band row per (doc, band)
    assert store._epoch_values(HASH_TABLE) == {1}
    assert store._epoch_values(BANDS_TABLE) == {1}
    assert b.read(HASH_TABLE).count() == 2
    assert b.read(BANDS_TABLE).count() == 16   # 2 docs x 8 bands
    import hashlib
    md5s = {r.doc_id: r.text_md5 for r in b.read(HASH_TABLE).collect()}
    assert md5s[1] == hashlib.md5(base.encode()).hexdigest()

    # crash window: the corpus gains an epoch the index never saw
    # (exactly what a crash between the corpus flip and the side-table
    # flips leaves behind)
    ghost = "some entirely novel sentence that was never indexed at all"
    b.write_partition_append(
        DOCS_TABLE,
        spark.createDataFrame([(50, ghost)], "doc_id long, text string"),
        "ingest_epoch", 2,
    )
    assert store._epoch_values(DOCS_TABLE) == {1, 2}
    assert store._epoch_values(HASH_TABLE) == {1}  # stale

    # the next append self-heals the index AND catches dups of the
    # un-indexed doc through it — near first (batch checks would
    # otherwise collapse an exact+near pair within the batch)
    out = store.append(spark.createDataFrame(
        [(61, ghost + " extra"),            # near dup of the ghost
         (62, "fresh content sharing nothing with anything else")],
        "doc_id long, text string"))
    assert out["admitted"] == 1
    assert store._epoch_values(HASH_TABLE) == {1, 2, 3}
    out_exact = store.append(spark.createDataFrame(
        [(60, ghost)], "doc_id long, text string"))  # exact dup of ghost
    assert out_exact["admitted"] == 0
    reasons = {(r.doc_id, r.reason, r.blocked_by)
               for r in store.rejections().collect()}
    assert (60, "archive_exact", 50) in reasons
    assert (61, "archive_near", 50) in reasons

    # lost side table: full rebuild on the next append, dedup intact
    shutil.rmtree(os.path.join(str(tmp_path / "wh"), BANDS_TABLE))
    out2 = store.append(spark.createDataFrame(
        [(70, base + " extra2")],           # near dup vs epoch-1 doc 1
        "doc_id long, text string"))
    assert out2 == {"admitted": 0, "rejected": 1, "version": 5}
    # rebuilt index covers exactly the corpus content (empty epochs —
    # zero-admission appends — legitimately have no index leaf)
    assert store.broker.read(BANDS_TABLE).count() == 8 * store.read().count()
    assert (70, "archive_near", 1) in {
        (r.doc_id, r.reason, r.blocked_by)
        for r in store.rejections().collect()}


def test_corpus_append_rejects_schema_drift(spark, tmp_path):
    """The epoch-leaf write would silently accept a batch whose columns
    diverge from the archive (the pre-epoch unionByName write threw) —
    a mixed-schema table breaks reads long after the offending append,
    so the mismatch must fail loudly upfront."""
    from weatherdb_spark.llm.corpus import CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    store.append(spark.createDataFrame(
        [(1, "first words here")], "doc_id long, text string"))
    drifted = spark.createDataFrame(
        [(2, "second words", "s1")], "doc_id long, text string, source string")
    with pytest.raises(ValueError, match="schema mismatch"):
        store.append(drifted)
    narrowed = spark.createDataFrame([(3,)], "doc_id long")
    with pytest.raises(ValueError, match="schema mismatch"):
        store.append(narrowed)
    assert store.read().count() == 1  # nothing leaked into the corpus


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


def test_corpus_append_null_text_is_replay_idempotent(spark, tmp_path):
    """md5(NULL) is NULL: a plain equi-join would let NULL-text docs
    bypass every dedup layer, re-admitting them on each foreachBatch
    replay. The null-safe hash join keeps replays idempotent."""
    from weatherdb_spark.llm.corpus import CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    b = spark.createDataFrame(
        [(1, None, "s1"), (2, "real words in here now", "s1")],
        "doc_id long, text string, source string",
    )
    assert store.append(b)["admitted"] == 2
    replay = store.append(b)          # foreachBatch replay of the batch
    assert replay["admitted"] == 0 and replay["rejected"] == 2
    assert store.read().count() == 2  # the corpus did not grow


def test_corpus_read_epochs_prunes_partitions(spark, tmp_path):
    """read_epochs carries a STATIC ingest_epoch IN predicate, so the
    parquet scan lists only the asked epochs' leaves (PartitionFilters)
    — the mechanism that keeps append's exact-Jaccard verify
    O(candidate epochs), closing the last O(corpus) append leg."""
    import re

    from weatherdb_spark.llm.corpus import CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet white black gray",
    ]
    for i, t in enumerate(texts):
        store.append(spark.createDataFrame(
            [(i, t)], "doc_id long, text string"))
    assert sorted(store._epoch_values("corpus_documents")) == [1, 2, 3]

    df = store.read_epochs([2])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "ingest_epoch" in pf, plan
    assert [r.doc_id for r in df.collect()] == [1]
    # empty epoch list -> zero rows, documents' own schema
    assert store.read_epochs([]).count() == 0
    assert "ingest_epoch" not in store.read_epochs([]).columns


def test_corpus_read_epochs_raises_on_legacy_flat_layout(spark, tmp_path):
    import pytest as _pytest

    from weatherdb_spark.llm.corpus import DOCS_TABLE, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    # a pre-epoch engine wrote the corpus flat (no partition leaves)
    store.broker.write(DOCS_TABLE, spark.createDataFrame(
        [(1, "legacy words here")], "doc_id long, text string"))
    with _pytest.raises(ValueError, match="not epoch-partitioned"):
        store.read_epochs([0])


def test_corpus_near_verify_rejections_identical_across_epochs(spark, tmp_path):
    """The epoch-pruned candidate text read must not change WHAT gets
    rejected: near-dups of docs living in different (non-adjacent)
    epochs are still verified and blocked by the right resident. Five
    archive epochs so the EPOCH_PRUNE_MIN gate is OPEN and the pruned
    path actually runs (fewer epochs take the plain read)."""
    from weatherdb_spark.llm.corpus import EPOCH_PRUNE_MIN, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"), near_threshold=0.8)
    t1 = "the quick brown fox jumps over the lazy dog by the river today"
    t2 = "completely different content about mountains snow and winter air"
    fillers = [
        "unrelated third epoch filler words beyond any overlap",
        "fourth epoch padding sentence with its very own vocabulary",
        "fifth epoch content again sharing no shingles with anyone",
    ]
    store.append(spark.createDataFrame([(1, t1)], "doc_id long, text string"))
    store.append(spark.createDataFrame([(2, t2)], "doc_id long, text string"))
    for i, t in enumerate(fillers):
        store.append(spark.createDataFrame(
            [(3 + i, t)], "doc_id long, text string"))
    assert len(store._epoch_values("corpus_documents")) > EPOCH_PRUNE_MIN
    # one batch with near-dups of epoch-1 AND epoch-2 residents plus a
    # fresh doc: the verify must fetch texts from BOTH candidate epochs
    batch = spark.createDataFrame(
        [(10, t1 + " extra"), (11, t2 + " extra"),
         (12, "genuinely novel words nothing shares any shingle with")],
        "doc_id long, text string")
    res = store.append(batch)
    assert res == {"admitted": 1, "rejected": 2, "version": 6}
    reasons = {(r.doc_id, r.reason, r.blocked_by)
               for r in store.rejections().collect()
               if r.doc_id in (10, 11, 12)}
    assert reasons == {(10, "archive_near", 1), (11, "archive_near", 2)}


def _unit_vec(seed: int, dim: int = 64, jitter: float = 0.0):
    """Deterministic 64-dim unit vector; jitter rotates it slightly so
    two vectors at the same seed are near- (not exactly) identical."""
    import math
    import random

    rng = random.Random(seed)
    v = [rng.uniform(-1, 1) for _ in range(dim)]
    if jitter:
        v = [x + jitter * ((i % 2) * 2 - 1) for i, x in enumerate(v)]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def test_corpus_semantic_dedup_at_append(spark, tmp_path):
    """The embedding_col= archive check: a paraphrase (different text,
    near-identical embedding) sails past exact AND MinHash text dedup
    but is rejected archive_semantic with the blocking resident named;
    distant embeddings and NULL embeddings are admitted."""
    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import EMB_TABLE, CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    store = CorpusStore(spark, str(tmp_path / "wh"),
                        semantic_threshold=0.98)
    base = spark.createDataFrame(
        [(1, "the original phrasing of a very particular idea",
          _unit_vec(7)),
         (2, "an unrelated second document about other matters",
          _unit_vec(99))],
        schema,
    )
    assert store.append(base, embedding_col="embedding") == {
        "admitted": 2, "rejected": 0, "version": 1}
    assert store.broker.exists(EMB_TABLE)

    b2 = spark.createDataFrame(
        [(10, "a completely rewritten paraphrase sharing no words",
          _unit_vec(7, jitter=0.001)),       # near-identical to doc 1
         (11, "fresh content with a genuinely new embedding",
          _unit_vec(1234)),                  # far from both
         (12, "a doc with no embedding at all skips the check", None)],
        schema,
    )
    res = store.append(b2, embedding_col="embedding")
    assert res == {"admitted": 2, "rejected": 1, "version": 2}
    rej = {(r.doc_id, r.reason, r.blocked_by)
           for r in store.rejections().collect()}
    assert rej == {(10, "archive_semantic", 1)}
    assert {r.doc_id for r in store.read().collect()} == {1, 2, 11, 12}

    # the opt-in is STICKY (a store property, not a per-append flag):
    # an append WITHOUT the argument still maintains the index and
    # runs the check against the recorded column
    b3 = spark.createDataFrame(
        [(20, "another paraphrase and nobody re-passed the flag",
          _unit_vec(7, jitter=0.002))], schema)
    res3 = store.append(b3)
    assert res3["admitted"] == 0 and res3["rejected"] == 1
    blocked = {r.blocked_by for r in store.rejections().collect()
               if r.doc_id == 20}
    assert blocked == {1}  # min archived id among the colliding refs
    # a genuinely new embedding is still admitted without the flag
    b4 = spark.createDataFrame(
        [(30, "fresh late arrival with its very own vector",
          _unit_vec(777))], schema)
    assert store.append(b4)["admitted"] == 1
    # a DIFFERENT column name later is refused: the stored bucket keys
    # are one vector space
    import pytest as _pytest
    with _pytest.raises(ValueError, match="semantic spaces"):
        store.append(b4, embedding_col="other")


def test_corpus_semantic_side_table_self_heals(spark, tmp_path):
    """A lost embedding-bucket side table rebuilds from the archived
    docs on the next embedding-carrying append — same self-healing
    contract as the text signature tables."""
    import shutil

    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import EMB_TABLE, CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    store = CorpusStore(spark, str(tmp_path / "wh"),
                        semantic_threshold=0.98)
    store.append(spark.createDataFrame(
        [(1, "first words here", _unit_vec(5))], schema),
        embedding_col="embedding")
    shutil.rmtree(store.broker.path(EMB_TABLE))
    assert not store.broker.exists(EMB_TABLE)

    dup = spark.createDataFrame(
        [(9, "no shared words at all", _unit_vec(5, jitter=0.001))], schema)
    res = store.append(dup, embedding_col="embedding")
    assert res == {"admitted": 0, "rejected": 1, "version": 2}
    assert store.broker.exists(EMB_TABLE)


def test_corpus_compact_epochs_folds_embedding_side_table(spark, tmp_path):
    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import EMB_TABLE, CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    store = CorpusStore(spark, str(tmp_path / "wh"))
    for i in range(4):
        store.append(spark.createDataFrame(
            [(i, f"unique doc number {i} of its own words",
              _unit_vec(i * 31 + 1))], schema),
            embedding_col="embedding")
    assert sorted(store._epoch_values(EMB_TABLE)) == [1, 2, 3, 4]
    res = store.compact_epochs(keep_last=1)
    assert res["folded"] == 3 and res["into_epoch"] == 3
    assert sorted(store._epoch_values(EMB_TABLE)) == [3, 4]
    # index content unchanged: a near-copy of the OLDEST doc (now in
    # the folded leaf) is still rejected semantically
    dup = spark.createDataFrame(
        [(50, "rephrased without shared vocabulary", _unit_vec(1, jitter=0.001))],
        schema)
    store2 = CorpusStore(spark, str(tmp_path / "wh"),
                         semantic_threshold=0.98)
    res2 = store2.append(dup, embedding_col="embedding")
    assert res2["admitted"] == 0 and res2["rejected"] == 1


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


def test_corpus_clean_append_skips_rejection_snapshot(spark, tmp_path):
    """A clean append (nothing rejected) skips the rejection-log write
    — an empty leaf carries no audit information and the snapshot flip
    is pure fixed overhead on the small-append floor. The FIRST append
    still creates the log (rejections() contract), and a rejecting
    append still snapshots it."""
    from weatherdb_spark.llm.corpus import REJ_TABLE, CorpusStore

    store = CorpusStore(spark, str(tmp_path / "wh"))
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    store.append(mk([(1, "first words of their own kind")]))
    assert store.broker.exists(REJ_TABLE)       # created by append 1
    v1 = store.broker.table_version(REJ_TABLE)
    assert store.rejections().count() == 0

    store.append(mk([(2, "second unrelated set of words")]))
    assert store.broker.table_version(REJ_TABLE) == v1  # clean: skipped

    res = store.append(mk([(3, "first words of their own kind")]))
    assert res["rejected"] == 1
    assert store.broker.table_version(REJ_TABLE) == v1 + 1
    assert {(r.doc_id, r.reason) for r in store.rejections().collect()} \
        == {(3, "archive_exact")}


def test_corpus_image_dedup_at_append(spark, tmp_path):
    """The image_col= archive check: a re-encoded image (same gradient
    structure, different bytes AND different caption text) sails past
    every text layer but is rejected archive_image; a genuinely
    different image and a NULL payload are admitted. The opt-in is
    sticky like the semantic one."""
    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import IMG_TABLE, CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("image", T.BinaryType()),
    ])
    base = bytes(range(72))                      # rising gradient grid
    reenc = bytes(v + 50 for v in range(72))     # same comparisons
    other = bytes(reversed(range(72)))           # inverted gradient
    store = CorpusStore(spark, str(tmp_path / "wh"))
    store.append(spark.createDataFrame(
        [(1, "original caption words here", bytearray(base))], schema),
        image_col="image")
    assert store.broker.exists(IMG_TABLE)

    b2 = spark.createDataFrame(
        [(10, "totally different caption no shared words",
          bytearray(reenc)),
         (11, "another caption for a different picture",
          bytearray(other)),
         (12, "a doc with no image at all", None)],
        schema,
    )
    res = store.append(b2)   # sticky: no flag re-passed
    assert res == {"admitted": 2, "rejected": 1, "version": 2}
    rej = {(r.doc_id, r.reason, r.blocked_by)
           for r in store.rejections().collect()}
    assert rej == {(10, "archive_image", 1)}
    # renaming the image column later is refused
    import pytest as _pytest
    with _pytest.raises(ValueError, match="image"):
        store.append(b2, image_col="text")


def test_corpus_image_side_table_self_heals_and_folds(spark, tmp_path):
    import shutil

    from pyspark.sql import types as T

    from weatherdb_spark.llm.corpus import IMG_TABLE, CorpusStore

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("image", T.BinaryType()),
    ])
    import random

    store = CorpusStore(spark, str(tmp_path / "wh"))
    # pseudo-random payloads: distinct gradient structures, so the
    # three fingerprints sit ~32 bits apart (a shared monotone gradient
    # would give every payload the same all-ones dHash)
    payloads = [random.Random(i).randbytes(72) for i in range(3)]
    for i in range(3):
        res_i = store.append(spark.createDataFrame(
            [(i, f"caption number {i} all its own",
              bytearray(payloads[i]))],
            schema), image_col="image")
        assert res_i["admitted"] == 1
    # lost side table rebuilds on the next append (sync diff)...
    shutil.rmtree(store.broker.path(IMG_TABLE))
    dup = spark.createDataFrame(
        [(9, "no words in common with anything",
          bytearray(payloads[0]))], schema)
    res = store.append(dup)
    assert res == {"admitted": 0, "rejected": 1, "version": 4}
    assert store.broker.exists(IMG_TABLE)
    # ... and compaction folds the image table with its siblings
    folded = store.compact_epochs(keep_last=1)
    assert folded["folded"] >= 2
    assert sorted(store._epoch_values(IMG_TABLE))[-1] == \
        max(store._epoch_values("corpus_documents"))
