"""Per-bucket resident caps for the batch LSH candidate generators.

The streaming near-dup twins bound hot-bucket state with
``max_bucket_docs``; these gates prove the batch paths now carry the
same knob: an adversarial all-identical corpus (every document lands in
ONE bucket — the degenerate case a dedup corpus approaches by
definition) produces a candidate set linear in the corpus instead of
quadratic, the truncation is deterministic (smallest ids are the
residents), and a cap that never engages leaves results bit-identical
to the uncapped plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from weatherdb_spark.llm.bucketing import bucket_overflow, cap_bucket_residents
from weatherdb_spark.llm.dedup import minhash_lsh_pairs
from weatherdb_spark.llm.similarity import cosine_pairs_lsh, lsh_bucket_topk
from weatherdb_spark.sources.testdata import load

N_DEGEN = 40
CAP = 4
# residents are the CAP smallest ids; a pair survives iff its smaller id
# is a resident, so the degenerate corpus yields sum_{r<CAP}(N-1-r) pairs
EXPECTED_CAPPED = sum(N_DEGEN - 1 - r for r in range(CAP))
EXPECTED_UNCAPPED = N_DEGEN * (N_DEGEN - 1) // 2


def _identical_docs(spark, n=N_DEGEN):
    return spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and again")
         for i in range(n)],
        "doc_id long, text string",
    )


def _identical_vectors(spark, n=N_DEGEN, start=0):
    vec = [float(j % 7) - 3.0 for j in range(64)]
    return spark.createDataFrame(
        [(start + i, vec) for i in range(n)],
        "vec_id long, embedding array<float>",
    )


def test_minhash_cap_bounds_degenerate_corpus(spark):
    docs = _identical_docs(spark)
    capped = minhash_lsh_pairs(docs, threshold=0.8, max_bucket_docs=CAP)
    uncapped = minhash_lsh_pairs(docs, threshold=0.8)
    assert uncapped.count() == EXPECTED_UNCAPPED
    rows = capped.collect()
    assert len(rows) == EXPECTED_CAPPED
    # every surviving pair's smaller id is a resident (one of the CAP
    # smallest ids) — the deterministic truncation rule
    assert all(r.id_a < CAP for r in rows)


def test_cosine_lsh_cap_bounds_degenerate_corpus(spark):
    emb = _identical_vectors(spark)
    capped = cosine_pairs_lsh(emb, threshold=0.4, max_bucket_docs=CAP)
    uncapped = cosine_pairs_lsh(emb, threshold=0.4)
    assert uncapped.count() == EXPECTED_UNCAPPED
    rows = capped.collect()
    assert len(rows) == EXPECTED_CAPPED
    assert all(r.id_a < CAP and r.cos == 1.0 for r in rows)


def test_lsh_topk_cap_restricts_neighbors_to_residents(spark):
    # corpus ids 0..39 all identical; query ids 1000.. share the vector,
    # so uncapped every corpus doc is a perfect-cosine candidate — capped,
    # only the CAP smallest corpus ids can ever be returned
    corpus = _identical_vectors(spark)
    queries = _identical_vectors(spark, n=3, start=1000)
    out = lsh_bucket_topk(
        corpus, queries, k=10, max_bucket_docs=CAP
    ).collect()
    assert out, "capped top-k returned nothing"
    assert {r.neighbor_id for r in out} <= set(range(CAP))
    per_query = {}
    for r in out:
        per_query.setdefault(r.query_id, []).append(r)
    for q, rs in per_query.items():
        assert len(rs) <= CAP


def test_hamming_cap_bounds_degenerate_fingerprints(spark):
    """hamming_pairs_exact carries the same opt-in resident cap (round
    9): a degenerate fingerprint population (every payload hashing to
    ONE value — e.g. all-empty images on the dHash path) collapses
    into one (block, key) bucket per block and the pigeonhole join
    inside it goes quadratic; the cap bounds it with the standard
    smaller-id-resident rule, and the default stays uncapped/recall-1."""
    from weatherdb_spark.llm.dedup import hamming_pairs_exact

    # a negative (bit-63) int64 — the image-family shape, exercising
    # the unsigned-mask block keys under the cap
    fp = spark.createDataFrame(
        [(i, -(2 ** 63) + 12345) for i in range(N_DEGEN)],
        "doc_id long, dhash long",
    )
    uncapped = hamming_pairs_exact(fp, "dhash", 6, bits=64)
    assert uncapped.count() == EXPECTED_UNCAPPED
    rows = hamming_pairs_exact(
        fp, "dhash", 6, bits=64, max_bucket_docs=CAP
    ).collect()
    assert len(rows) == EXPECTED_CAPPED
    assert all(r.id_a < CAP and r.hamming == 0 for r in rows)


def test_large_cap_never_engages_results_identical(spark):
    """A cap above every bucket population must leave both pipelines
    bit-identical to the uncapped plan — the default-path safety gate."""
    docs = load(spark, SF_DIR, "documents")
    base = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    capped = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(
            docs, threshold=0.8, max_bucket_docs=1_000_000
        ).collect()
    }
    assert base == capped and base

    emb = load(spark, SF_DIR, "embeddings")
    base_e = {
        (r.id_a, r.id_b, r.cos)
        for r in cosine_pairs_lsh(emb, threshold=0.4).collect()
    }
    capped_e = {
        (r.id_a, r.id_b, r.cos)
        for r in cosine_pairs_lsh(
            emb, threshold=0.4, max_bucket_docs=1_000_000
        ).collect()
    }
    assert base_e == capped_e and base_e


def test_bucket_overflow_report(spark):
    bucketed = spark.createDataFrame(
        [("t0", "hot", i) for i in range(10)]
        + [("t0", "cold", i) for i in range(3)],
        "band string, key string, doc_id long",
    )
    hot = bucket_overflow(bucketed, ["band", "key"], cap=4).collect()
    assert len(hot) == 1
    assert hot[0].key == "hot"
    assert hot[0].n_docs == 10 and hot[0].n_denied == 6
    # cap above every population: empty report == cap never engaged
    assert not bucket_overflow(bucketed, ["band", "key"], cap=16).collect()


def test_cap_resident_selection_is_deterministic(spark):
    bucketed = spark.createDataFrame(
        [("t0", "hot", i) for i in (9, 3, 7, 1, 5, 0)],
        "band string, key string, doc_id long",
    ).repartition(8)
    kept = cap_bucket_residents(bucketed, ["band", "key"], "doc_id", 3)
    assert sorted(r.doc_id for r in kept.collect()) == [0, 1, 3]


def test_cap_validation(spark):
    docs = _identical_docs(spark, n=4)
    with pytest.raises(ValueError, match="max_bucket_docs"):
        minhash_lsh_pairs(docs, max_bucket_docs=0).collect()


def test_pipeline_overflow_companions(spark):
    """The 'no silent caps' contract must be REACHABLE: the pipelines'
    bucketed streams are internal, so each exposes a companion that
    rebuilds the identical stream and reports the denied counts."""
    from weatherdb_spark.llm.dedup import minhash_bucket_overflow
    from weatherdb_spark.llm.similarity import cosine_bucket_overflow

    docs = _identical_docs(spark)
    hot = minhash_bucket_overflow(docs, cap=CAP).collect()
    # all 8 bands collapse to one hot bucket each for an identical corpus
    assert len(hot) == 8
    assert all(r.n_docs == N_DEGEN and r.n_denied == N_DEGEN - CAP for r in hot)

    emb = _identical_vectors(spark)
    hot_e = cosine_bucket_overflow(emb, cap=CAP).collect()
    assert len(hot_e) == 16  # one hot bucket per hyperplane table
    assert all(r.n_docs == N_DEGEN and r.n_denied == N_DEGEN - CAP for r in hot_e)

    # a cap above every population reports nothing
    assert not minhash_bucket_overflow(docs, cap=N_DEGEN).collect()


def test_cap_monotonicity_on_random_corpus(spark):
    """On a NON-degenerate corpus: capped results are a subset of the
    uncapped pair set, and a larger cap can only add pairs (monotone in
    the knob) — the semantics a tuner relies on when raising the cap."""
    import random

    rng = random.Random(11)
    words = [f"w{i}" for i in range(30)]
    bases = [
        [rng.choice(words) for _ in range(25)] for _ in range(10)
    ]
    rows = []
    for i in range(60):  # 6 mutated copies per base: high intra-cluster
        tokens = list(bases[i % 10])  # Jaccard, varied bucket sizes
        for _ in range(2):
            tokens[rng.randrange(len(tokens))] = rng.choice(words)
        rows.append((i, " ".join(tokens)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sets = {
        cap: {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(
                docs, threshold=0.3, max_bucket_docs=cap
            ).collect()
        }
        for cap in (2, 8, None)
    }
    assert sets[None], "degenerate fixture: no uncapped pairs"
    assert sets[2] <= sets[8] <= sets[None]


def test_contamination_cap_bounds_reference_side(spark):
    """minhash_contamination caps the REFERENCE side per bucket: with an
    all-identical reference, a corpus doc matches only the CAP smallest
    reference ids instead of the whole clump."""
    from weatherdb_spark.llm.dedup import minhash_contamination

    corpus = _identical_docs(spark, n=3)
    reference = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog again and again")
         for i in range(20)],
        "doc_id long, text string",
    )
    capped = minhash_contamination(
        corpus, reference, threshold=0.8, max_bucket_docs=CAP
    ).collect()
    assert {r.ref_id for r in capped} == set(range(100, 100 + CAP))
    assert len(capped) == 3 * CAP
    uncapped = minhash_contamination(corpus, reference, threshold=0.8)
    assert uncapped.count() == 3 * 20


def test_semantic_dedup_forwards_cap_and_groups_stay_correct(spark):
    """The SemDeDup composition forwards max_bucket_docs to its pair
    stage: a degenerate all-identical corpus still resolves into ONE
    group with the smallest-id representative, because every capped
    pair keeps its smaller id a resident (the chain 0-1, 0-2, ... stays
    connected through the representative)."""
    from weatherdb_spark.llm.similarity import semantic_dedup

    vec = [1.0] + [0.0] * 63
    df = spark.createDataFrame(
        [(i, vec) for i in range(12)], "vec_id long, embedding array<float>"
    )
    out = semantic_dedup(df, threshold=0.99, planes=2, n_tables=4,
                         max_bucket_docs=2).collect()
    assert {r.vec_id for r in out} == set(range(12))
    assert all(r.component_id == 0 for r in out)
    assert [r.vec_id for r in out if r.is_kept] == [0]
    assert all(r.group_size == 12 for r in out)
