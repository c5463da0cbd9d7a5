"""Registry bindings for the LLM training-data pipeline operators over the
``documents`` and ``embeddings`` tables.

Hashing in oracles mirrors weatherdb_spark.llm.hashing: 60 bits of md5
parsed as int64 — identical in Spark (conv) and DuckDB ('0x'||hex cast).
Cosine oracles use list_cosine_similarity on DOUBLE[] which matches the
engine's sequential-double-fold bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weatherdb_spark.llm.hashing import md5_int64_sql
from weatherdb_spark.plans.registry import _register, _register_extra, load

# word-3-gram distinct shingles per doc (DuckDB list comprehension)
_SHINGLES_SQL = """
    sh AS (
        SELECT doc_id,
               unnest(list_distinct([
                   w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                   for i in range(1, len(w) - 1)
               ])) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 3
    )
"""


# --------------------------------------------------------------------------
# Dedup: exact
# --------------------------------------------------------------------------

@_register(
    "dedup_exact",
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
    g AS (SELECT hh, min(doc_id) AS keep, count(*) AS group_size FROM h GROUP BY 1)
    SELECT h.doc_id, g.group_size, h.doc_id = g.keep AS is_kept
    FROM h JOIN g USING (hh)
    """,
    doc="Exact dedup on content hash: one shuffle on md5(text), smallest "
        "id per group kept.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.dedup import exact_dedup

    return exact_dedup(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Dedup: n-gram Jaccard (inverted-index exact pairs)
# --------------------------------------------------------------------------

@_register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
    """,
    doc="n-gram Jaccard near-dup pairs via inverted shingle index "
        "(word 3-grams, threshold 0.8).",
    bench=True,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.dedup import jaccard_pairs

    return jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.8, n=3)


# --------------------------------------------------------------------------
# Dedup: MinHash + LSH banding, exact-verified
# --------------------------------------------------------------------------

def _minhash_oracle(num_perm: int = 32, threshold: float = 0.8) -> str:
    """Oracle = ground-truth exact Jaccard pairs >= threshold. The LSH
    pipeline must find them all (recall ~1 at s >= 0.8 with 8 bands x 4
    rows); a mismatch here means the banding lost a true pair."""
    return f"""
    WITH {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= {threshold}
    """


def _minhash_mirrored_capped_oracle(
    num_perm: int = 32, bands: int = 8, cap: int = 2, threshold: float = 0.8
) -> str:
    """MIRRORED-pipeline oracle for the capped MinHash run: unlike
    ``_minhash_oracle`` (ground-truth pairs, valid because uncapped LSH
    has recall ~1 at 0.8+), a cap deliberately DROPS pairs, so the
    oracle must reproduce signature -> bands -> per-bucket rank ->
    resident filter -> exact verify exactly. md5/permutation formulas
    come from the shared hashing twins, so values hash-match
    bit-for-bit."""
    from weatherdb_spark.llm.hashing import md5_int64_sql, minhash_perm_sql

    rows = num_perm // bands
    h = md5_int64_sql("s")
    mins = ", ".join(
        f"min({minhash_perm_sql('hv', k)}) AS m{k}" for k in range(num_perm)
    )
    key_cases = " ".join(
        "WHEN {b} THEN {expr}".format(
            b=b,
            expr=" || '-' || ".join(
                f"CAST(m{b * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    return f"""
    WITH {_SHINGLES_SQL},
    h AS (SELECT doc_id, {h} AS hv FROM sh),
    sig AS (SELECT doc_id, {mins} FROM h GROUP BY 1),
    banded AS (
        SELECT doc_id, b.band, CASE b.band {key_cases} END AS key
        FROM sig CROSS JOIN (SELECT unnest(range(0, {bands})) AS band) b
    ),
    ranked AS (
        SELECT doc_id, band, key,
               row_number() OVER (PARTITION BY band, key
                                  ORDER BY doc_id) AS rk
        FROM banded
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ranked a JOIN banded b USING (band, key)
        WHERE a.doc_id < b.doc_id AND a.rk <= {cap}
    ),
    lists AS (SELECT doc_id, list(s) AS ls FROM sh GROUP BY 1)
    SELECT id_a, id_b,
           round(len(list_intersect(la.ls, lb.ls)) * 1.0
                 / len(list_distinct(la.ls || lb.ls)), 6) AS jaccard
    FROM cand
    JOIN lists la ON la.doc_id = id_a
    JOIN lists lb ON lb.doc_id = id_b
    WHERE len(list_intersect(la.ls, lb.ls)) * 1.0
          / len(list_distinct(la.ls || lb.ls)) >= {threshold}
    """


@_register_extra(
    "dedup_minhash_lsh_capped",
    oracle=_minhash_mirrored_capped_oracle(cap=2),
    doc="dedup_minhash_lsh with the per-bucket resident cap engaged "
        "(max_bucket_docs=2, low enough to truncate real duplicate "
        "clusters in the fixture): a pair survives iff some band keeps "
        "it with the smaller id among that bucket's first 2 residents. "
        "Unlike the uncapped entry (ground-truth oracle, recall ~1), "
        "the oracle here MIRRORS the whole signature/band/rank/cap/"
        "verify pipeline in SQL, so the truncated pair set itself is "
        "hash-checked — the dedup twin of "
        "embedding_cosine_pairs_lsh_capped.",
)
def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        load(spark, sf_dir, "documents"), threshold=0.8, num_perm=32,
        bands=8, max_bucket_docs=2,
    )


@_register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle(),
    doc="MinHash(32) + LSH(8 bands x 4 rows) candidate pairs, "
        "exact-Jaccard verified at 0.8 — oracle is the ground-truth pair "
        "set, so this also checks LSH recall.",
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        load(spark, sf_dir, "documents"), threshold=0.8, num_perm=32, bands=8
    )


# --------------------------------------------------------------------------
# Cross-corpus contamination (test-set decontamination)
# --------------------------------------------------------------------------

#: the synthetic eval set: every 7th document's text under fresh ids —
#: the realistic decontamination shape (an eval set drawn from data the
#: corpus also ingested). The fixture has no byte-identical duplicate
#: PAIRS, so a parity split would make the exact check vacuously 0-row.
_REF_SQL = """
    ref AS (SELECT doc_id + 10000 AS ref_id, text
            FROM documents WHERE doc_id % 7 = 0)
"""


def _eval_reference(docs: DataFrame) -> DataFrame:
    return docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )


@_register_extra(
    "decontaminate_exact",
    oracle=f"""
    WITH {_REF_SQL},
    c AS (SELECT doc_id, md5(text) AS h FROM documents),
    r AS (SELECT md5(text) AS h, min(ref_id) AS ref_id FROM ref GROUP BY 1)
    SELECT c.doc_id, r.ref_id FROM c JOIN r USING (h)
    """,
    doc="Exact test-set decontamination: corpus docs byte-identical to a "
        "reference (eval-set) doc — one md5 shuffle per side, smallest "
        "matching reference id per corpus doc. The reference is every "
        "7th document's text under fresh ids (the fixture has no "
        "cross-doc exact duplicates, so a corpus split would be a "
        "vacuous 0-row check). EXTRA: shares the md5-hash machinery "
        "dedup_exact checks officially.",
)
def decontaminate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.dedup import exact_contamination

    docs = load(spark, sf_dir, "documents")
    return exact_contamination(docs, _eval_reference(docs))


@_register_extra(
    "decontaminate_minhash",
    oracle=f"""
    WITH {_REF_SQL},
    {_SHINGLES_SQL},
    rsh AS (
        SELECT ref_id,
               unnest(list_distinct([
                   w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                   for i in range(1, len(w) - 1)
               ])) AS s
        FROM (SELECT ref_id, string_split(text, ' ') AS w FROM ref)
        WHERE len(w) >= 3
    ),
    csizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    rsizes AS (SELECT ref_id, count(*) AS n FROM rsh GROUP BY 1),
    common AS (
        SELECT c.doc_id AS doc_id, r.ref_id AS ref_id, count(*) AS cnt
        FROM sh c JOIN rsh r ON c.s = r.s
        GROUP BY 1, 2
    )
    SELECT common.doc_id AS doc_id, common.ref_id AS ref_id,
           round(cnt * 1.0 / (sc.n + sr.n - cnt), 6) AS jaccard
    FROM common
    JOIN csizes sc ON sc.doc_id = common.doc_id
    JOIN rsizes sr ON sr.ref_id = common.ref_id
    WHERE cnt * 1.0 / (sc.n + sr.n - cnt) >= 0.8
    """,
    doc="Near-duplicate test-set decontamination: corpus docs within 0.8 "
        "word-3-gram Jaccard of any reference (eval-set) doc — the "
        "asymmetric MinHash-LSH join (corpus bands x reference bands; "
        "reference side broadcastable at eval-set size), exact-verified. "
        "Oracle is the ground-truth cross-corpus pair set, so this also "
        "checks the banding's recall. EXTRA: shares the signature/band/"
        "verify machinery dedup_minhash_lsh checks officially.",
)
def decontaminate_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.dedup import minhash_contamination

    docs = load(spark, sf_dir, "documents")
    return minhash_contamination(docs, _eval_reference(docs), threshold=0.8)


# --------------------------------------------------------------------------
# Dedup: SimHash fingerprints
# --------------------------------------------------------------------------

_H_TOK = md5_int64_sql("t.w")

@_register_extra(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    bits AS (
        -- bit shifts, not division: the 60-bit hash exceeds double precision
        SELECT t.doc_id, b.i,
               sum(((({_H_TOK}) >> b.i::INT) % 2) * 2 - 1) AS s
        FROM toks t CROSS JOIN (SELECT unnest(range(0, 32)) AS i) b
        GROUP BY 1, 2
    )
    SELECT doc_id,
           sum(CASE WHEN s > 0 THEN (1::BIGINT << i::INT) ELSE 0 END)::BIGINT AS simhash
    FROM bits GROUP BY 1
    """,
    doc="SimHash(32) token-frequency-weighted fingerprint per document. "
        "EXTRA: the fingerprint stage is re-verified inside "
        "dedup_simhash_exact (its pairs hash over the same simhash64).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.dedup import simhash

    return simhash(load(spark, sf_dir, "documents"), bits=32)


# --------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k (+ embedding near-dup pairs)
# --------------------------------------------------------------------------

@_register(
    "ann_brute_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 8),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS c
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, round(c, 6) AS cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY c DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT * FROM ranked WHERE rank <= 5
    """,
    doc="Brute-force cosine top-5 per query vector (queries = vec_id < 8) "
        "— exact ANN baseline over the embeddings table.",
    bench=True,
)
def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.similarity import brute_topk

    emb = load(spark, sf_dir, "embeddings")
    return brute_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)


@_register(
    "embedding_cosine_pairs_lsh",
    oracle="""
    WITH signs AS (
        SELECT g.p AS plane,
               list_transform(range(0, 64),
                 i -> CASE WHEN ((g.p*64 + i) * 2654435761) % 4294967296
                                < 2147483648
                      THEN 1.0 ELSE -1.0 END) AS svec
        FROM range(0, 48) g(p)
    ),
    bits AS (
        SELECT v.vec_id, s.plane,
               CASE WHEN list_dot_product(CAST(v.embedding AS DOUBLE[]),
                                          s.svec) >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM embeddings v CROSS JOIN signs s
    ),
    buckets AS (
        SELECT vec_id, plane // 3 AS tbl,
               CAST(SUM(bit * (1 << (plane % 3))) AS INT) AS bucket
        FROM bits GROUP BY vec_id, plane // 3
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
           round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                        CAST(eb.embedding AS DOUBLE[])), 6)
               AS cos
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                 CAST(eb.embedding AS DOUBLE[])) >= 0.4
    """,
    doc="Embedding near-dup pairs via multi-table hyperplane LSH — the "
        "scale path (one shuffle on (table, bucket); candidates only "
        "where a bucket collides in any of 16 tables; exact cosine "
        "verifies, so precision is 1). The hyperplanes are deterministic "
        "(Knuth-hash parity of (plane*dim + i)), so the oracle mirrors "
        "the identical plane/bucket/verify pipeline in SQL and the "
        "result value-hashes exactly. The O(n^2) brute baseline lives "
        "in EXTRA as embedding_cosine_pairs; a pytest gate additionally "
        "pins recall >= 0.7 vs that ground truth. Bench note: at this "
        "toy scale the 0.4 threshold is a ~66-degree angle, so LSH "
        "buckets are necessarily coarse (planes=3 keeps recall 0.89; "
        "more planes collapse it) and the exact-verify set approaches "
        "n^2 — the measured seconds are verify-bound. At production "
        "near-dup thresholds (0.8+) the collision probability drops "
        "exponentially with planes and the same plan stays near-linear.",
    bench=True,
)
def embedding_cosine_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.similarity import cosine_pairs_lsh

    return cosine_pairs_lsh(load(spark, sf_dir, "embeddings"), threshold=0.4)


@_register_extra(
    "embedding_cosine_pairs_lsh_capped",
    oracle="""
    WITH signs AS (
        SELECT g.p AS plane,
               list_transform(range(0, 64),
                 i -> CASE WHEN ((g.p*64 + i) * 2654435761) % 4294967296
                                < 2147483648
                      THEN 1.0 ELSE -1.0 END) AS svec
        FROM range(0, 48) g(p)
    ),
    bits AS (
        SELECT v.vec_id, s.plane,
               CASE WHEN list_dot_product(CAST(v.embedding AS DOUBLE[]),
                                          s.svec) >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM embeddings v CROSS JOIN signs s
    ),
    buckets AS (
        SELECT vec_id, plane // 3 AS tbl,
               CAST(SUM(bit * (1 << (plane % 3))) AS INT) AS bucket
        FROM bits GROUP BY vec_id, plane // 3
    ),
    ranked AS (
        SELECT vec_id, tbl, bucket,
               row_number() OVER (PARTITION BY tbl, bucket
                                  ORDER BY vec_id) AS rk
        FROM buckets
    ),
    coll AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.tbl, a.rk AS rk_a
        FROM ranked a JOIN ranked b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    cand AS (
        SELECT id_a, id_b FROM (
            SELECT id_a, id_b, arg_min(rk_a, tbl) AS rk_first
            FROM coll GROUP BY 1, 2
        ) WHERE rk_first <= 16
    )
    SELECT c.id_a, c.id_b,
           round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                        CAST(eb.embedding AS DOUBLE[])), 6)
               AS cos
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                 CAST(eb.embedding AS DOUBLE[])) >= 0.4
    """,
    doc="embedding_cosine_pairs_lsh with the per-bucket resident cap "
        "engaged (max_bucket_docs=16): the hot-bucket bound for "
        "adversarial duplicate-heavy corpora, where one (table, bucket) "
        "group otherwise goes quadratic. Residents are the first 16 "
        "smaller-side ids per bucket; a pair survives iff its smaller id "
        "is a resident of the FIRST table whose buckets collide — the "
        "batch twin of the streaming max_bucket_docs knob. The oracle "
        "mirrors the rank/first-table/cap pipeline exactly, so the "
        "TRUNCATED pair set itself is hash-checked, not just bounded.",
)
def embedding_cosine_pairs_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.similarity import cosine_pairs_lsh

    return cosine_pairs_lsh(
        load(spark, sf_dir, "embeddings"), threshold=0.4, max_bucket_docs=16
    )


@_register(
    "ann_ivf_recall",
    oracle="""
    SELECT vec_id AS query_id, true AS recall_ok
    FROM embeddings WHERE vec_id < 8
    """,
    doc="IVF ANN verified by recall@5 against the exact brute-force "
        "result: a DETERMINISTIC driver-side numpy k-means coarse "
        "quantizer (pyspark.ml KMeans aggregates float sums in partition "
        "order, so identical seeds gave different centroids under "
        "different partitioning and the gate flaked between "
        "environments) -> inverted file on cell id -> 7-probe scan per "
        "query. The oracle expects recall@5 >= 0.4 for EVERY query "
        "(exactly 0.4 at its tightest, but the whole path is now a pure "
        "function of (corpus, seed)); a broken index flips rows to "
        "false and hash-fails.",
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.similarity import brute_topk, ivf_topk, recall_vs_brute

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    approx = ivf_topk(emb, q, k=5, n_probe=7)
    brute = brute_topk(emb, q, k=5)
    rec = recall_vs_brute(approx, brute, q, k=5)
    return rec.select("query_id", (F.col("recall") >= 0.4).alias("recall_ok"))


@_register_extra(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    bits AS (
        SELECT t.doc_id, b.i,
               sum(((({_H_TOK}) >> b.i::INT) % 2) * 2 - 1) AS s
        FROM toks t CROSS JOIN (SELECT unnest(range(0, 32)) AS i) b
        GROUP BY 1, 2
    ),
    fp AS (
        SELECT doc_id,
               sum(CASE WHEN s > 0 THEN (1::BIGINT << i::INT) ELSE 0 END)::BIGINT AS simhash
        FROM bits GROUP BY 1
    ),
    bk AS (SELECT doc_id, simhash, simhash >> 24 AS bucket FROM fp)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
    doc="SimHash near-dup pairs: hamming distance <= 6 within top-8-bit "
        "prefix buckets — the per-bucket join is the linear-scale path. "
        "EXTRA: documented recall<1 baseline subsumed by "
        "dedup_simhash_exact's multi-index pigeonhole variant.",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.dedup import simhash_pairs

    return simhash_pairs(
        load(spark, sf_dir, "documents"), max_hamming=6, bits=32, prefix_bits=8
    ).withColumn("hamming", F.col("hamming").cast("long"))


@_register(
    "dedup_simhash_exact",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    bits AS (
        SELECT t.doc_id, b.i,
               sum(((({_H_TOK}) >> b.i::INT) % 2) * 2 - 1) AS s
        FROM toks t CROSS JOIN (SELECT unnest(range(0, 32)) AS i) b
        GROUP BY 1, 2
    ),
    fp AS (
        SELECT doc_id,
               sum(CASE WHEN s > 0 THEN (1::BIGINT << i::INT) ELSE 0 END)::BIGINT AS simhash
        FROM bits GROUP BY 1
    )
    -- BRUTE all-pairs ground truth: the oracle bucketless, so this entry
    -- verifies the multi-index candidate generation has recall 1
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
    doc="SimHash near-dup pairs, EXACT: multi-index hamming (Norouzi et "
        "al. 2012) — pigeonhole over max_hamming+1 bit blocks guarantees "
        "every qualifying pair shares a block key, so the per-block "
        "equi-join reaches recall 1 without the O(n^2) cross join. The "
        "oracle is the brute-force all-pairs ground truth.",
)
def dedup_simhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.dedup import simhash_pairs_exact

    return simhash_pairs_exact(
        load(spark, sf_dir, "documents"), max_hamming=6, bits=32
    ).withColumn("hamming", F.col("hamming").cast("long"))


@_register(
    "sample_stratified_mix",
    oracle="""
    SELECT doc_id, source, lang FROM documents
    WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 15))::BIGINT
           % 1000000)
          < CASE source WHEN 'src0' THEN 800000
                        WHEN 'src1' THEN 500000
                        WHEN 'src2' THEN 250000 END
    """,
    doc="Deterministic stratified data mix: keep 80% of src0, 50% of "
        "src1, 25% of src2, drop unlisted sources — membership is a pure "
        "function of (doc_id, salt) via the cross-engine md5 hash, so "
        "the mix is reproducible across runs/partitionings (df.sample's "
        "per-partition RNG is neither) and re-weighting a stratum keeps "
        "a superset/subset instead of resampling. Pure filter: no "
        "shuffle, rides the scan at 100 TB.",
)
def sample_stratified_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.sampling import stratified_mix

    docs = load(spark, sf_dir, "documents")
    return stratified_mix(
        docs, {"src0": 0.8, "src1": 0.5, "src2": 0.25},
        strata_col="source", salt="mix1",
    ).select("doc_id", "source", "lang")


@_register_extra(
    "text_scrub_pii",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
               text || ' contact doc' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 10.0.0.'
                    || CAST(doc_id % 256 AS VARCHAR)
                    || ' tel +4915112345678',
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\+\d{7,15}', '<PHONE>', 'g') AS text_scrubbed
    FROM documents
    """,
    doc="PII scrub: emails / IPv4 / international phone numbers redact "
        "to typed tokens via a pure JVM regexp_replace chain (no UDF — "
        "rides the scan at 100 TB). The fixture text carries no PII, so "
        "the query INJECTS a synthetic email+ip+phone per document (both "
        "sides mirror the injection) and the oracle verifies the exact "
        "redacted text. EXTRA: standalone op outside the driver's "
        "50-entry cap, full value parity in pytest.",
)
def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.text import scrub_pii

    docs = load(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"), F.lit(" contact doc"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(" tel +4915112345678"),
        ),
    )
    return scrub_pii(docs).select("doc_id", "text_scrubbed")


@_register_extra(
    "multimodal_frame_sample",
    oracle="""
    -- DuckDB has no BLOB substring: chunk the hex encoding (2 chars/byte)
    WITH p AS (SELECT doc_id, upper(hex(encode(text))) AS ph FROM documents),
    f AS (
        SELECT doc_id, ph,
               unnest(range(0, CAST(ceil(length(ph) / 128.0) AS INT))) AS frame_no
        FROM p
    )
    SELECT doc_id, frame_no,
           length(substring(ph, CAST(frame_no * 128 + 1 AS INT), 128)) // 2 AS n_bytes,
           substring(ph, CAST(frame_no * 128 + 1 AS INT), 128) AS frame_hex
    FROM f
    """,
    doc="Multimodal frame sampling plumbing: binary payload -> fixed-size "
        "frame chunks keyed (doc_id, frame_no) — the per-keyframe explode "
        "pattern of a video pipeline (frames hex'd for the oracle "
        "compare). EXTRA since round 6 (official slot ceded to "
        "sample_stratified_mix under the driver's 50-entry cap): the "
        "attach_binary_payload + chunk plumbing stays officially checked "
        "through multimodal_decode/features, and this entry keeps full "
        "value parity in pytest.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.multimodal import attach_binary_payload, frame_sample

    docs = load(spark, sf_dir, "documents")
    frames = frame_sample(attach_binary_payload(docs), every_n_bytes=64)
    return frames.select(
        "doc_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        F.length("frame_bytes").cast("long").alias("n_bytes"),
        F.upper(F.hex("frame_bytes")).alias("frame_hex"),
    )


@_register_extra(
    "embedding_cosine_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
    doc="Embedding-cosine near-duplicate pairs (threshold 0.4), brute "
        "all-pairs baseline — O(n^2) by design, the ground truth the "
        "LSH scale path (official embedding_cosine_pairs_lsh) is "
        "recall-gated against in pytest. EXTRA so the official record "
        "carries the scale-safe plan.",
)
def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.similarity import cosine_pairs

    return cosine_pairs(load(spark, sf_dir, "embeddings"), threshold=0.4)


@_register(
    "ann_lsh_recall",
    oracle="""
    SELECT count(*) AS n_queries, true AS recall_ok
    FROM embeddings WHERE vec_id < 8
    """,
    doc="Multi-table random-hyperplane LSH ANN verified by MEAN recall@5 "
        "against exact brute force (16 tables x 5 planes). The driver "
        "tables' embeddings are uniform-random — the worst case for "
        "cosine LSH (tiny similarity margins), so per-query recall "
        "fluctuates and the gate is mean recall >= 0.3 (measured "
        "0.45-0.65); a broken bucketing drops it to ~k/n and hash-fails.",
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.similarity import (
        brute_topk,
        lsh_bucket_topk,
        recall_vs_brute,
    )

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    approx = lsh_bucket_topk(emb, q, k=5, planes=5, n_tables=16)
    brute = brute_topk(emb, q, k=5)
    rec = recall_vs_brute(approx, brute, q, k=5)
    return rec.agg(
        F.count(F.lit(1)).alias("n_queries"),
        (F.avg("recall") >= 0.3).alias("recall_ok"),
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

@_register(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens_ws,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_tokens_re,
           length(text) AS n_chars_obs
    FROM documents
    """,
    doc="Token counting: whitespace tokens + BPE-ish regex token count.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.text import token_stats

    return token_stats(load(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens_ws", "n_tokens_re", "n_chars_obs"
    )


@_register(
    "text_quality_score",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, text,
               len(regexp_split_to_array(trim(text), '\s+')) AS n,
               len(list_intersect(
                   list_distinct(regexp_split_to_array(trim(text), '\s+')),
                   ['the','a','of','and','to','in','is','it'])) AS stops,
               len(regexp_extract_all(text, '[A-Za-z]')) AS alpha
        FROM documents
    )
    SELECT doc_id,
           round(
               CASE WHEN (length(text) - (n - 1)) * 1.0 / n BETWEEN 3 AND 10
                    THEN 0.4 ELSE 0.1 END
               + least(stops / 8.0, 1.0) * 0.2
               + alpha * 1.0 / length(text) * 0.4, 6) AS quality
    FROM t
    """,
    doc="Quality scoring: mean-word-length band + stopword ratio + alpha "
        "ratio, the shape of production quality filters.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.text import quality_score

    return quality_score(load(spark, sf_dir, "documents")).select("doc_id", "quality")


_LANG_SCORES_SQL = """
    scores AS (
        SELECT doc_id,
               len(list_intersect(w, ['the','a','of','and','to','in','is','it'])) AS score_en,
               len(list_intersect(w, ['der','die','das','und','ist','ein','zu','den'])) AS score_de,
               len(list_intersect(w, ['el','la','de','que','y','en','un','es'])) AS score_es,
               len(list_intersect(w, ['le','la','de','et','un','est','en','que'])) AS score_fr,
               len(list_intersect(w, ['de','le','shi','zai','you','wo','ta','men'])) AS score_zh
        FROM (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS w
              FROM documents)
    )
"""

@_register(
    "text_lang_id",
    oracle=f"""
    WITH {_LANG_SCORES_SQL}
    SELECT doc_id, score_en, score_de, score_es, score_fr, score_zh,
           CASE
               WHEN score_zh > greatest(score_en, score_de, score_es, score_fr) THEN 'zh'
               WHEN score_fr > greatest(score_en, score_de, score_es) THEN 'fr'
               WHEN score_es > greatest(score_en, score_de) THEN 'es'
               WHEN score_de > score_en THEN 'de'
               ELSE 'en'
           END AS lang_pred
    FROM scores
    """,
    doc="Language ID by stopword-set overlap with fixed tie order.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.text import lang_id

    return lang_id(load(spark, sf_dir, "documents")).select(
        "doc_id", "score_en", "score_de", "score_es", "score_fr", "score_zh", "lang_pred"
    )


_H_W = md5_int64_sql("w")

@_register(
    "text_fingerprint",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, pos, (({_H_W}) % 1000000007) AS h
        FROM (SELECT doc_id,
                     generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS pos,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
              FROM documents)
    )
    SELECT doc_id,
           CAST(sum(h) % 1000000007 AS BIGINT) AS fingerprint,
           arg_min(h, pos) AS first_token_hash,
           count(*) AS n_tokens
    FROM toks GROUP BY 1
    """,
    doc="Document fingerprinting: token-bag hash mod 1e9+7 + first-token "
        "anchor hash.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.text import bag_fingerprint

    return bag_fingerprint(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Multimodal plumbing (mapInPandas decode over binary payloads)
# --------------------------------------------------------------------------

@_register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) % 640 AS width,
           (octet_length(encode(text)) * 7) % 480 AS height
    FROM documents
    """,
    doc="Multimodal decode plumbing: binary payload -> mapInPandas with "
        "explicit schema -> typed features (decoder is a deterministic "
        "fake; Spark-side schema/batching/partitioning is real).",
    bench=True,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.multimodal import attach_binary_payload, decode_images

    docs = load(spark, sf_dir, "documents")
    decoded = decode_images(attach_binary_payload(docs))
    return decoded.select("doc_id", "n_bytes", "width", "height")


# --------------------------------------------------------------------------
# Dedup: connected components over near-dup pairs -> dedup groups
# --------------------------------------------------------------------------

@_register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(a, b) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    )
    SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY 1
    """,
    doc="Connected components over n-gram-Jaccard (>=0.5) near-dup pairs "
        "-> (doc_id, component_id): the dedup-group step that picks one "
        "representative per duplicate cluster. Spark: iterative min-label "
        "propagation, one keyed shuffle per round, lineage cut per round; "
        "oracle: recursive-CTE transitive closure ground truth.",
    bench=True,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.dedup import connected_components, jaccard_pairs

    pairs = jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.5, n=3)
    return connected_components(pairs)


# --------------------------------------------------------------------------
# Multimodal: feature-extract and resize, value-checked
# --------------------------------------------------------------------------

@_register(
    "multimodal_features",
    oracle="""
    WITH p AS (
        SELECT doc_id, upper(hex(encode(text))) AS ph,
               octet_length(encode(text)) AS n FROM documents
    ),
    idx AS (SELECT unnest(range(0, (SELECT max(n) FROM p))) AS i),
    bytes AS (
        SELECT doc_id,
               (strpos('0123456789ABCDEF', substring(ph, i * 2 + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substring(ph, i * 2 + 2, 1)) - 1) AS bv
        FROM p CROSS JOIN idx WHERE i < n
    ),
    hist AS (
        SELECT d.doc_id, bins.i AS dim,
               count(b.bv) AS cnt
        FROM (SELECT DISTINCT doc_id FROM p) d
        CROSS JOIN (SELECT unnest(range(0, 16)) AS i) bins
        LEFT JOIN bytes b ON b.doc_id = d.doc_id AND b.bv // 16 = bins.i
        GROUP BY 1, 2
    ),
    norms AS (
        SELECT doc_id, sqrt(sum(cnt * cnt)) AS nrm FROM hist GROUP BY 1
    )
    SELECT h.doc_id, h.dim,
           CAST(CAST(h.cnt / CASE WHEN n.nrm = 0 THEN 1 ELSE n.nrm END
                     AS FLOAT) AS DOUBLE) AS value
    FROM hist h JOIN norms n USING (doc_id)
    """,
    doc="Multimodal feature extraction: payload -> 16-bin byte histogram, "
        "L2-normalized in float64, quantized to float32 (mapInPandas, "
        "Arrow-batched). Exploded to (doc_id, dim, value) scalars; the "
        "oracle reproduces the f32 quantization with CAST(.. AS FLOAT), "
        "so the compare is bit-exact, no rounding slop.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.multimodal import attach_binary_payload, extract_features

    docs = load(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(docs), dim=16)
    return feats.select(
        "doc_id", F.posexplode("embedding").alias("dim", "value")
    ).select(
        "doc_id", F.col("dim").cast("long").alias("dim"),
        F.col("value").cast("double").alias("value"),
    )


@_register_extra(
    "multimodal_resize",
    oracle="""
    WITH p AS (
        SELECT doc_id, upper(hex(encode(text))) AS ph,
               octet_length(encode(text)) AS n FROM documents
    ),
    params AS (
        SELECT doc_id, ph, n,
               greatest(1, n // 1024) AS step FROM p
    ),
    sel AS (
        SELECT doc_id,
               string_agg(substring(ph, i * step * 2 + 1, 2), '' ORDER BY i)
                   AS kept_hex
        FROM params CROSS JOIN (SELECT unnest(range(0, 1024)) AS i) t
        WHERE i * step < n
        GROUP BY 1
    )
    SELECT doc_id, 32 AS width, 32 AS height,
           rpad(kept_hex, 2048, '0') AS payload_hex
    FROM sel
    """,
    doc="Multimodal resize plumbing: payload -> fixed 32x32-byte payload "
        "(deterministic subsample/pad stand-in for a real resampler) via "
        "mapInPandas. Output compared as hex so the binary bytes are "
        "value-checked. EXTRA: shares decode+mapInPandas plumbing with the "
        "officially-checked multimodal_decode/features/frame_sample trio.",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.multimodal import attach_binary_payload, resize_images

    docs = load(spark, sf_dir, "documents")
    out = resize_images(attach_binary_payload(docs), width=32, height=32)
    return out.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.upper(F.hex("payload")).alias("payload_hex"),
    )


# --------------------------------------------------------------------------
# Sequence shaping: chunking, packing, shuffle-sharding (llm/packing.py)
# --------------------------------------------------------------------------

@_register_extra(
    "text_chunk_windows",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w,
               len(regexp_split_to_array(trim(text), '\s+')) AS n
        FROM documents
    ),
    c AS (
        -- n IS NOT NULL: NULL-text docs emit nothing (chunk_windows
        -- contract; without it a NULL n schedules one phantom chunk)
        SELECT doc_id, w,
               unnest(range(0, 1 + (greatest(n - 32, 0) + 23) // 24)) AS chunk_id
        FROM w WHERE n IS NOT NULL
    )
    SELECT doc_id, chunk_id, chunk_id * 24 AS chunk_start,
           len(w[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS n_chunk_tokens,
           array_to_string(w[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
               AS chunk_text
    FROM c
    """,
    doc="Context-window chunking: each document's token stream cut into "
        "32-token windows at stride 24 (8-token overlap) — the "
        "embedding / finetune chunking step. Pure projection + bounded "
        "explode, zero shuffle; exact chunk text value-checked. "
        "EXTRA_STANDALONE (outside the driver's 50-entry cap).",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.packing import chunk_windows

    out = chunk_windows(load(spark, sf_dir, "documents"), window=32, stride=24)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.col("n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
        "chunk_text",
    )


@_register_extra(
    "pack_concat_chunk",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents
    ),
    o AS (
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS tok_offset
        FROM t
    ),
    e AS (
        SELECT doc_id, n_tokens, tok_offset,
               unnest(generate_series(tok_offset // 256,
                                      (tok_offset + n_tokens - 1) // 256))
                   AS seq_id
        FROM o WHERE n_tokens > 0
    )
    SELECT doc_id, n_tokens, tok_offset, seq_id,
           greatest(tok_offset, seq_id * 256) - tok_offset AS seg_start,
           least(tok_offset + n_tokens, (seq_id + 1) * 256)
               - greatest(tok_offset, seq_id * 256) AS seg_len
    FROM e
    """,
    doc="GPT-style sequence packing: concatenate the corpus token stream "
        "in doc_id order and cut every 256 tokens; one row per "
        "(document segment, training sequence). The oracle is the plain "
        "single-window cumsum; the engine computes the identical offsets "
        "with a two-level prefix sum (dim-sized bucket totals + "
        "within-bucket windows, bucket_docs=100 here so the multi-bucket "
        "path is exercised) — never an unpartitioned window. "
        "EXTRA_STANDALONE.",
)
def pack_concat_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.packing import pack_concat_chunk as pack

    out = pack(load(spark, sf_dir, "documents"), capacity=256, bucket_docs=100)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "tok_offset",
        "seq_id",
        "seg_start",
        "seg_len",
    )


@_register_extra(
    "shuffle_shard",
    oracle=f"""
    WITH k AS (
        SELECT doc_id,
               {md5_int64_sql("CAST(doc_id AS VARCHAR) || ':e1'")} AS sort_key
        FROM documents
    )
    SELECT doc_id, sort_key, sort_key % 8 AS shard,
           row_number() OVER (PARTITION BY sort_key % 8
                              ORDER BY sort_key, doc_id) AS shard_pos
    FROM k
    """,
    doc="Deterministic global shuffle + shard assignment for training-"
        "data writes: pseudo-random 60-bit sort key from (id, salt), "
        "shard = key mod 8, in-shard position. Bit-stable across runs "
        "and layouts (df.sample/rand are neither); at 100 TB drop the "
        "position column and realize the order with repartition + "
        "sortWithinPartitions (with_position=False). EXTRA_STANDALONE.",
)
def shuffle_shard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.packing import shuffle_shard

    out = shuffle_shard(load(spark, sf_dir, "documents"), n_shards=8, salt="e1")
    return out.select(
        "doc_id", "sort_key", "shard",
        F.col("shard_pos").cast("long").alias("shard_pos"),
    )


@_register_extra(
    "sample_source_quota",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, source,
               {md5_int64_sql("CAST(doc_id AS VARCHAR) || 'q1'")} % 1000000
                   AS slot
        FROM documents
    ),
    r AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY slot, doc_id)
                   AS keep_rank
        FROM s
    )
    SELECT doc_id, source, keep_rank FROM r WHERE keep_rank <= 8
    """,
    doc="Per-source quota cap: keep exactly min(8, source size) documents "
        "per source by deterministic hash rank — the over-represented-"
        "domain downsampler. The oracle row_numbers inside each source; "
        "the engine computes the same head with a two-level bounded hash "
        "aggregate (no fact-sized sort partition for a giant stratum). "
        "EXTRA_STANDALONE.",
)
def sample_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.sampling import source_quota_cap

    out = source_quota_cap(
        load(spark, sf_dir, "documents"), quota=8, salt="q1"
    )
    return out.select(
        "doc_id", "source", F.col("keep_rank").cast("long").alias("keep_rank")
    )


# --------------------------------------------------------------------------
# Text analysis: repetition filters + corpus unigram-LM scoring
# --------------------------------------------------------------------------

@_register_extra(
    "text_repetition",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    base AS (
        SELECT doc_id, len(w) AS n_words,
               round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 6)
                   AS dup_word_frac,
               [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS bgs
        FROM w
    ),
    tops AS (
        SELECT doc_id, max(c) AS top, sum(c) AS nbg FROM (
            SELECT doc_id, bg, count(*) AS c
            FROM (SELECT doc_id, unnest(bgs) AS bg FROM base)
            GROUP BY 1, 2
        ) GROUP BY 1
    )
    SELECT b.doc_id, b.n_words, b.dup_word_frac,
           coalesce(round(top * 1.0 / nbg, 6), 0.0) AS top_bigram_frac,
           coalesce(round(top * 1.0 / nbg, 6), 0.0) > 0.18 AS is_repetitive
    FROM base b LEFT JOIN tops USING (doc_id)
    """,
    doc="Gopher-style intra-document repetition filters: duplicate-word "
        "fraction and top-bigram share with the 0.18 boilerplate gate. "
        "One bigram explode + two map-side-combined hash aggregates. "
        "EXTRA_STANDALONE.",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.text import repetition_stats

    out = repetition_stats(load(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "dup_word_frac",
        "top_bigram_frac",
        "is_repetitive",
    )


@_register_extra(
    "text_unigram_logprob",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    v AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
    t AS (SELECT sum(c) AS t FROM v),
    m AS (
        SELECT tok.doc_id,
               CAST(round(-ln(v.c / t.t) * 1000000.0, 0) AS BIGINT) AS m
        FROM tok JOIN v USING (w) CROSS JOIN t
    )
    SELECT doc_id, count(*) AS n_words,
           round(sum(m) / count(*) / 1000000.0, 6) AS mean_neglogp
    FROM m GROUP BY 1
    """,
    doc="Corpus unigram-LM quality scoring: fit word frequencies over "
        "the corpus, score each document by mean -ln p(word) (the "
        "importance/perplexity-style filter). Per-token terms quantize "
        "to integer micro-nats BEFORE the per-doc sum, so the aggregate "
        "is exact integer arithmetic — no float-order ambiguity between "
        "Spark partial aggregation and the oracle. EXTRA_STANDALONE.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.text import unigram_logprob

    return unigram_logprob(load(spark, sf_dir, "documents"))


@_register_extra(
    "decontaminate_ngram",
    oracle=f"""
    WITH {_REF_SQL},
    cs AS (
        SELECT doc_id,
               unnest(list_distinct([
                   array_to_string(w[i : i + 12], ' ')
                   for i in range(1, len(w) - 11)
               ])) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 13
    ),
    rs AS (
        SELECT DISTINCT
               unnest(list_distinct([
                   array_to_string(w[i : i + 12], ' ')
                   for i in range(1, len(w) - 11)
               ])) AS s
        FROM (SELECT string_split(text, ' ') AS w FROM ref)
        WHERE len(w) >= 13
    )
    SELECT cs.doc_id, count(*) AS n_collisions
    FROM cs JOIN rs USING (s)
    GROUP BY 1
    """,
    doc="N-gram collision decontamination (GPT-3-style 13-gram filter): "
        "corpus docs sharing any distinct 13-gram with the eval "
        "reference, with the collision count — catches a quoted eval "
        "PARAGRAPH inside an otherwise-novel training doc, which the "
        "exact layer misses and the whole-doc MinHash layer under-"
        "scores. Reference n-gram hash set broadcasts; only exchange is "
        "the per-doc count. Completes the decontamination family "
        "(exact / MinHash / n-gram). EXTRA_STANDALONE.",
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.dedup import ngram_contamination

    docs = load(spark, sf_dir, "documents")
    return ngram_contamination(docs, _eval_reference(docs), n=13)


# shared CTE chain of the semantic-dedup family: deterministic LSH
# planes -> buckets -> exact-verified pairs -> recursive-closure
# components. semantic_dedup and semantic_dedup_keepby both build on it
# (single source, like COORDS_SQL for the geometry family).
_SEMDEDUP_CTES = """
    WITH RECURSIVE signs AS (
        SELECT g.p AS plane,
               list_transform(range(0, 64),
                 i -> CASE WHEN ((g.p*64 + i) * 2654435761) % 4294967296
                                < 2147483648
                      THEN 1.0 ELSE -1.0 END) AS svec
        FROM range(0, 48) g(p)
    ),
    bits AS (
        SELECT v.vec_id, s.plane,
               CASE WHEN list_dot_product(CAST(v.embedding AS DOUBLE[]),
                                          s.svec) >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM embeddings v CROSS JOIN signs s
    ),
    buckets AS (
        SELECT vec_id, plane // 3 AS tbl,
               CAST(SUM(bit * (1 << (plane % 3))) AS INT) AS bucket
        FROM bits GROUP BY vec_id, plane // 3
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    p AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.id_a
        JOIN embeddings eb ON eb.vec_id = c.id_b
        WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                     CAST(eb.embedding AS DOUBLE[])) >= 0.4
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM p
        UNION SELECT id_b, id_a FROM p
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(a, b) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    comp AS (SELECT a AS vec_id, min(b) AS component_id FROM reach GROUP BY 1)
"""


@_register_extra(
    "semantic_dedup",
    oracle=_SEMDEDUP_CTES + """
    SELECT vec_id, component_id,
           count(*) OVER (PARTITION BY component_id) AS group_size,
           vec_id = component_id AS is_kept
    FROM comp
    """,
    doc="SemDeDup-style semantic dedup: embedding-cosine near-dup pairs "
        "(the official LSH scale path, mirrored here plane-by-plane) -> "
        "recursive-closure components -> smallest-id representative per "
        "semantic group with group sizes. The training pipeline drops "
        "~is_kept rows. Composition of the officially-checked "
        "embedding_cosine_pairs_lsh and dedup_components machinery over "
        "the embeddings table. EXTRA_STANDALONE; bench-flagged since "
        "round 6 (the training-pipeline family is perf-tracked, not "
        "just value-checked).",
    bench=True,
)
def semantic_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.similarity import semantic_dedup

    return semantic_dedup(load(spark, sf_dir, "embeddings"), threshold=0.4)


@_register_extra(
    "semantic_dedup_keepby",
    oracle=_SEMDEDUP_CTES + """
    , qual AS (SELECT vec_id, (vec_id * 37) % 100 AS quality
               FROM embeddings),
    cq AS (SELECT c.vec_id, c.component_id, q.quality
           FROM comp c JOIN qual q USING (vec_id)),
    best AS (SELECT component_id, max(quality) AS bq FROM cq GROUP BY 1),
    keeper AS (
        SELECT cq.component_id, min(cq.vec_id) AS keeper_id
        FROM cq JOIN best USING (component_id)
        WHERE cq.quality = best.bq
        GROUP BY 1
    )
    SELECT cq.vec_id, cq.component_id,
           count(*) OVER (PARTITION BY cq.component_id) AS group_size,
           cq.vec_id = k.keeper_id AS is_kept
    FROM cq JOIN keeper k USING (component_id)
    """,
    doc="semantic_dedup with the quality-aware keeper (keep_by): the "
        "kept representative is the group member with the highest "
        "quality score (a deterministic id-derived score here), ties "
        "by smallest id — SemDeDup curation keeps the BEST of each "
        "semantic clump. Same component closure as semantic_dedup "
        "(shared CTE block); only the keeper election differs. "
        "EXTRA_STANDALONE.",
)
def semantic_dedup_keepby(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings").withColumn(
        "quality", (F.col("vec_id") * 37) % 100
    )
    return semantic_dedup(emb, threshold=0.4, keep_by="quality")



@_register_extra(
    "search_bm25_topk",
    oracle=r"""
    WITH q(query_id, query) AS (
        VALUES (CAST(1 AS BIGINT), 'hash table merge'),
               (CAST(2 AS BIGINT), 'slow scan window'),
               (CAST(3 AS BIGINT), 'spark batch sort value')
    ),
    tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
    stats AS (
        SELECT count(*) AS n,
               CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
                    AS BIGINT) AS sumdl
        FROM documents
    ),
    qt AS (
        SELECT DISTINCT query_id,
               unnest(list_distinct(regexp_split_to_array(trim(query), '\s+')))
                   AS w
        FROM q
    ),
    post AS (
        SELECT tf.doc_id, tf.w, tf.tf, dl.dl
        FROM tf JOIN (SELECT DISTINCT w FROM qt) qw USING (w)
        JOIN dl USING (doc_id)
    ),
    dfreq AS (SELECT w, count(*) AS df FROM post GROUP BY 1),
    m AS (
        SELECT qt.query_id, post.doc_id,
               CAST(round(
                   ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                   * (post.tf * 2.2)
                     / (post.tf + 1.2 * (1 - 0.75 + 0.75 * post.dl
                                         / (stats.sumdl / stats.n)))
                   * 1000000.0, 0) AS BIGINT) AS m
        FROM post JOIN qt USING (w) JOIN dfreq USING (w) CROSS JOIN stats
        -- degenerate-term guard (engine default max_df_share = 0.5):
        -- query terms present in more than half the corpus are dropped
        -- before candidate scoring — their idf <= ln(2) is noise, and
        -- at corpus scale their posting list would skew one query's
        -- window partition to fact size
        WHERE dfreq.df <= 0.5 * stats.n
    ),
    s AS (
        SELECT query_id, doc_id, CAST(sum(m) AS BIGINT) AS sm
        FROM m GROUP BY 1, 2
    ),
    r AS (
        SELECT query_id, doc_id, sm,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sm DESC, doc_id) AS rank
        FROM s
    )
    SELECT query_id, rank, doc_id, round(sm / 1000000.0, 6) AS score_bm25
    FROM r WHERE rank <= 5
    """,
    doc="BM25 top-5 lexical retrieval (Okapi, k1=1.2 b=0.75) for three "
        "fixed keyword queries — the lexical complement to the "
        "embedding ANN family (eval mining / hard negatives / corpus "
        "slicing). Postings of queried words only (query-vocabulary-"
        "sized df dim, broadcast); per-term scores quantized to integer "
        "micro-units before the sum so aggregation order cannot flip a "
        "rank cross-engine. EXTRA_STANDALONE; bench-flagged since "
        "round 6.",
    bench=True,
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.search import bm25_topk

    queries = spark.createDataFrame(
        [(1, "hash table merge"), (2, "slow scan window"),
         (3, "spark batch sort value")],
        "query_id long, query string",
    )
    return bm25_topk(load(spark, sf_dir, "documents"), queries, k=5)


@_register_extra(
    "text_winnow_fingerprint",
    oracle=r"""
    WITH g AS (
        SELECT doc_id,
               [('0x' || substr(md5(substr(text, i, 8)), 1, 15))::BIGINT
                for i in range(1, length(text) - 8 + 2)] AS h
        FROM documents
        WHERE length(text) >= 11
    ),
    m AS (
        SELECT doc_id,
               list_distinct([list_min(h[j : j + 3])
                              for j in range(1, len(h) - 4 + 2)]) AS fps
        FROM g
    )
    SELECT doc_id, unnest(fps) AS fp FROM m
    """,
    doc="Winnowing fingerprints (MOSS): min-hash of every 4-window of "
        "char-8-gram hashes, distinct minima exploded per doc — any "
        "shared substring of length >= 11 between two docs shares a "
        "fingerprint (positional quote/plagiarism detection the bag "
        "fingerprint cannot do). Pure array expressions, rides the "
        "scan. EXTRA_STANDALONE.",
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.text import winnow_fingerprints

    return winnow_fingerprints(load(spark, sf_dir, "documents"), k=8, window=4)


@_register_extra(
    "prepare_training_corpus",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source, text,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n,
               list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS wset,
               len(regexp_extract_all(text, '[A-Za-z]')) AS alpha
        FROM documents
    ),
    scored AS (
        SELECT doc_id, source, text,
               round(
                   CASE WHEN (length(text) - (n - 1)) * 1.0 / n
                             BETWEEN 3 AND 10 THEN 0.4 ELSE 0.1 END
                   + least(len(list_intersect(wset,
                         ['the','a','of','and','to','in','is','it'])) / 8.0,
                         1.0) * 0.2
                   + alpha * 1.0 / length(text) * 0.4, 6) AS quality,
               len(list_intersect(wset, ['the','a','of','and','to','in','is','it'])) AS s_en,
               len(list_intersect(wset, ['der','die','das','und','ist','ein','zu','den'])) AS s_de,
               len(list_intersect(wset, ['el','la','de','que','y','en','un','es'])) AS s_es,
               len(list_intersect(wset, ['le','la','de','et','un','est','en','que'])) AS s_fr,
               len(list_intersect(wset, ['de','le','shi','zai','you','wo','ta','men'])) AS s_zh
        FROM base
    ),
    filt AS (
        SELECT doc_id, source, text FROM scored
        WHERE quality >= 0.77
          AND NOT (s_zh > greatest(s_en, s_de, s_es, s_fr))
          AND NOT (s_fr > greatest(s_en, s_de, s_es))
          AND NOT (s_es > greatest(s_en, s_de))
          AND NOT (s_de > s_en)
    ),
    scrub AS (
        SELECT doc_id, source,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                   '<EMAIL>', 'g'),
                   '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
                   '<IP>', 'g'),
                   '\\+\\d{{7,15}}', '<PHONE>', 'g') AS text
        FROM filt
    ),
    ded AS (
        SELECT doc_id, source, text FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
            FROM scrub
        ) WHERE doc_id = keep
    ),
    qr AS (
        SELECT doc_id, source, text,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY {md5_int64_sql("CAST(doc_id AS VARCHAR) || 'prep'")}
                                % 1000000, doc_id) AS rk
        FROM ded
    ),
    fin AS (SELECT doc_id, source, text FROM qr WHERE rk <= 8),
    t AS (
        SELECT doc_id, source,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
        FROM fin
    ),
    o AS (
        SELECT doc_id, source, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS tok_offset
        FROM t
    ),
    e AS (
        SELECT doc_id, source, n_tokens, tok_offset,
               unnest(generate_series(tok_offset // 256,
                                      (tok_offset + n_tokens - 1) // 256))
                   AS seq_id
        FROM o WHERE n_tokens > 0
    )
    SELECT doc_id, source, n_tokens, tok_offset, seq_id,
           greatest(tok_offset, seq_id * 256) - tok_offset AS seg_start,
           least(tok_offset + n_tokens, (seq_id + 1) * 256)
               - greatest(tok_offset, seq_id * 256) AS seg_len
    FROM e
    """,
    doc="THE flagship composition: quality gate (>= 0.77) -> language "
        "gate (en) -> PII scrub -> exact dedup -> per-source quota (8) "
        "-> 256-token sequence packing, chained as ONE lazy Catalyst "
        "plan (no materialization between stages — at 100 TB this "
        "writes the corpus once, not five times). The oracle chains the "
        "same CTEs, so the END-TO-END values are checked, not just the "
        "stages. EXTRA_STANDALONE; bench-flagged since r8 so the "
        "driver's per-round bench diffs the composition's wall time.",
    bench=True,
)
def prepare_training_corpus_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.pipeline import prepare_training_corpus

    out = prepare_training_corpus(load(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "tok_offset", "seq_id", "seg_start", "seg_len",
    )


# --------------------------------------------------------------------------
# Multimodal near-dup: dHash fingerprints + exact pigeonhole hamming join
# --------------------------------------------------------------------------

# the oracle recomputes the dHash grid per document in SQL (byte value
# via ascii(substr(..)) — the documents fixture is pure ASCII, so
# char indexing == byte indexing; pinned by the pytest fixture check)
# and brute-forces ALL pairs with a per-bit hamming sum (NULL/empty
# payloads excluded like the operator — no image, no pairs), so the banded
# Spark path is value-checked against an O(n^2) ground truth: recall 1
# is part of the contract, not just determinism.
_DHASH_ORACLE = """
    WITH p AS (
        SELECT doc_id, text AS raw,
               octet_length(encode(text)) AS n,
               greatest(1, octet_length(encode(text)) // 72) AS st
        FROM documents
        WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
    ),
    g AS (
        SELECT doc_id,
               list_transform(range(0, 72),
                   i -> CASE WHEN i * st < n
                        THEN ascii(substr(raw, i * st + 1, 1))
                        ELSE 0 END) AS gr
        FROM p
    ),
    bits AS (
        SELECT doc_id,
               list_transform(range(0, 64),
                   k -> CASE WHEN gr[(k // 8) * 9 + (k % 8) + 1]
                             < gr[(k // 8) * 9 + (k % 8) + 2]
                        THEN 1 ELSE 0 END) AS b
        FROM g
    )
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(list_sum(list_transform(range(0, 64),
               k -> CASE WHEN a.b[k + 1] != c.b[k + 1]
                    THEN 1 ELSE 0 END)) AS INTEGER) AS hamming
    FROM bits a JOIN bits c ON a.doc_id < c.doc_id
    WHERE list_sum(list_transform(range(0, 64),
               k -> CASE WHEN a.b[k + 1] != c.b[k + 1]
                    THEN 1 ELSE 0 END)) <= 10
"""


@_register_extra(
    "multimodal_image_neardup",
    oracle=_DHASH_ORACLE,
    doc="Image near-duplicate pairs: 64-bit dHash perceptual "
        "fingerprints over the binary payload (Arrow mapInPandas, the "
        "fake-decode grid) + the EXACT multi-index pigeonhole hamming "
        "join shared with SimHash (llm.dedup.hamming_pairs_exact) — "
        "recall 1 within the radius, every shuffle keyed. Oracle: "
        "O(n^2) per-bit brute force. The training-pipeline image-dedup "
        "shape; text dedup sees only opaque bytes.",
)
def multimodal_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weatherdb_spark.llm.multimodal import (
        attach_binary_payload,
        image_neardup_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    return image_neardup_pairs(attach_binary_payload(docs), max_hamming=10)


# --------------------------------------------------------------------------
# CorpusStore append benchmark: dedup-at-append against a live archive
# --------------------------------------------------------------------------

# per-process bench state: the archive is built ONCE per (process,
# sf_dir) — iteration 1 pays the build and the bench's min-of-N takes
# the steady-state appends that follow, each admitting a fresh batch
_CORPUS_BENCH_STATE: dict = {}

#: Bench side-channel: what each stateful bench iteration actually
#: measured (bench.py copies it into the BENCH json as "notes"), so a
#: round-over-round diff of a non-stationary series compares like with
#: like — the r8 verdict's ask #6 for corpus_append_bench, whose
#: archive grows one epoch per iteration.
BENCH_NOTES: dict = {}


@_register_extra(
    "corpus_append_bench",
    oracle=None,
    doc="CorpusStore.append wall time against a pre-built archive: each "
        "call appends one documents-table-sized batch of UNIQUE docs "
        "(ids offset, a per-iteration word interleaved so no shingle "
        "band collides across iterations) and runs the full gate — "
        "side-table sync diff, within-batch exact+near collapse, "
        "archive exact/near joins against the stored indexes, the "
        "epoch-pruned candidate verify, and the O(batch) leaf writes. "
        "No SQL oracle (stateful warehouse side effects; the append "
        "SEMANTICS are oracle-checked via the corpus pytest suite) — "
        "bench-flagged since r8 so round-over-round regressions in the "
        "append path are visible in BENCH_r*.json, not just the "
        "one-shot CORPUS_STRESS record. Iterations are LIKE-FOR-LIKE "
        "in plan shape (r9): the archive pre-builds past "
        "EPOCH_PRUNE_MIN with small seed appends, so every measured "
        "append runs the epoch-pruned verify plan (r8's 4th iteration "
        "crossed the gate mid-bench), and each iteration stamps "
        "(epoch_count, archive_rows) into the returned frame AND the "
        "BENCH_NOTES side-channel that bench.py copies into the json.",
    bench=True,
)
def corpus_append_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from weatherdb_spark.llm.corpus import DOCS_TABLE, EPOCH_PRUNE_MIN, CorpusStore

    st = _CORPUS_BENCH_STATE.get(sf_dir)
    if st is None:
        wh = tempfile.mkdtemp(prefix="wdb_corpus_bench_")
        atexit.register(shutil.rmtree, wh, ignore_errors=True)
        store = CorpusStore(spark, wh)
        base = load(spark, sf_dir, "documents").select("doc_id", "text")
        store.append(base)  # the archive; later calls dedup against it
        max_id = base.agg(F.max("doc_id")).first()[0] or 0
        span = int(max_id) + 1
        # seed epochs until the store is past the EPOCH_PRUNE_MIN gate:
        # every MEASURED iteration then runs the same epoch-pruned
        # verify plan (tiny unique batches — one-time cost on the
        # build iteration, which min-of-N discards anyway)
        seed = 0
        while len(store._epoch_values(DOCS_TABLE) or ()) <= EPOCH_PRUNE_MIN:
            seed += 1
            store.append(base.filter(F.col("doc_id") < 200).select(
                (F.col("doc_id") + F.lit(-seed * 1000 - 1000)).alias("doc_id"),
                F.concat_ws(f" seed{seed} ",
                            F.split(F.col("text"), " ")).alias("text"),
            ))
        st = _CORPUS_BENCH_STATE[sf_dir] = {
            "store": store, "k": 0, "span": span,
        }
    st["k"] += 1
    k = st["k"]
    store = st["store"]
    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    batch = base.select(
        (F.col("doc_id") + F.lit(k * st["span"])).alias("doc_id"),
        # interleave a per-iteration marker word between every word:
        # every 3-shingle contains it, so batches share no shingles
        # with the archive or with earlier iterations — each append
        # ADMITS (the write path is measured, not just rejection)
        F.concat_ws(f" it{k} ", F.split(F.col("text"), " ")).alias("text"),
    )
    epochs_before = len(store._epoch_values(DOCS_TABLE) or ())
    rows_before = st.get("rows", None)
    res = store.append(batch)
    if rows_before is None:
        # first measured iteration: one archive count to anchor the note
        rows_after = store.read().count()
    else:
        rows_after = rows_before + res["admitted"]
    st["rows"] = rows_after
    BENCH_NOTES.setdefault("corpus_append_bench", []).append({
        "iteration": k,
        "epochs_before": epochs_before,
        "archive_rows_after": int(rows_after),
        "admitted": res["admitted"],
        "rejected": res["rejected"],
    })
    return spark.createDataFrame(
        [(res["admitted"], res["rejected"], res["version"],
          epochs_before, int(rows_after))],
        "admitted long, rejected long, version long, "
        "epochs_before long, archive_rows_after long",
    )
