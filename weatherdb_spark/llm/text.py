"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All built-in-function compositions (JVM-side),
each with an exact SQL twin for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weatherdb_spark.functions.partitioning import spread
from weatherdb_spark.llm.hashing import md5_int64

# tiny per-language stopword sets for the n-gram/stopword heuristic
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "est", "en", "que"),
    "zh": ("de", "le", "shi", "zai", "you", "wo", "ta", "men"),
}

FP_MOD = 1000000007


def tokens_expr(col) -> "F.Column":
    """THE engine-wide whitespace tokenizer (``\\s+`` on trimmed text) —
    the single source for every token-counting operator: text stats,
    packing/chunking (``llm/packing.py``), BM25 (``llm/search.py``).
    Swapping in a real tokenizer means changing exactly this expression;
    the modules sharing it cannot drift apart. (The dedup shingle
    builder deliberately splits on single spaces instead — see
    ``llm/dedup.shingles_expr``.)

    The token-consuming operators (``chunk_windows``,
    ``pack_concat_chunk``, ``bm25_topk``, ``unigram_logprob``) accept a
    ``tokens`` parameter with this callable's shape — column in,
    ``array<string>`` Column out — so a deployment swaps the tokenizer
    per call without forking the operators; :func:`arrow_regex_tokens`
    is the Arrow-backed example proving a Python tokenizer flows
    through the same seam."""
    return F.split(F.trim(col if not isinstance(col, str) else F.col(col)), "\\s+")


def arrow_regex_tokens(pattern: str = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"):
    """Example ARROW-BACKED tokenizer for the ``tokens`` seam: returns a
    ``col -> array<string> Column`` callable (the :func:`tokens_expr`
    shape) whose tokenization runs in a vectorized pandas UDF — the
    integration shape for a real subword tokenizer (swap the regex
    findall for the library call; the Arrow batch transfer, NULL
    handling, and operator plumbing stay identical). The default
    pattern is the engine's BPE-ish token_stats regex (words / numbers
    / single punctuation).

    NULL text maps to a NULL token array, preserving the
    NULL-emits-nothing contract of the consuming operators. A Python
    tokenizer is the slow path next to the JVM default — batch-
    columnar via Arrow, never row-at-a-time, but still ~10x the cost
    of a split(); keep the default unless token EXACTNESS against a
    model's vocabulary is required.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    rx = re.compile(pattern)

    @pandas_udf("array<string>")
    def _tok(s):
        return s.map(lambda t: None if t is None else rx.findall(t))

    def tokens(col) -> "F.Column":
        return _tok(col if not isinstance(col, str) else F.col(col))

    return tokens


def wordpiece_tokens(
    vocab,
    unk_token: str = "[UNK]",
    max_word_chars: int = 100,
    pre_pattern: str = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]",
):
    """Vocabulary-driven SUBWORD tokenizer for the ``tokens`` seam —
    greedy longest-match-first WordPiece (Wu et al. 2016; the BERT
    ``vocab.txt`` convention: continuation pieces carry a ``##``
    prefix, a word with no valid segmentation becomes ``unk_token``).
    Returns the standard col -> ``array<string>`` Column callable, so
    it flows through every token-consuming operator (``chunk_windows``,
    ``pack_concat_chunk``, ``bm25_topk``, ``unigram_logprob``,
    ``prepare_training_corpus``) — sequence boundaries then follow the
    MODEL's token counts, not whitespace words.

    ``vocab`` is an iterable of piece strings or a path to a vocab
    file (one piece per line, the published format). It is read ONCE
    driver-side and shipped inside the pandas-UDF closure — a plain
    task-binary constant, NOT a broadcast join: the vocab is a
    dim-sized lookup the executor probes per word, and turning it into
    a join would shuffle the exploded token stream for no reason.

    Execution is Arrow batch-columnar (pandas UDF) like
    :func:`arrow_regex_tokens`; NULL text maps to a NULL array
    (NULL-emits-nothing downstream). ``pre_pattern`` is the
    pre-tokenizer (words / punctuation — whitespace never reaches the
    matcher); words longer than ``max_word_chars`` short-circuit to
    ``unk_token``, the standard guard against adversarial
    megabyte-"words" going O(len^2) in the matcher."""
    import os
    import re

    from pyspark.sql.functions import pandas_udf

    if isinstance(vocab, (str, os.PathLike)):
        with open(vocab, encoding="utf-8") as fh:
            # rstrip \r too: a CRLF vocab.txt (the common download)
            # would otherwise leave \r on every piece and silently
            # tokenize EVERY word to [UNK]
            vocab = [ln.rstrip("\r\n") for ln in fh if ln.strip()]
    vocab_set = frozenset(vocab)
    if not vocab_set:
        raise ValueError("wordpiece_tokens needs a non-empty vocabulary")
    rx = re.compile(pre_pattern)

    def _wp_word(word: str) -> list:
        if len(word) > max_word_chars:
            return [unk_token]
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in vocab_set:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [unk_token]   # no segmentation: whole word UNK
            pieces.append(cur)
            start = end
        return pieces

    @pandas_udf("array<string>")
    def _tok(s):
        return s.map(
            lambda t: None if t is None else
            [p for w in rx.findall(t) for p in _wp_word(w)]
        )

    def tokens(col) -> "F.Column":
        return _tok(col if not isinstance(col, str) else F.col(col))

    return tokens


def bpe_tokens(
    merges,
    end_of_word: str = "",
    max_word_chars: int = 100,
    pre_pattern: str = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]",
):
    """Merges-file SUBWORD tokenizer for the ``tokens`` seam —
    byte-pair encoding (Sennrich et al. 2016; the GPT-family
    ``merges.txt`` convention): a word starts as its character
    sequence and adjacent pairs merge in TRAINED RANK order (lowest
    rank = learned earliest = merged first) until no adjacent pair has
    a rank. The published algorithm is rank-greedy pairing — a
    different segmenter from :func:`wordpiece_tokens`' longest-match
    vocab probe, so pipelines tuned for GPT-style models count tokens
    the way their model does. Returns the standard col ->
    ``array<string>`` Column callable, flowing through every
    token-consuming operator (``chunk_windows``, ``pack_concat_chunk``,
    ``bm25_topk``, ``unigram_logprob``, ``prepare_training_corpus``).

    ``merges`` is an iterable of ``(left, right)`` pairs in rank order
    or a path to a merges file (one ``left right`` pair per line; a
    leading ``#version`` header line is skipped, the published
    format). Like the WordPiece vocab it is read ONCE driver-side and
    shipped inside the pandas-UDF closure — a task-binary constant,
    not a broadcast join.

    ``end_of_word`` is appended to each word's LAST character before
    merging (Sennrich's ``</w>`` convention; GPT-2 merges instead
    encode the boundary in the pairs themselves — leave it empty for
    that style). Unmergeable characters simply remain single-character
    tokens: BPE has no UNK — open-vocabulary coverage is the point of
    the algorithm. NULL text maps to a NULL array; words longer than
    ``max_word_chars`` stay ONE unsplit token (no merge pass), the
    guard against adversarial megabyte-"words" driving the
    O(len x merges) pairing loop.
    """
    import os
    import re

    from pyspark.sql.functions import pandas_udf

    if isinstance(merges, (str, os.PathLike)):
        with open(merges, encoding="utf-8") as fh:
            lines = [ln.rstrip("\r\n") for ln in fh]
        pairs = []
        for i, ln in enumerate(lines):
            if not ln.strip() or (i == 0 and ln.startswith("#")):
                continue
            parts = ln.split(" ")
            if len(parts) != 2:
                raise ValueError(
                    f"merges line {i + 1} is not 'left right': {ln!r}"
                )
            pairs.append((parts[0], parts[1]))
        merges = pairs
    # first occurrence wins: rank = the merge's EARLIEST training
    # position, so a duplicated pair in a hand-concatenated merges file
    # cannot demote itself below later merges (a dict comprehension
    # would keep the LAST, inverting the order for that pair)
    ranks: dict = {}
    for r, (a, b) in enumerate(merges):
        ranks.setdefault((str(a), str(b)), r)
    if not ranks:
        raise ValueError("bpe_tokens needs a non-empty merges list")
    rx = re.compile(pre_pattern)

    def _bpe_word(word: str) -> list:
        if len(word) > max_word_chars:
            return [word]
        pieces = list(word)
        if end_of_word and pieces:
            pieces[-1] += end_of_word
        while len(pieces) > 1:
            best_rank, best_i = None, -1
            for i in range(len(pieces) - 1):
                r = ranks.get((pieces[i], pieces[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            # merge EVERY adjacent occurrence of the best pair,
            # left-to-right, in one pass (the published behavior)
            target = (pieces[best_i], pieces[best_i + 1])
            out, i = [], 0
            while i < len(pieces):
                if (i < len(pieces) - 1
                        and (pieces[i], pieces[i + 1]) == target):
                    out.append(pieces[i] + pieces[i + 1])
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            pieces = out
        return pieces

    @pandas_udf("array<string>")
    def _tok(s):
        return s.map(
            lambda t: None if t is None else
            [p for w in rx.findall(t) for p in _bpe_word(w)]
        )

    def tokens(col) -> "F.Column":
        return _tok(col if not isinstance(col, str) else F.col(col))

    return tokens


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count
    (words / numbers / single punctuation)."""
    words = tokens_expr(text_col)
    return (
        df.withColumn("n_tokens_ws", F.size(words))
        .withColumn(
            "n_tokens_re",
            F.regexp_count(F.col(text_col), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")),
        )
        .withColumn("n_chars_obs", F.length(F.col(text_col)))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: mix of mean word length band,
    stopword ratio, and alpha ratio — the shape of production quality
    filters (length/punct/stopword gates), deterministic and oracle-able."""
    words = tokens_expr(text_col)
    n = F.size(words)
    mean_wlen = (F.length(F.col(text_col)) - (n - 1)) / n  # chars minus spaces
    en_stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = F.size(F.array_intersect(F.array_distinct(words), en_stops)) / F.lit(8.0)
    # try_divide: an empty document has length 0 and a plain divide is
    # an ANSI DIVIDE_BY_ZERO task failure; score it as zero alpha share
    alpha_ratio = F.coalesce(
        F.try_divide(
            F.regexp_count(F.col(text_col), F.lit("[A-Za-z]")),
            F.length(F.col(text_col)),
        ),
        F.lit(0.0),
    )
    score = (
        F.when((mean_wlen >= 3) & (mean_wlen <= 10), 0.4).otherwise(0.1)
        + F.least(stop_ratio, F.lit(1.0)) * 0.2
        + alpha_ratio * 0.4
    )
    return df.withColumn("quality", F.round(score, 6))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID: score each language by the count of
    its stopwords present (distinct words), pick the argmax with a fixed
    tie order (en > de > es > fr > zh)."""
    words = F.array_distinct(tokens_expr(text_col))
    scores = {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in STOPWORDS.items()
    }
    order = ["en", "de", "es", "fr", "zh"]
    best = F.lit("en")
    best_score = scores["en"]
    for lang in order[1:]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    out = df
    for lang in order:
        out = out.withColumn(f"score_{lang}", scores[lang])
    return out.withColumn("lang_pred", best)


def bag_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprint: sum of 60-bit token hashes mod 1e9+7 over the
    token bag (order-insensitive), plus the first-token hash as an anchor.
    The reference-style 'rolling hash' shape with exact SQL parity."""
    toks = spread(df, id_col).select(
        F.col(id_col), F.posexplode_outer(tokens_expr(text_col))
    ).filter(F.col("col").isNotNull()).withColumn("_h", md5_int64(F.col("col")) % FP_MOD)
    return toks.groupBy(id_col).agg(
        (F.sum("_h") % FP_MOD).alias("fingerprint"),
        F.min_by("_h", "pos").alias("first_token_hash"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprints (the published MOSS local-fingerprint
    algorithm): hash every character ``k``-gram, then keep the minimum
    hash of each ``window`` of consecutive gram hashes; the distinct
    minima are the document's fingerprint set, exploded to
    (id_col, fp) rows. Guarantee: any substring of length
    >= ``window + k - 1`` shared by two documents contributes at least
    one shared fingerprint — positional plagiarism/quote detection
    where the bag fingerprint (:func:`bag_fingerprint`) only sees
    whole-document token multisets.

    Pure array expressions (transform / slice / array_min) — rides the
    scan, no shuffle, no UDF; density is ~2/(window+1) fingerprints per
    character. Documents shorter than ``window + k - 1`` characters
    emit nothing.
    """
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be positive, got {k}, {window}")
    t = F.col(text_col)
    m = F.length(t) - k + 1                    # k-gram count
    # plan-shape note: the window minima must NOT nest the gram-hash
    # array inside a second transform's lambda — the inner expression
    # re-evaluates per outer element (O(n^2) md5 per document; the
    # first cut of this operator hung on it). Instead the hash array
    # lands in its own projection and the sliding min is the
    # element-wise `least` of `window` shifted slices: the alias is
    # referenced `window` times, so CollapseProject keeps the
    # projection boundary and the hashes compute once per row.
    hashes = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m), lambda i: md5_int64(t.substr(i, F.lit(k)))
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    step1 = df.select(
        F.col(id_col),
        hashes.alias("_h"),
        F.greatest(m - window + 1, F.lit(0)).alias("_nw"),
    )
    shifted = [
        F.slice(F.col("_h"), F.lit(j + 1), F.col("_nw")) for j in range(window)
    ]
    acc = shifted[0]
    for nxt in shifted[1:]:
        acc = F.zip_with(acc, nxt, lambda a, b: F.least(a, b))
    return step1.select(
        id_col, F.explode(F.array_distinct(acc)).alias("fp")
    )


#: Gopher-style repetition gate: a document whose single most frequent
#: word bigram covers more than this share of all its bigrams reads as
#: boilerplate/listing spam (the published filters gate the top 2-gram
#: at 0.18 of characters; this engine's twin gates the count share).
TOP_BIGRAM_GATE = 0.18


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document repetition filters (the Gopher-repetition family):
    per document, the duplicate-word fraction (``1 - distinct/total``)
    and the share of word bigrams taken by the single most frequent
    bigram, plus the boolean gate at :data:`TOP_BIGRAM_GATE`.

    Shape: one explode of bigrams + two hash aggregates keyed by
    (doc, bigram) then doc — map-side combining keeps the exploded
    stream partial-aggregated, and nothing is quadratic in document
    length. Documents with fewer than two words score 0 on both.
    """
    words = tokens_expr(text_col)
    n = F.size(words)
    base = df.select(
        F.col(id_col),
        n.alias("n_words"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(words)) / n, 6
        ).alias("dup_word_frac"),
        F.zip_with(
            F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ).alias("_bgs"),
    )
    tops = (
        base.select(id_col, F.explode("_bgs").alias("_bg"))
        .groupBy(id_col, "_bg")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top"), F.sum("_c").alias("_nbg"))
    )
    out = base.drop("_bgs").join(tops, id_col, "left")
    top_frac = F.coalesce(F.round(F.col("_top") / F.col("_nbg"), 6), F.lit(0.0))
    return out.select(
        id_col,
        "n_words",
        "dup_word_frac",
        top_frac.alias("top_bigram_frac"),
        (top_frac > TOP_BIGRAM_GATE).alias("is_repetitive"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    tokens=None,
) -> DataFrame:
    """Corpus unigram-LM scoring (the importance/perplexity-style
    quality filter trained on the corpus itself): fit word frequencies
    over the whole corpus, then score each document by the mean negative
    log-probability of its words — high = rare/garbled vocabulary, low =
    common boilerplate. Two hash aggregates (vocab fit, per-doc score) +
    one word→frequency join; the vocabulary is dim-sized next to the
    token stream, so the join broadcasts at realistic corpus shapes.

    Cross-engine exactness: each token's −ln p is quantized to integer
    micro-nats BEFORE the per-document sum, so the aggregate is exact
    integer arithmetic — no float-summation-order ambiguity between
    Spark's partial aggregation and the oracle.

    ``tokens`` swaps the tokenizer (the :func:`tokens_expr` callable
    shape); the vocabulary fit and the per-doc scoring share the one
    callable, so fit and score cannot tokenize differently.
    """
    tok = tokens if tokens is not None else tokens_expr
    toks = df.select(
        F.col(id_col), F.explode(tok(text_col)).alias("_w")
    )
    vocab = toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    total = vocab.agg(F.sum("_c").alias("_t"))
    term_micro = F.round(-F.log(F.col("_c") / F.col("_t")) * 1e6, 0).cast("bigint")
    # NOTE: no broadcast hint on the vocabulary — at web-corpus scale
    # the distinct-token vocab is hundreds of millions of rows and a
    # forced broadcast would OOM; Catalyst broadcasts it when stats
    # allow and falls back to a shuffle join otherwise. The one-row
    # total is always safe to broadcast.
    return (
        toks.join(vocab, "_w")
        .join(F.broadcast(total))
        .select(id_col, term_micro.alias("_m"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.sum("_m") / F.count(F.lit(1)) / 1e6, 6).alias("mean_neglogp"),
        )
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    level: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """zlib-compressibility quality signal: ``n_compressed / n_bytes``
    per document — boilerplate and machine-generated text compress far
    below normal prose, so production filters gate on low ratios (the
    signal :func:`repetition_stats` approximates with n-gram counts,
    measured directly). Returns (id_col, n_bytes, n_compressed,
    compression_ratio).

    The ONE Python-side operator in this module: no JVM expression
    compresses bytes, so this is an Arrow ``mapInPandas`` (the
    multimodal family's pattern — batch-columnar, never row-at-a-time).
    Deterministic for a fixed zlib level and library version; empty
    documents report ratio NULL.
    """
    from pyspark.sql import types as T

    if not 0 <= level <= 9:
        raise ValueError(f"zlib level must be 0..9, got {level}")
    id_field = df.schema[id_col]
    out_schema = T.StructType([
        id_field,
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_compressed", T.LongType()),
        T.StructField("compression_ratio", T.DoubleType()),
    ])

    def _batches(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf[text_col].fillna("").map(lambda s: s.encode("utf-8"))
            n = raw.map(len)
            c = raw.map(lambda b: len(zlib.compress(b, level)))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": n,
                "n_compressed": c,
                "compression_ratio": [
                    round(ci / ni, 6) if ni else None
                    for ci, ni in zip(c, n)
                ],
            })

    return df.select(id_col, text_col).mapInPandas(_batches, out_schema)


#: PII scrub patterns, ordered: the email pattern must run BEFORE the
#: ip pattern can eat dotted digit runs inside an address's domain.
#: Dialect-portable subset (Java regex AND RE2): no lookarounds, no \b
#: ambiguity on the replacement tokens themselves.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("intl_phone", r"\+\d{7,15}", "<PHONE>"),
)


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Redact common PII shapes (emails, IPv4 addresses, international
    phone numbers) to typed placeholder tokens — the scrub step of a
    training-data pipeline, pure JVM ``regexp_replace`` chain (no UDF;
    at 100 TB this rides the scan like any projection). The pattern
    subset is deliberately portable across regex dialects so a DuckDB
    oracle verifies the exact redacted text; real deployments extend
    ``PII_PATTERNS`` with locale-specific shapes."""
    out = F.col(text_col)
    for _name, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return df.withColumn(out_col, out)
