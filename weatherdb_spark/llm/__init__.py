"""Large-scale training-data pipeline operators over the ``documents``
and ``embeddings`` tables: dedup + decontamination, similarity search,
lexical search, sampling / mixing, sequence shaping, text analysis, and
multimodal column plumbing.

Lazy exports: ``from weatherdb_spark.llm import exact_dedup`` resolves
on first use without importing every sibling module.
"""

__all__ = [
    # dedup + decontamination
    "exact_dedup", "jaccard_pairs", "minhash_lsh_pairs", "simhash_pairs",
    "simhash_pairs_exact", "connected_components", "exact_contamination",
    "minhash_contamination", "ngram_contamination",
    # similarity + lexical search
    "brute_topk", "ivf_topk", "lsh_bucket_topk", "cosine_pairs",
    "cosine_pairs_lsh", "semantic_dedup", "build_ivf_index",
    "append_to_ivf_index", "ivf_topk_indexed", "ivf_cell_stats",
    "compact_ivf_index", "check_ivf_index",
    "recall_vs_brute", "bm25_topk", "bm25_dropped_terms",
    # sampling / mixing
    "deterministic_sample", "stratified_mix", "source_quota_cap",
    # sequence shaping
    "chunk_windows", "pack_concat_chunk", "shuffle_shard",
    "write_training_shards",
    # text analysis
    "token_stats", "quality_score", "lang_id", "bag_fingerprint",
    "winnow_fingerprints", "repetition_stats", "unigram_logprob",
    "scrub_pii", "tokens_expr", "arrow_regex_tokens",
    "wordpiece_tokens", "bpe_tokens", "compression_ratio",
    # end-to-end composition + corpus management
    "prepare_training_corpus", "CorpusStore", "stream_into_corpus",
]

_HOMES = {
    "exact_dedup": "dedup", "jaccard_pairs": "dedup",
    "minhash_lsh_pairs": "dedup", "simhash_pairs": "dedup",
    "simhash_pairs_exact": "dedup", "connected_components": "dedup",
    "exact_contamination": "dedup", "minhash_contamination": "dedup",
    "ngram_contamination": "dedup",
    "brute_topk": "similarity", "ivf_topk": "similarity",
    "lsh_bucket_topk": "similarity", "cosine_pairs": "similarity",
    "cosine_pairs_lsh": "similarity", "semantic_dedup": "similarity",
    "build_ivf_index": "similarity", "append_to_ivf_index": "similarity",
    "ivf_topk_indexed": "similarity", "ivf_cell_stats": "similarity",
    "compact_ivf_index": "similarity", "check_ivf_index": "similarity",
    "recall_vs_brute": "similarity",
    "bm25_topk": "search", "bm25_dropped_terms": "search",
    "deterministic_sample": "sampling", "stratified_mix": "sampling",
    "source_quota_cap": "sampling",
    "chunk_windows": "packing", "pack_concat_chunk": "packing",
    "shuffle_shard": "packing", "write_training_shards": "packing",
    "token_stats": "text", "quality_score": "text", "lang_id": "text",
    "bag_fingerprint": "text", "winnow_fingerprints": "text",
    "repetition_stats": "text", "unigram_logprob": "text",
    "scrub_pii": "text", "tokens_expr": "text",
    "arrow_regex_tokens": "text", "wordpiece_tokens": "text",
    "bpe_tokens": "text",
    "compression_ratio": "text",
    "prepare_training_corpus": "pipeline",
    "CorpusStore": "corpus",
    "stream_into_corpus": "corpus",
}


def __getattr__(name):
    if name in _HOMES:
        import importlib

        mod = importlib.import_module(f"weatherdb_spark.llm.{_HOMES[name]}")
        return getattr(mod, name)
    raise AttributeError(
        f"module 'weatherdb_spark.llm' has no attribute {name!r}"
    )
