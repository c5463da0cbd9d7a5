"""Structured-Streaming operators: ingest bridge, windowed aggregation,
exact dedup, stateful online QC, and MinHash/SimHash/embedding near-dup.

Lazy exports keep `import weatherdb_spark.streaming` free of the
pyspark.sql.streaming import cost for batch-only callers.
"""

__all__ = [
    "stream_raw_files",
    "stream_into_broker",
    "windowed_stream_agg",
    "stream_dedup_exact",
    "consec_run_flags",
    "stream_neardup_pairs",
    "stream_embedding_neardup",
    "stream_simhash_neardup",
    "row_minhash_signature",
    "row_simhash_fingerprint",
    "stream_decontaminate",
    "stream_ngram_decontaminate",
    "count_collision_events",
]

_HOMES = {
    "stream_raw_files": "ingest",
    "stream_into_broker": "ingest",
    "windowed_stream_agg": "ingest",
    "stream_dedup_exact": "ingest",
    "consec_run_flags": "stateful",
    "stream_neardup_pairs": "neardup",
    "stream_embedding_neardup": "neardup",
    "stream_simhash_neardup": "neardup",
    "row_minhash_signature": "neardup",
    "row_simhash_fingerprint": "neardup",
    "stream_decontaminate": "neardup",
    "stream_ngram_decontaminate": "neardup",
    "count_collision_events": "neardup",
}


def __getattr__(name):
    if name in _HOMES:
        import importlib

        mod = importlib.import_module(
            f"weatherdb_spark.streaming.{_HOMES[name]}"
        )
        return getattr(mod, name)
    raise AttributeError(
        f"module 'weatherdb_spark.streaming' has no attribute {name!r}"
    )
