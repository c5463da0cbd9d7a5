"""Cross-engine deterministic hashing primitives.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
algorithms, so every dedup/fingerprint operator that needs an oracle twin
hashes through md5 (identical hex in both engines) and parses the first 15
hex chars (60 bits) into a non-negative int64:

    Spark:  CAST(conv(substr(md5(s),1,15), 16, 10) AS BIGINT)
    DuckDB: ('0x' || substr(md5(s),1,15))::BIGINT

At 100 TB scale one would swap these for xxhash64 (single-pass, JVM
codegen); md5 keeps the oracle bit-exact and the operator shape identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne-ish prime for minhash permutation arithmetic; inputs are first
# reduced mod P so a*h+b stays far below int64 overflow.
MINHASH_P = 2147483647  # 2^31 - 1


def md5_int64(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative int64 (cross-engine)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_int64_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_int64`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def minhash_perm(h: Column, k: int) -> Column:
    """k-th universal-hash permutation of an md5_int64 value:
    ``((2k+1) * (h mod P) + 37k + 11) mod P``."""
    return ((2 * k + 1) * (h % MINHASH_P) + 37 * k + 11) % MINHASH_P


def minhash_perm_sql(h_expr: str, k: int) -> str:
    return f"(({2 * k + 1} * (({h_expr}) % {MINHASH_P}) + {37 * k + 11}) % {MINHASH_P})"
