"""Portable, deterministic hash expressions.

Two families:

- ``stable_long_hash`` / ``stable_hex_hash``: md5-derived, reproducible in
  ANY engine (DuckDB oracle parity: ``('0x'||substr(md5(x),1,15))::bigint``).
  Used wherever a hash value is part of a query's *answer* (dedup keys,
  MinHash, SimHash, fingerprints).
- ``fast_long_hash``: Spark's xxhash64 — JVM-side, whole-stage-codegen'd,
  ~10x cheaper. Used for engine-internal keys that never leave the engine
  (Bloom shard routing, salting). The reference keys its dedup on raw URL
  strings (providers/queuing/redisRequestTracker.js:113-117 builds
  ``prefix:{type}@{url}:{policy}``); we hash for fixed-width shuffle keys.

All of these are Column expressions — no Python UDFs, so Catalyst folds and
codegens them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 hex chars = 60 bits → always a positive signed int64 in every engine.
_HEX_PREFIX_LEN = 15


def stable_hex_hash(col: Column | str) -> Column:
    """Full md5 hex digest of the (string-cast) column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


def stable_long_hash(col: Column | str) -> Column:
    """Positive 60-bit integer hash, identical in Spark and DuckDB.

    Spark:  conv(substring(md5(x), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::bigint
    """
    return F.conv(F.substring(stable_hex_hash(col), 1, _HEX_PREFIX_LEN), 16, 10).cast(
        "long"
    )


def stable_long_hash_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: independent hash family member per seed.

    Prepending the seed digit-string to the value before md5 gives an
    independent-enough family for MinHash (k hash functions) while staying
    DuckDB-reproducible.
    """
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(f"s{seed}:"), c.cast("string"))
    return F.conv(F.substring(F.md5(salted), 1, _HEX_PREFIX_LEN), 16, 10).cast("long")


def stable_long_hash_sql(expr: str) -> str:
    """DuckDB SQL fragment equivalent to ``stable_long_hash``."""
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {_HEX_PREFIX_LEN}))::BIGINT"


def stable_long_hash_seeded_sql(expr: str, seed: int) -> str:
    """DuckDB SQL fragment equivalent to ``stable_long_hash_seeded``."""
    return (
        f"('0x' || substr(md5('s{seed}:' || CAST({expr} AS VARCHAR)), 1, "
        f"{_HEX_PREFIX_LEN}))::BIGINT"
    )


# --- universal-hash MinHash family -----------------------------------------
#
# The textbook construction: ONE stable base hash per key, then k affine
# transforms h_i(x) = (a_i·h(x) + b_i) mod p over p = 2^31-1. One md5 per
# shingle instead of k (measured 12x cheaper at sf0.1), products stay inside
# int64 (h < 2^31, a_i < 2^31 → a_i·h < 2^62), and the arithmetic is
# bit-identical in DuckDB (BIGINT % is exact for non-negative operands).

MERSENNE31 = (1 << 31) - 1


def minhash_affine_params(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for family member i; a_i never 0 mod p."""
    a = ((2 * i + 1) * 0x9E3779B1) % MERSENNE31 or 1
    b = ((i + 1) * 0x85EBCA6B) % MERSENNE31
    return a, b


def minhash_base(col: Column | str) -> Column:
    """Non-negative base hash < 2^31-1 (one md5), Spark side."""
    return F.pmod(stable_long_hash(col), F.lit(MERSENNE31))


def minhash_base_sql(expr: str) -> str:
    return f"({stable_long_hash_sql(expr)} % {MERSENNE31})"


def minhash_member(base: Column, i: int) -> Column:
    a, b = minhash_affine_params(i)
    return F.pmod(base * F.lit(a) + F.lit(b), F.lit(MERSENNE31))


def minhash_member_sql(base_expr: str, i: int) -> str:
    a, b = minhash_affine_params(i)
    return f"(({base_expr} * {a} + {b}) % {MERSENNE31})"


def fast_long_hash(*cols: Column | str) -> Column:
    """xxhash64 over one or more columns — engine-internal keys only."""
    resolved = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(*resolved)
