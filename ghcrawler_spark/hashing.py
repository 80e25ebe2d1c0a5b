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


def fast_long_hash(*cols: Column | str) -> Column:
    """xxhash64 over one or more columns — engine-internal keys only."""
    resolved = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(*resolved)
