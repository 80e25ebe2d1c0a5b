"""Vector similarity primitives over ``array<float>`` embedding columns.

Dot/norm/cosine as pure Column expressions (``zip_with`` + ``aggregate`` —
JVM-side, no UDF). Elements are cast to double BEFORE arithmetic and results
are rounded so Spark and the DuckDB oracle agree bit-for-bit after rounding.

Sign-bit bucketing (a fixed-hyperplane LSH degenerate: coordinate
hyperplanes) gives the scale path for ANN: candidates are only compared
within their bucket, turning the O(N·Q) brute-force scan into
O(N·Q/2^bits) with a shuffle on a 4-bit key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COSINE_ROUND = 4

# dims used for sign-bit bucketing (1-indexed to match SQL element access)
BUCKET_DIMS = (1, 17, 33, 49)
# 8-bit variant for the multi-probe ANN index (256 buckets): finer
# partitions so each probe scans ~N/256, recall recovered by probing the
# Hamming-1 neighborhood of the query's bucket
BUCKET_DIMS_8 = (1, 9, 17, 25, 33, 41, 49, 57)


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column, ndigits: int = COSINE_ROUND) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), ndigits)


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(0.0, "
        f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        f"(acc, x) -> acc + x))"
    )


def cosine_sql(a: str, b: str, ndigits: int = COSINE_ROUND) -> str:
    return f"round({_dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)}), {ndigits})"


def sign_bucket(a: Column, dims: tuple = BUCKET_DIMS) -> Column:
    """Sign bucket from fixed dims — the IVF/LSH partition key."""
    bits = F.lit(0)
    for i, dim in enumerate(dims):
        bit = F.when(F.try_element_at(a, F.lit(dim)) > 0, F.lit(1 << (len(dims) - 1 - i))).otherwise(F.lit(0))
        bits = bits + bit
    return bits.cast("int")


def sign_bucket_sql(a: str, dims: tuple = BUCKET_DIMS) -> str:
    parts = []
    for i, dim in enumerate(dims):
        weight = 1 << (len(dims) - 1 - i)
        parts.append(f"(CASE WHEN {a}[{dim}] > 0 THEN {weight} ELSE 0 END)")
    return "CAST(" + " + ".join(parts) + " AS INTEGER)"


def multiprobe_buckets(bucket: Column, n_bits: int) -> Column:
    """The query's bucket plus its Hamming-1 neighborhood — the standard
    multi-probe LSH trick: instead of more hash tables, probe the buckets a
    near-neighbor most likely fell into (one flipped sign bit)."""
    return F.array(bucket, *[bucket.bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)])


def multiprobe_buckets_sql(bucket_expr: str, n_bits: int) -> str:
    probes = [bucket_expr] + [f"xor({bucket_expr}, {1 << b})" for b in range(n_bits)]
    return "[" + ", ".join(probes) + "]"
