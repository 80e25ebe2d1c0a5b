"""Property-based tests (hypothesis) for the invariants SURVEY.md §5 calls
out: dedup idempotence on duplicate-heavy frontiers, politeness cap under
hot-host skew, Bloom no-false-negatives, canonicalization idempotence."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ghcrawler_spark.operators.seen import _build_filter, _probe_filter, optimal_params

# pure-numpy Bloom core: safe to hypothesis-fuzz without a Spark round-trip


@settings(max_examples=200, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=300),
    fpr=st.sampled_from([0.01, 0.05]),
)
def test_bloom_never_false_negative(keys, fpr):
    arr = np.array(keys, dtype=np.int64)
    m, k = optimal_params(len(set(keys)), fpr)
    blob = _build_filter(arr, m, k)
    assert _probe_filter(arr, blob, m, k).all()


@settings(max_examples=100, deadline=None)
@given(
    seen=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200),
    probe=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200),
)
def test_bloom_positive_superset_of_membership(seen, probe):
    """probe-positive set ⊇ true members; negatives are NEVER members."""
    sarr = np.array(sorted(seen), dtype=np.int64)
    parr = np.array(sorted(probe), dtype=np.int64)
    m, k = optimal_params(len(seen), 0.01)
    blob = _build_filter(sarr, m, k)
    hits = _probe_filter(parr, blob, m, k)
    for v, hit in zip(sorted(probe), hits):
        if v in seen:
            assert hit  # no false negative, ever
        # (false positives allowed — confirmed by the exact anti-join)


# Spark-backed properties: small bounded examples, session reused

@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    urls=st.lists(
        st.sampled_from(
            [f"http://h{h}.test/p{p}" for h in range(3) for p in range(4)]
        ),
        min_size=1,
        max_size=40,
    )
)
def test_attenuate_idempotent_on_duplicate_heavy_input(spark, urls):
    """attenuate(attenuate(x)) == attenuate(x) and output urls are unique —
    the duplicate-heavy frontier property (reference: AttenuatedQueue)."""
    from ghcrawler_spark.operators.frontier_ops import attenuate

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], ["seq", "url"]
    )
    once = attenuate(df, ["url"], ["seq"])
    twice = attenuate(once, ["url"], ["seq"])
    rows_once = sorted(map(tuple, once.collect()))
    rows_twice = sorted(map(tuple, twice.collect()))
    assert rows_once == rows_twice
    got_urls = [r[1] for r in rows_once]
    assert len(got_urls) == len(set(got_urls)) == len(set(urls))
    # first-wins: kept seq is the minimum for its url
    firsts = {}
    for i, u in enumerate(urls):
        firsts.setdefault(u, i)
    assert {(firsts[u], u) for u in set(urls)} == set(rows_once)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    hot_rows=st.integers(min_value=5, max_value=60),
    budget=st.integers(min_value=1, max_value=5),
)
def test_politeness_never_exceeds_budget_under_skew(spark, hot_rows, budget):
    from pyspark.sql import functions as F

    from ghcrawler_spark.operators.frontier_ops import host_topk

    rows = [(i, "hot.test") for i in range(hot_rows)] + [
        (1000 + i, f"cold{i}.test") for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["seq", "host"])
    out = host_topk(df, "host", ["seq"], k=budget)
    per_host = {r["host"]: r["count"] for r in out.groupBy("host").count().collect()}
    assert all(v <= budget for v in per_host.values())
    assert per_host["hot.test"] == min(budget, hot_rows)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    urls=st.lists(
        st.text(alphabet="abcdefgh/.:0123456789", min_size=1, max_size=24),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    parts=st.integers(min_value=1, max_value=7),
)
def test_scalable_rank_by_key_matches_global_sort(spark, urls, parts):
    """Property: the range-partitioned distributed rank equals the position
    in the globally sorted key list, at any input partitioning."""
    from ghcrawler_spark.operators.frontier_ops import scalable_rank_by_key

    df = spark.createDataFrame([(u,) for u in urls], ["url"]).repartition(parts)
    persisted = []
    got = {
        r["url"]: r["rank"]
        for r in scalable_rank_by_key(df, ["url"], "rank", buckets=4,
                                      persisted=persisted).collect()
    }
    want = {u: i + 1 for i, u in enumerate(sorted(urls))}
    assert got == want
    for f in persisted:
        f.unpersist()


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    shingles=st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=40),
    seed_i=st.integers(min_value=0, max_value=63),
)
def test_minhash_affine_family_range_and_python_parity(shingles, seed_i):
    """The universal-hash MinHash members stay inside [0, 2^31-1) and the
    Python re-derivation matches the algebra the Spark/DuckDB twins inline."""
    import hashlib

    from ghcrawler_spark.hashing import MERSENNE31, minhash_affine_params

    a, b = minhash_affine_params(seed_i)
    assert 1 <= a < MERSENNE31 and 0 <= b < MERSENNE31
    for sh in shingles:
        h = int(hashlib.md5(sh.encode()).hexdigest()[:15], 16) % MERSENNE31
        member = (h * a + b) % MERSENNE31
        assert 0 <= member < MERSENNE31
        assert h * a + b < 2**63  # the int64 overflow guarantee


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_rows=st.integers(min_value=1, max_value=40),
    budget=st.integers(min_value=1, max_value=8),
)
def test_unit_cost_cumsum_equals_rank_politeness(spark, n_rows, budget):
    """ROUND SPEC v2 invariant: with unit compute costs, the cumulative-cost
    politeness window selects exactly the rank<=budget prefix per host."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ghcrawler_spark.operators.frontier_ops import host_topk

    rows = [(i, f"h{i % 3}.test") for i in range(n_rows)]
    df = spark.createDataFrame(rows, ["seq", "host"])
    w = (
        Window.partitionBy("host")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = {
        (r["host"], r["seq"])
        for r in df.withColumn("c", F.sum(F.lit(1)).over(w))
        .filter(F.col("c") <= budget)
        .collect()
    }
    rank = {
        (r["host"], r["seq"])
        for r in host_topk(df, "host", ["seq"], k=budget).collect()
    }
    assert cum == rank
