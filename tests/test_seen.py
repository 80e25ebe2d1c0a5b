"""Sharded Bloom seen-set: the tracker/etag-cache replacement must never
produce false negatives (a seen URL re-crawled) and must bound false
positives (SURVEY.md §5 invariant tests; reference exactness contract:
redisRequestTracker tags are exact, so our Bloom MUST be confirm-joined)."""

import io
from contextlib import redirect_stdout

import numpy as np
from pyspark.sql import functions as F

from ghcrawler_spark.operators.seen import (
    BloomShardSet,
    BloomShardTable,
    filter_unseen,
    optimal_params,
)


def test_no_false_negatives(spark):
    keys = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 1000000007).alias("url_hash")
    )
    bloom = BloomShardSet.build(keys, num_shards=8, fpr=0.01)
    probed = bloom.probe(keys)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_fpr_bounded(spark):
    seen = spark.range(0, 20000).select(F.col("id").alias("url_hash"))
    bloom = BloomShardSet.build(seen, num_shards=8, fpr=0.01)
    fresh = spark.range(1_000_000, 1_040_000).select(F.col("id").alias("url_hash"))
    fp = bloom.probe(fresh).filter(F.col("maybe_seen")).count()
    assert fp / 40000 < 0.05  # target 1%, assert with generous headroom


def test_filter_unseen_equals_exact_antijoin(spark):
    seen = spark.range(0, 3000).select(F.col("id").alias("url_hash"))
    cand = spark.range(1500, 6000).select(F.col("id").alias("url_hash"))
    bloom = BloomShardSet.build(seen, num_shards=4, fpr=0.05)
    via_bloom = sorted(
        r["url_hash"] for r in filter_unseen(cand, seen, bloom).collect()
    )
    exact = sorted(
        r["url_hash"] for r in cand.join(seen, "url_hash", "left_anti").collect()
    )
    assert via_bloom == exact


def test_filter_unseen_confirm_modes_identical(spark):
    """broadcast / shuffle / auto confirm modes (and the no-bloom broadcast
    path) all return the exact anti-join set — duplicate seen rows included
    (the seen log re-appends recrawled urls; anti-join semantics must not
    care). The broadcast path is the engine's 10^10 shape: the seen side is
    scanned map-side, never exchanged (pinned by tools/audit_plans.py)."""
    seen = spark.range(0, 3000).select(F.col("id").alias("url_hash"))
    seen = seen.unionByName(seen.limit(500))  # duplicate keys, like the log
    cand = spark.range(1500, 6000).select(F.col("id").alias("url_hash"))
    bloom = BloomShardSet.build(seen, num_shards=4, fpr=0.05)
    exact = sorted(
        r["url_hash"] for r in cand.join(seen, "url_hash", "left_anti").collect()
    )
    for mode in (True, False, None):
        got = sorted(
            r["url_hash"]
            for r in filter_unseen(
                cand, seen, bloom, confirm_broadcast=mode
            ).collect()
        )
        assert got == exact, mode
    no_bloom_bc = sorted(
        r["url_hash"]
        for r in filter_unseen(cand, seen, None, confirm_broadcast=True).collect()
    )
    assert no_bloom_bc == exact


def test_filter_unseen_none_bloom_degrades(spark):
    seen = spark.range(0, 100).select(F.col("id").alias("url_hash"))
    cand = spark.range(50, 150).select(F.col("id").alias("url_hash"))
    out = filter_unseen(cand, seen, None)
    assert sorted(r["url_hash"] for r in out.collect()) == list(range(100, 150))


def test_shard_local_equals_broadcast_equals_exact(spark):
    """The 10^10-shape probe (BloomShardTable cogroup) must return the SAME
    unseen set as the broadcast probe and the exact anti-join, on fuzzed
    keys (mixed seen/new, negative hashes, shard gaps)."""
    rng = np.random.default_rng(7)
    seen_keys = [int(x) for x in rng.integers(-(2**62), 2**62, 4000)]
    cand_keys = seen_keys[::3] + [int(x) for x in rng.integers(-(2**62), 2**62, 3000)]
    seen = spark.createDataFrame([(k,) for k in seen_keys], "url_hash long")
    cand = spark.createDataFrame([(k,) for k in set(cand_keys)], "url_hash long")
    bc = BloomShardSet.build(seen, num_shards=8, fpr=0.02)
    tbl = BloomShardTable.build(seen, num_shards=8, fpr=0.02)
    exact = sorted(r["url_hash"] for r in filter_unseen(cand, seen, None).collect())
    via_bc = sorted(r["url_hash"] for r in filter_unseen(cand, seen, bc).collect())
    via_tbl = sorted(r["url_hash"] for r in filter_unseen(cand, seen, tbl).collect())
    assert via_tbl == exact
    assert via_bc == exact


def test_shard_local_merge_and_no_broadcast_in_plan(spark):
    """Incremental merged() (cogroup OR) keeps the no-false-negative
    property, and the shard-local probe plan contains NO broadcast of the
    shard table — each task cogroups with exactly its own shard row."""
    first = spark.range(0, 2000).select(F.col("id").alias("url_hash"))
    second = spark.range(50_000, 52_000).select(F.col("id").alias("url_hash"))
    tbl = BloomShardTable.build(first, num_shards=8, fpr=0.01)
    merged = tbl.merged(second)
    both = first.unionByName(second)
    assert merged.probe(both).filter(~F.col("maybe_seen")).count() == 0
    probed = merged.probe(both)
    buf = io.StringIO()
    with redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastExchange" not in plan
    merged.destroy()
    tbl.destroy()


def test_optimal_params_monotonic():
    m1, _ = optimal_params(1000, 0.01)
    m2, _ = optimal_params(1000, 0.001)
    assert m2 > m1
    assert optimal_params(0, 0.01)[0] >= 64


def test_empty_shard_handling(spark):
    # keys that all land in one shard — other shards absent from the dict
    seen = spark.range(0, 10).select((F.col("id") * 16).alias("url_hash"))
    bloom = BloomShardSet.build(seen, num_shards=16, fpr=0.01)
    cand = spark.range(0, 200).select(F.col("id").alias("url_hash"))
    out = filter_unseen(cand, seen, bloom)
    exact = cand.join(seen, "url_hash", "left_anti")
    assert out.count() == exact.count()
