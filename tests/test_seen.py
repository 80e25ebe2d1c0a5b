"""Sharded Bloom seen-set: the tracker/etag-cache replacement must never
produce false negatives (a seen URL re-crawled) and must bound false
positives (SURVEY.md §5 invariant tests; reference exactness contract:
redisRequestTracker tags are exact, so our Bloom MUST be confirm-joined)."""

import numpy as np
from pyspark.sql import functions as F

from ghcrawler_spark.operators.seen import BloomShardSet, filter_unseen, optimal_params


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


def test_filter_unseen_none_bloom_degrades(spark):
    seen = spark.range(0, 100).select(F.col("id").alias("url_hash"))
    cand = spark.range(50, 150).select(F.col("id").alias("url_hash"))
    out = filter_unseen(cand, seen, None)
    assert sorted(r["url_hash"] for r in out.collect()) == list(range(100, 150))


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
