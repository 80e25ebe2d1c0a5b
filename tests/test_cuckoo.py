"""Cuckoo-filter seen-set: membership laws, deletion (the op Bloom can't
do), shard-local cogroup probe, and filter_unseen interchangeability."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ghcrawler_spark.operators.cuckoo import (
    SLOTS,
    CuckooShardTable,
    _delete_batch,
    _empty_table,
    _insert_batch,
    _probe_batch,
    cuckoo_buckets,
)
from ghcrawler_spark.operators.seen import filter_unseen


# ---------- numpy core (no Spark) ----------


def test_insert_probe_no_false_negatives():
    rng = np.random.RandomState(42)
    keys = rng.randint(-(2**62), 2**62, size=5000, dtype=np.int64)
    nb = cuckoo_buckets(5000)
    table = _empty_table(nb)
    assert _insert_batch(table, keys, nb)[0] == 0
    assert _probe_batch(table, keys, nb).all()


def test_probe_false_positive_rate_bounded():
    rng = np.random.RandomState(7)
    keys = rng.randint(-(2**62), 2**62, size=5000, dtype=np.int64)
    other = rng.randint(-(2**62), 2**62, size=50000, dtype=np.int64)
    other = np.setdiff1d(other, keys)
    nb = cuckoo_buckets(5000)
    table = _empty_table(nb)
    _insert_batch(table, keys, nb)
    fpr = _probe_batch(table, other, nb).mean()
    # 16-bit fingerprints, 2 buckets x 4 slots: expected ~ 8/2^16 ~ 0.00012
    assert fpr < 0.005


def test_high_load_eviction_still_placeable():
    # fill to ~85% of raw slot capacity — eviction chains must resolve
    rng = np.random.RandomState(3)
    nb = 1024
    n = int(nb * SLOTS * 0.85)
    keys = rng.randint(-(2**62), 2**62, size=n, dtype=np.int64)
    table = _empty_table(nb)
    assert _insert_batch(table, keys, nb)[0] == 0
    assert _probe_batch(table, keys, nb).all()


def test_delete_removes_membership():
    rng = np.random.RandomState(11)
    keys = rng.randint(-(2**62), 2**62, size=2000, dtype=np.int64)
    nb = cuckoo_buckets(2000)
    table = _empty_table(nb)
    _insert_batch(table, keys, nb)
    gone, kept = keys[:1000], keys[1000:]
    assert _delete_batch(table, gone, nb) == 1000
    assert not _probe_batch(table, gone, nb).any() or (
        # deleted keys may still probe positive at ~fpr via OTHER keys'
        # fingerprints — allow that tail, it is a false POSITIVE (harmless)
        _probe_batch(table, gone, nb).mean() < 0.005
    )
    # kept keys keep membership EXCEPT when a kept and a deleted key share
    # (bucket, fingerprint) — set-semantics stored them once, so the delete
    # removes both. That happens at ~fpr (this seed hits exactly one pair
    # out of 1000); in filter_unseen a miss only re-crawls one URL once.
    assert _probe_batch(table, kept, nb).mean() >= 1 - 0.005


def test_deterministic_rebuild():
    rng = np.random.RandomState(5)
    keys = rng.randint(-(2**62), 2**62, size=3000, dtype=np.int64)
    nb = cuckoo_buckets(3000)
    t1, t2 = _empty_table(nb), _empty_table(nb)
    _insert_batch(t1, np.sort(keys), nb)
    _insert_batch(t2, np.sort(keys), nb)
    assert (t1 == t2).all()


def test_reinsert_is_idempotent():
    rng = np.random.RandomState(13)
    keys = rng.randint(-(2**62), 2**62, size=1000, dtype=np.int64)
    nb = cuckoo_buckets(1000)
    table = _empty_table(nb)
    _insert_batch(table, keys, nb)
    snapshot = table.copy()
    _insert_batch(table, keys, nb)  # set semantics: no duplicate slots
    assert (table == snapshot).all()
    assert _delete_batch(table, keys, nb) == 1000
    # after one delete pass, (almost) everything is gone — duplicates were
    # never stored twice
    assert _probe_batch(table, keys, nb).mean() < 0.005


# ---------- Spark shard table ----------


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(0, 20000).select(
        (F.xxhash64("id")).alias("url_hash")
    )


def test_shard_table_build_probe(spark, keys_df):
    ck = CuckooShardTable.build(keys_df, num_shards=8)
    probed = ck.probe(keys_df)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    other = spark.range(20000, 40000).select(F.xxhash64("id").alias("url_hash"))
    fp = ck.probe(other).filter(F.col("maybe_seen")).count()
    assert fp < 0.005 * 20000
    assert ck.total_keys() == 20000
    ck.destroy()


def test_shard_table_incremental_merge_and_delete(spark, keys_df):
    first = keys_df.filter(F.col("url_hash") % 2 == 0)
    second = keys_df.filter(F.col("url_hash") % 2 != 0)
    ck0 = CuckooShardTable.empty(spark, num_shards=8, expected_per_shard=4096)
    ck1 = ck0.merged(first)
    assert ck1.probe(first).filter(~F.col("maybe_seen")).count() == 0
    ck2 = ck1.merged(second)
    assert ck2.probe(keys_df).filter(~F.col("maybe_seen")).count() == 0
    # delete the first half again — reference untag semantics
    ck3 = ck2.deleted(first)
    assert ck3.probe(second).filter(~F.col("maybe_seen")).count() == 0
    still = ck3.probe(first).filter(F.col("maybe_seen")).count()
    assert still < 0.005 * first.count()
    for c in (ck1, ck2, ck3):
        c.destroy()


def test_filter_unseen_takes_cuckoo(spark, keys_df):
    seen = keys_df.limit(10000)
    ck = CuckooShardTable.build(seen, num_shards=8)
    cands = spark.range(0, 30000).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").alias("payload")
    )
    got = set(
        r["payload"]
        for r in filter_unseen(cands, seen, ck, key_col="url_hash").collect()
    )
    want = set(
        r["payload"]
        for r in cands.join(seen, "url_hash", "left_anti").collect()
    )
    assert got == want
    ck.destroy()


def test_overflow_flag(spark):
    small = CuckooShardTable.empty(spark, num_shards=2, expected_per_shard=64)
    keys = spark.range(0, 300).select(F.xxhash64("id").alias("url_hash"))
    grown = small.merged(keys)
    assert grown.overflowed()  # 150/shard > 2 x 64
    grown.destroy()


def test_placed_count_exact_on_reinsert():
    """Round-5 pin (ADVICE r4): _insert_batch reports actually-PLACED new
    fingerprints, so a recrawl-heavy batch (same keys again) contributes 0
    to the live count — n_keys never drifts high and triggers premature
    rebuilds."""
    rng = np.random.RandomState(17)
    keys = rng.randint(-(2**62), 2**62, size=1500, dtype=np.int64)
    nb = cuckoo_buckets(1500)
    table = _empty_table(nb)
    failed, placed = _insert_batch(table, keys, nb)
    assert failed == 0
    # fp collisions may merge a handful of keys (set semantics)
    assert 1500 * 0.99 <= placed <= 1500
    failed2, placed2 = _insert_batch(table, keys, nb)
    assert (failed2, placed2) == (0, 0)  # all already present


def test_shard_overflow_raises_typed_error(spark):
    """A physically saturated shard raises CuckooShardOverflow from the
    merge cogroup (surfaced through Spark); the engine catches the message
    and falls through to the amortized rebuild instead of aborting."""
    import pytest

    from ghcrawler_spark.operators.cuckoo import (
        CuckooShardOverflow,
        CuckooShardTable,
    )

    tbl = CuckooShardTable.empty(spark, num_shards=1, expected_per_shard=4)
    # structural floor: 64 buckets x 4 slots = 256 raw slots; 600 distinct
    # keys cannot all place
    keys = spark.range(600).selectExpr("xxhash64(id) as url_hash")
    merged = tbl.merged(keys)
    with pytest.raises(Exception) as ei:
        merged.total_keys()
    assert "over capacity" in str(ei.value)
    # the typed error exists for direct (non-Spark-wrapped) callers
    assert issubclass(CuckooShardOverflow, ValueError)


def test_insert_batch_placed_is_exact_slot_delta_under_dense_fp_collisions():
    """`placed` must equal the exact number of new fingerprints written
    (the live-count contract n_keys depends on), even at high load where
    many keys share fingerprints within one slot-phase pass and eviction
    chains relocate entries (relocations don't change the count)."""
    import numpy as np

    from ghcrawler_spark.operators.cuckoo import SLOTS, _insert_batch

    rng = np.random.RandomState(42)
    nb = 64  # tiny table -> dense fingerprint collisions
    table = np.zeros(nb * SLOTS, dtype=np.uint16)
    keys = rng.randint(0, 2**63 - 1, size=180, dtype=np.int64)
    failed, placed = _insert_batch(table, keys, nb)
    assert failed == 0
    assert placed == np.count_nonzero(table)
    # re-inserting the same batch is a strict no-op (set semantics)
    before = table.copy()
    failed2, placed2 = _insert_batch(table, keys, nb)
    assert (failed2, placed2) == (0, 0)
    assert np.array_equal(table, before)
