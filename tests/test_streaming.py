"""Streaming event front-end: events flow through the streaming pipeline
into staged ingest rows; duplicates are attenuated; restart with the same
checkpoint doesn't double-append (exactly-once via checkpoint + availableNow)."""

import os

from pyspark.sql import functions as F

from ghcrawler_spark.streaming.event_source import (
    attach_event_stream,
    events_to_staged_rows,
)


def test_events_to_staged_rows_shape(spark):
    ev = spark.createDataFrame(
        [
            ("HTTP://Host.test:80//a/?q=1", "page", "2024-01-01 00:00:01"),
            ("http://host.test/b", "image", "2024-01-01 00:00:02"),
        ],
        "url string, type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = events_to_staged_rows(ev).collect()
    by_type = {r["type"]: r for r in rows}
    assert by_type["page"]["url"] == "http://host.test/a"  # canonicalized
    assert by_type["page"]["payload_id"] is None
    # FIFO: later event gets larger event_ms (absorb-order key)
    assert by_type["image"]["event_ms"] > by_type["page"]["event_ms"]


def test_webhook_signature_gate(spark, tmp_path):
    """Webhook authenticity (routes/webhook.js:15-24): a tampered signature
    stages verified=false and the engine deadletters it with reason
    'unverified'; the genuine event crawls. Engine == simulator on the
    order log and the deadletter."""
    from ghcrawler_spark.plans.round_engine import CrawlConfig, CrawlEngine
    from ghcrawler_spark.simulator import (
        ReferenceSimulator,
        SimConfig,
        webhook_signature,
    )
    from ghcrawler_spark.sources.snapshot import SnapshotStore

    secret = "s3cr3t-hook"
    good = ("http://h1.test/img/ok", "image")
    bad = ("http://h1.test/img/bad", "image")
    ev = spark.createDataFrame(
        [
            (good[0], good[1], "2024-01-01 00:00:01",
             webhook_signature(secret, *good)),
            (bad[0], bad[1], "2024-01-01 00:00:02", "deadbeef"),  # tampered
        ],
        "url string, type string, ts string, sig string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    staged = events_to_staged_rows(ev, secret=secret)
    got = {r["url"]: r["verified"] for r in staged.collect()}
    assert got == {good[0]: True, bad[0]: False}

    ingest = str(tmp_path / "staging")
    os.makedirs(ingest)
    staged.coalesce(1).write.mode("append").parquet(ingest)

    corpus = spark.createDataFrame(
        [("imgOK", good[0])], "image_id string, url string"
    )
    links = spark.createDataFrame(
        [("http://_none_/", "pages", "http://_none_/x", "page")],
        "src_url string, edge string, dst_url string, dst_type string",
    )
    store = SnapshotStore(str(tmp_path / "store"))
    eng = CrawlEngine(
        spark, store, corpus, links,
        CrawlConfig(ingest_dir=ingest, inject_failures=False, round_capacity=4),
    )
    eng.seed(spark.createDataFrame([], "url string, type string, tier string"))
    for _ in range(5):
        if not eng.run_round():
            break

    sim = ReferenceSimulator(
        {good[0]: "imgOK"}, {},
        SimConfig(inject_failures=False, round_capacity=4, webhook_secret=secret),
    )
    sim.seed([])
    sim.inject_events(
        [
            {"url": good[0], "type": good[1], "event_ms": 1,
             "sig": webhook_signature(secret, *good)},
            {"url": bad[0], "type": bad[1], "event_ms": 2, "sig": "deadbeef"},
        ]
    )
    for _ in range(5):
        if not sim.run_round():
            break

    eng_log = [
        (r["url"], r["outcome"])
        for r in store.read_appends(spark, "order_log").orderBy("seq").collect()
    ]
    sim_log = [(r["url"], r["outcome"]) for r in sim.order_log]
    assert eng_log == sim_log == [(good[0], "Processed")]
    eng_dl = {(r["url"], r["reason"]) for r in eng.current_deadletter().collect()}
    sim_dl = {(d["url"], d["reason"]) for d in sim.deadletter}
    assert eng_dl == sim_dl == {(bad[0], "unverified")}


def test_stream_to_staging_with_dedup_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    batch = spark.createDataFrame(
        [
            ("http://h1.test/p1", "page", "2024-01-01 00:00:01"),
            ("http://h1.test/p1", "page", "2024-01-01 00:00:02"),  # dup
            ("http://h2.test/p2", "page", "2024-01-01 00:00:03"),
        ],
        "url string, type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "url string, type string, ts timestamp"
    ).parquet(src)
    q = attach_event_stream(stream, staging, ckpt)
    q.awaitTermination(60)

    out = spark.read.parquet(staging)
    urls = sorted(r["url"] for r in out.collect())
    assert urls == ["http://h1.test/p1", "http://h2.test/p2"]  # dup attenuated

    # restart with same checkpoint + same input: no double-append
    stream2 = spark.readStream.schema(
        "url string, type string, ts timestamp"
    ).parquet(src)
    q2 = attach_event_stream(stream2, staging, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(staging).count() == 2


# ---------------------------------------------------------------------------
# streaming per-host token-bucket rate limiter (applyInPandasWithState)
# ---------------------------------------------------------------------------

def _write_batch(spark, src, rows, n):
    spark.createDataFrame(
        rows, "host string, url string, event_ms long"
    ).coalesce(1).write.mode("append").parquet(src)


def test_token_bucket_state_spans_microbatches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1) must produce exactly the
    decisions of ONE continuous replay — i.e. the bucket state genuinely
    carries across batches instead of resetting to full."""
    from ghcrawler_spark.streaming.rate_limiter import (
        host_token_bucket,
        replay_oracle,
    )

    src = str(tmp_path / "req")
    os.makedirs(src)
    # burst=2, rate=1/s. h1 fires 4 requests in the same second across the
    # two batches: a fresh bucket per batch would allow all 4; continuous
    # state allows only the first 2.
    b1 = [
        ("h1", "u1", 1_000), ("h1", "u2", 1_100),
        ("h2", "u3", 1_000),
    ]
    b2 = [
        ("h1", "u4", 1_200), ("h1", "u5", 1_300),
        ("h1", "u6", 4_000),  # 2.7s later: refilled enough for one token
        ("h2", "u7", 1_050),
    ]
    _write_batch(spark, src, b1, 1)
    _write_batch(spark, src, b2, 2)

    stream = spark.readStream.schema(
        "host string, url string, event_ms long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out = host_token_bucket(stream, rate_per_sec=1.0, burst=2.0)
    q = (
        out.writeStream.format("memory")
        .queryName("bucket_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.host, r.url, r.event_ms): (r.allowed, r.tokens_after)
        for r in spark.sql("select * from bucket_out").collect()
    }
    # streaming file source with maxFilesPerTrigger=1 delivers the two
    # parquet files as two batches in commit order, so the continuous
    # oracle over the concatenation is the exact expected answer
    want = replay_oracle(b1 + b2, rate_per_sec=1.0, burst=2.0)
    assert got == want
    # and the headline semantics: h1's 4 same-second requests -> 2 allowed
    h1_dense = [got[("h1", u, ms)][0] for u, ms in
                (("u1", 1_000), ("u2", 1_100), ("u4", 1_200), ("u5", 1_300))]
    assert h1_dense == [True, True, False, False]
    assert got[("h1", "u6", 4_000)][0] is True  # refill after idle gap
    assert got[("h2", "u3", 1_000)][0] and got[("h2", "u7", 1_050)][0]


def test_token_bucket_replay_matches_engine_throttle_shape(spark, tmp_path):
    """Dense single-host burst: allowed count == burst + refill budget,
    throttled rows are marked (not dropped) — the streaming twin of the
    engine's Throttled-requeue outcome."""
    from ghcrawler_spark.streaming.rate_limiter import (
        host_token_bucket,
    )

    src = str(tmp_path / "req")
    os.makedirs(src)
    rows = [("h0", f"u{i}", 1_000 + 10 * i) for i in range(20)]
    _write_batch(spark, src, rows, 1)
    stream = spark.readStream.schema(
        "host string, url string, event_ms long"
    ).parquet(src)
    out = host_token_bucket(stream, rate_per_sec=5.0, burst=3.0)
    q = (
        out.writeStream.format("memory")
        .queryName("bucket_burst")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.sql("select * from bucket_burst").collect()
    assert len(res) == 20  # throttled rows are emitted, not dropped
    # 3 burst tokens + 0.19s * 5/s = 0.95 refill -> exactly 3 allowed
    assert sum(r.allowed for r in res) == 3


def test_token_bucket_out_of_order_events_clamp():
    """Round-5 pin (ADVICE r4): an event older than the stored last_ms must
    refill NOTHING (elapsed clamped at 0) and never drive tokens negative —
    late data degrades gracefully instead of over-throttling the host."""
    import pandas as pd

    from ghcrawler_spark.streaming.rate_limiter import _bucket_replay

    # batch 1 advances last_ms to 10_000 and drains the bucket
    b1 = pd.DataFrame(
        {"host": "h", "url": [f"u{i}" for i in range(6)],
         "event_ms": [10_000] * 6}
    )
    out1, tokens, last_ms = _bucket_replay(b1, 2.0, None, 1.0, 2.0)
    assert tokens == 0.0 and last_ms == 10_000
    assert list(out1["allowed"]) == [True, True, False, False, False, False]

    # batch 2 arrives with an OLDER timestamp: no refill, tokens floored,
    # last_ms monotone
    b2 = pd.DataFrame({"host": "h", "url": ["late"], "event_ms": [3_000]})
    out2, tokens2, last_ms2 = _bucket_replay(b2, tokens, last_ms, 1.0, 2.0)
    assert bool(out2["allowed"].iloc[0]) is False
    assert tokens2 == 0.0  # never negative
    assert last_ms2 == 10_000  # did not move backwards

    # a genuinely later event refills normally from the unmoved anchor
    b3 = pd.DataFrame({"host": "h", "url": ["ok"], "event_ms": [11_500]})
    out3, tokens3, _ = _bucket_replay(b3, tokens2, last_ms2, 1.0, 2.0)
    assert bool(out3["allowed"].iloc[0]) is True  # 1.5s * 1/s = 1.5 tokens
    assert abs(tokens3 - 0.5) < 1e-9


def test_rate_limited_event_stream_routes_throttled_to_later(spark, tmp_path):
    """v5 streaming front-end unification: attach_event_stream with
    rate_per_sec runs the SAME applyInPandasWithState token bucket the batch
    lane models — staged `throttled` flags equal the pure-Python continuous
    replay on the shared schedule (batch-vs-stream equivalence), the engine
    routes throttled rows to the 'later' tier, and engine == simulator on
    the resulting pop order."""
    from ghcrawler_spark.plans.round_engine import CrawlConfig, CrawlEngine
    from ghcrawler_spark.simulator import ReferenceSimulator, SimConfig
    from ghcrawler_spark.sources.snapshot import SnapshotStore
    from ghcrawler_spark.streaming.rate_limiter import replay_oracle

    src = str(tmp_path / "src")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(staging)

    # 5 events on one host inside one second, bucket = 2 tokens @ 1/s:
    # the continuous replay allows the first two, throttles the rest
    rows = [
        (f"http://h1.test/e{i}", "page", f"2024-01-01 00:00:00.{i}00")
        for i in range(5)
    ]
    spark.createDataFrame(rows, "url string, type string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "url string, type string, ts timestamp"
    ).parquet(src)
    q = attach_event_stream(
        stream, staging, ckpt, rate_per_sec=1.0, burst=2.0
    )
    q.awaitTermination(120)

    staged = {r["url"]: r.asDict() for r in spark.read.parquet(staging).collect()}
    assert len(staged) == 5
    oracle = replay_oracle(
        [("h1.test", r["url"], r["event_ms"]) for r in staged.values()],
        rate_per_sec=1.0,
        burst=2.0,
    )
    for u, r in staged.items():
        want_throttled = not oracle[("h1.test", u, r["event_ms"])][0]
        assert r["throttled"] == want_throttled, (u, r)
    throttled_urls = {u for u, r in staged.items() if r["throttled"]}
    assert len(throttled_urls) == 3

    # engine absorbs the staged batch: throttled rows land on 'later' and
    # pop AFTER the events-tier ones; engine == simulator
    store = SnapshotStore(str(tmp_path / "store"))
    empty_corpus = spark.createDataFrame([], "image_id string, url string")
    empty_links = spark.createDataFrame(
        [], "src_url string, edge string, dst_url string, dst_type string"
    )
    eng = CrawlEngine(
        spark, store, empty_corpus, empty_links,
        CrawlConfig(round_capacity=16, bucket_capacity=8, bucket_fill=8,
                    inject_failures=False, ingest_dir=staging),
    )
    eng.seed(spark.createDataFrame(
        [], "url string, type string, tier string, policy_fetch string, "
            "policy_freshness string, map_path string"))
    sim = ReferenceSimulator({}, {}, SimConfig(
        round_capacity=16, bucket_capacity=8, bucket_fill=8,
        inject_failures=False))
    sim.inject_events([
        {"url": u, "type": "page", "event_ms": r["event_ms"],
         "throttled": r["throttled"]}
        for u, r in staged.items()
    ])
    for _ in range(4):
        if not eng.run_round():
            break
    for _ in range(4):
        if not sim.run_round():
            break
    eng_log = [
        r.asDict()
        for r in store.read_appends(spark, "order_log").orderBy("seq")
        .select("seq", "round", "pop_seq", "url", "type", "tier", "host",
                "outcome").collect()
    ]
    assert eng_log == sim.order_log
    tiers = [(r["url"], r["tier"]) for r in eng_log]
    assert {t for u, t in tiers if u in throttled_urls} == {"later"}
    assert {t for u, t in tiers if u not in throttled_urls} == {"events"}
    # weight-10 events all pop before any weight-2 later row
    seqs_ev = [r["seq"] for r in eng_log if r["tier"] == "events"]
    seqs_lt = [r["seq"] for r in eng_log if r["tier"] == "later"]
    assert max(seqs_ev) < min(seqs_lt)


def test_deletion_directive_flows_through_stream(spark, tmp_path):
    """A deletion directive (action='deleted', ROUND SPEC v5) survives the
    streaming front-end: attach_event_stream stages the ``action`` column,
    a crawl event for the SAME url in the same micro-batch is NOT swallowed
    by (or swallowing of) the directive, and the engine absorbs the staged
    batch into a tombstone + a short-circuiting Deleted revisit — matching
    the simulator fed the same events directly."""
    from ghcrawler_spark.plans.round_engine import CrawlConfig, CrawlEngine
    from ghcrawler_spark.simulator import ReferenceSimulator, SimConfig
    from ghcrawler_spark.sources.snapshot import SnapshotStore

    img = "http://h1.test/img/i1"
    src = str(tmp_path / "src")
    ingest = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(ingest)

    corpus = spark.createDataFrame([("imgA", img)], "image_id string, url string")
    links = spark.createDataFrame(
        [], "src_url string, edge string, dst_url string, dst_type string"
    )
    store = SnapshotStore(str(tmp_path / "store"))
    cfg = dict(round_capacity=4, bucket_capacity=8, bucket_fill=8,
               inject_failures=False, tombstones=True)
    eng = CrawlEngine(
        spark, store, corpus, links, CrawlConfig(ingest_dir=ingest, **cfg)
    )
    sim = ReferenceSimulator({img: "imgA"}, {}, SimConfig(**cfg))
    seeds = [{"url": img, "type": "image"}]
    eng.seed(spark.createDataFrame(
        [(img, "image", "normal")], "url string, type string, tier string"))
    sim.seed(seeds)
    for _ in range(2):  # img fetched + stored, drain
        eng.run_round()
        sim.run_round()

    # one micro-batch: deletion directive THEN a revisit event, same url
    spark.createDataFrame(
        [
            (img, "image", "2024-01-01 00:00:01", "deleted"),
            (img, "image", "2024-01-01 00:00:02", None),
        ],
        "url string, type string, ts string, action string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(
        "url string, type string, ts timestamp, action string"
    ).parquet(src)
    q = attach_event_stream(stream, ingest, ckpt)
    q.awaitTermination(60)

    staged = spark.read.parquet(ingest).collect()
    assert sorted(r["action"] or "" for r in staged) == ["", "deleted"]

    sim.inject_events([
        {"url": img, "type": "image", "event_ms": 1, "action": "deleted"},
        {"url": img, "type": "image", "event_ms": 2},
    ])
    for _ in range(4):
        if not eng.run_round():
            break
    for _ in range(4):
        if not sim.run_round():
            break
    eng_log = [
        (r["url"], r["outcome"])
        for r in store.read_appends(spark, "order_log").orderBy("seq").collect()
    ]
    assert eng_log == [(r["url"], r["outcome"]) for r in sim.order_log]
    assert eng_log == [(img, "Processed"), (img, "Deleted")]
    tombs = store.read_appends(spark, "tombstones").collect()
    assert {r["url"] for r in tombs} == {img}


def test_keyed_deletes_not_collapsed_in_stream(spark, tmp_path):
    """cacheKey-addressed deletion directives (url NULL, addressed by
    payload_id) must not collapse in the stream's url-keyed dedup /
    attenuation: two deletes for DIFFERENT docs both stage; a repeat of the
    same doc's delete attenuates."""
    src = str(tmp_path / "src")
    ingest = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(ingest)
    spark.createDataFrame(
        [
            (None, "image", "2024-01-01 00:00:01", "deleted", "k1"),
            (None, "image", "2024-01-01 00:00:02", "deleted", "k2"),
            (None, "image", "2024-01-01 00:00:03", "deleted", "k1"),  # dup
        ],
        "url string, type string, ts string, action string, payload_id string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(
        "url string, type string, ts timestamp, action string, "
        "payload_id string"
    ).parquet(src)
    q = attach_event_stream(stream, ingest, ckpt)
    q.awaitTermination(60)
    staged = spark.read.parquet(ingest).collect()
    assert sorted(r["payload_id"] for r in staged) == ["k1", "k2"]
    assert all(r["action"] == "deleted" and r["url"] is None for r in staged)
