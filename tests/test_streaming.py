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
