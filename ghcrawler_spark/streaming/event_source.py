"""Structured-Streaming event front-end — the webhook path re-expressed.

The reference accepts HTTP webhook events, verifies them, and enqueues
`event_trigger` requests on a high-priority `events` queue
(routes/webhook.js:14-53; queue weight 10, lib/crawlerFactory.js:86). Here
the equivalent is a streaming source (Kafka/rate/file in production; any
streaming DataFrame here) flowing into the frontier's high-priority tier:

  readStream → canonicalize/hash (same Column exprs as batch) →
  intra-batch attenuation (J4) → foreachBatch append into the frontier
  delta directory the batch round engine already consumes.

foreachBatch (not a direct writeStream sink) because enqueue must apply the
same batch semantics as the engine's own pushes — dedup within the
micro-batch, deterministic enqueue_seq assignment — and because appends then
share the engine's snapshot/commit model. Watermarking bounds the
cross-batch dedup state exactly like the reference's tracker TTL
(redisRequestTracker.js:106-111): within the watermark a duplicate event is
Attenuated; past it, the engine's seen-set anti-join still catches it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ghcrawler_spark.functions.urls import canonicalize_url, extract_host
from ghcrawler_spark.hashing import stable_long_hash

EVENTS_TIER = "soon"  # highest batch tier (events:10 analog)


def events_to_frontier_rows(events: DataFrame, seq_base_col: str = "event_ms") -> DataFrame:
    """Pure transformation (works on streaming and batch frames): event rows
    (url, type, ts) → frontier-shaped rows on the events tier. enqueue_seq
    derives from the event timestamp + url hash (deterministic, collision-
    free enough for FIFO-within-tier ordering of an event stream)."""
    canon = canonicalize_url("url")
    return events.select(
        canon.alias("url"),
        F.col("type"),
        F.lit(EVENTS_TIER).alias("tier"),
        extract_host("url").alias("host"),
        (
            F.unix_millis(F.col("ts")) * 1024
            + F.pmod(stable_long_hash(canon), 1024)
        ).alias("enqueue_seq"),
        F.lit(0).cast("int").alias("attempt"),
    )


def attach_event_stream(
    events_stream: DataFrame,
    frontier_delta_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 seconds",
    query_name: str = "events-to-frontier",
):
    """Wire a streaming event frame into the frontier directory.

    Returns the StreamingQuery. Use trigger(availableNow=True) semantics in
    tests; in production this runs continuously while the round engine does
    batch rounds — the engine picks up whatever has been appended by the
    time a round starts (same contract as the reference, where webhook
    pushes land on the events queue between pops).
    """
    deduped = events_stream.withWatermark("ts", watermark).dropDuplicates(
        ["url", "type"]
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rows = events_to_frontier_rows(batch_df)
        # intra-batch attenuation: first occurrence per url wins (J4)
        w = Window.partitionBy("url").orderBy("enqueue_seq")
        rows = (
            rows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        rows.write.mode("append").parquet(frontier_delta_dir)

    return (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
