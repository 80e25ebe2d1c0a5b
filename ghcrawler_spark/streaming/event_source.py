"""Structured-Streaming event front-end — the webhook path re-expressed.

The reference accepts HTTP webhook events, verifies them, and enqueues
`event_trigger` requests on a high-priority `events` queue
(routes/webhook.js:14-53; queue weight 10, lib/crawlerFactory.js:86,680-685).
Here the equivalent is a streaming source (Kafka/rate/file in production; any
streaming DataFrame here) flowing into a STAGING directory the batch round
engine absorbs at every round start (CrawlConfig.ingest_dir →
CrawlEngine._absorb_events, ROUND SPEC v2 step 0):

  readStream → canonicalize (same Column exprs as batch) →
  intra-batch attenuation (J4) → foreachBatch append of RAW staged events
  (url, type, event_ms, payload_id) into the staging dir.

The engine — not this producer — assigns enqueue_seq, applies malformed/
robots/in-flight dedup, routes rows onto the `events` tier (weight 10), and
accounts for them in the manifest (frontier_size/next_seq/'ingested'). That
split preserves the store's single-writer invariant: the streaming query
never touches engine tables, so no per-message broker lease/reclaim is
needed (amqp10Queue.js:163-189 analog — see round_engine module doc).

Events may carry an inline document id (payload_id): the engine processes
those without a fetch (lib/crawler.js:348-358, routes/webhook.js:42).

Watermarking bounds the cross-batch dedup state exactly like the reference's
tracker TTL (redisRequestTracker.js:106-111): within the watermark a
duplicate event is dropped here; past it, the engine's in-flight/seen rules
still apply at absorb time.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ghcrawler_spark.functions.urls import canonicalize_url

EVENTS_TIER = "events"  # weight 10 (crawlerFactory.js:86)

STAGED_SCHEMA = (
    "url string, type string, action string, event_ms long, "
    "payload_id string, verified boolean"
)


def _hmac_pads(secret: str) -> tuple[bytes, bytes]:
    key = secret.encode()
    if len(key) > 64:
        key = hashlib.sha1(key).digest()
    key = key.ljust(64, b"\x00")
    ipad = bytes(b ^ 0x36 for b in key)
    opad = bytes(b ^ 0x5C for b in key)
    return ipad, opad


def hmac_sha1_hex(secret: str, msg: Column) -> Column:
    """HMAC-SHA1 as a pure Column expression (webhook signature check,
    routes/webhook.js:15-24): sha1(opad ‖ sha1(ipad ‖ msg)), with the
    key-derived pads folded in driver-side as binary literals — the per-row
    work stays JVM-side (two sha1 calls), no UDF."""
    ipad, opad = _hmac_pads(secret)
    inner = F.sha1(F.concat(F.lit(ipad), F.encode(msg, "UTF-8")))
    return F.sha1(F.concat(F.lit(opad), F.unhex(inner)))


def event_message(url: Column, type_: Column) -> Column:
    """The signed payload: url|type (the graft's webhook body)."""
    return F.concat(url, F.lit("|"), type_)


def events_to_staged_rows(events: DataFrame, secret: str | None = None) -> DataFrame:
    """Pure transformation (works on streaming and batch frames): raw event
    rows (url, type, ts[, payload_id, sig]) → staged rows for the engine's
    ingest dir. event_ms orders first-occurrence-wins attenuation at absorb
    time.

    With ``secret`` set, each row's ``sig`` is checked against
    HMAC-SHA1(secret, url|type) — the reference drops webhook posts whose
    X-Hub-Signature doesn't match (routes/webhook.js:15-24); here mismatches
    are staged with verified=false so the engine can deadletter them with
    reason 'unverified' (auditable, vs the reference's silent 400)."""
    cols = set(events.columns)
    payload = (
        F.col("payload_id") if "payload_id" in cols else F.lit(None)
    ).cast("string")
    # deletion directives (action='deleted', ROUND SPEC v5) must survive
    # staging — dropping the column here would turn a delete into a crawl
    # request at absorb time, the opposite of the directive's intent
    action = (F.col("action") if "action" in cols else F.lit(None)).cast(
        "string"
    )
    if secret is None:
        verified = F.lit(True)
    else:
        sig = (F.col("sig") if "sig" in cols else F.lit(None)).cast("string")
        expected = hmac_sha1_hex(secret, event_message(F.col("url"), F.col("type")))
        # null url/type/sig → null comparison → unverified, not dropped
        verified = F.coalesce(sig == expected, F.lit(False))
    return events.select(
        canonicalize_url("url").alias("url"),
        F.col("type"),
        action.alias("action"),
        F.unix_millis(F.col("ts")).alias("event_ms"),
        payload.alias("payload_id"),
        verified.alias("verified"),
    )


def attach_event_stream(
    events_stream: DataFrame,
    staging_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 seconds",
    query_name: str = "events-to-staging",
    secret: str | None = None,
    rate_per_sec: float | None = None,
    burst: float = 4.0,
):
    """Wire a streaming event frame into the engine's staging directory.

    Returns the StreamingQuery. Use trigger(availableNow=True) semantics in
    tests; in production this runs continuously while the round engine does
    batch rounds — each round absorbs whatever part-files have landed by the
    time it starts (same contract as the reference, where webhook pushes
    land on the events queue between pops). Pass the same ``staging_dir`` as
    CrawlConfig.ingest_dir.

    With ``rate_per_sec`` set, the stream runs through the SAME per-host
    token-bucket limiter the batch rounds enforce (streaming/rate_limiter's
    `applyInPandasWithState`; providers/limiting/limiter.js semantics):
    over-rate events are NOT dropped — they stage with ``throttled=true``
    and the engine routes them to the low-priority 'later' tier instead of
    'events' (the streaming twin of the engine's Throttled requeue,
    lib/crawler.js:441-459). Row attributes ride through the stateful op as
    a packed JSON ``meta`` column (the op's schema is fixed)."""
    # cross-batch dedup key includes `action` when the stream carries it: a
    # deletion directive and a crawl event for the same (url, type) are
    # DIFFERENT messages — one must not suppress the other inside the
    # watermark (the engine splits them before its own first-wins dedup).
    # cacheKey-addressed deletes have url=NULL, and dropDuplicates treats
    # NULLs as equal — without the payload_id leg, two keyed deletes for
    # DIFFERENT docs would collapse to one and a deletion would be lost.
    have_in = set(events_stream.columns)
    src = events_stream
    dedup_keys = ["url", "type"]
    if "action" in have_in:
        dedup_keys.append("action")
        if "payload_id" in have_in:
            src = src.withColumn(
                "_dedup_pid",
                F.when(F.col("action") == "deleted", F.col("payload_id")),
            )
            dedup_keys.append("_dedup_pid")
    deduped = src.withWatermark("ts", watermark).dropDuplicates(dedup_keys)
    if "_dedup_pid" in dedup_keys:
        deduped = deduped.drop("_dedup_pid")
    if rate_per_sec is not None:
        from ghcrawler_spark.functions.urls import extract_host
        from ghcrawler_spark.streaming.rate_limiter import host_token_bucket

        staged = events_to_staged_rows(deduped, secret=secret)
        shaped = staged.select(
            # cacheKey-addressed deletes carry no url → null host; the
            # stateful op groups by host, so pin those rows to one '' group
            F.coalesce(extract_host(F.col("url")), F.lit("")).alias("host"),
            "url",
            "event_ms",
            F.to_json(
                F.struct("type", "action", "payload_id", "verified")
            ).alias("meta"),
        )
        limited = host_token_bucket(
            shaped, rate_per_sec=rate_per_sec, burst=burst, carry_meta=True
        )
        meta = F.from_json(
            F.col("meta"),
            "type string, action string, payload_id string, verified boolean",
        )
        deduped = limited.select(
            "url",
            meta["type"].alias("type"),
            meta["action"].alias("action"),
            "event_ms",
            meta["payload_id"].alias("payload_id"),
            meta["verified"].alias("verified"),
            (~F.col("allowed")).alias("throttled"),
        )
        pre_staged = True
    else:
        pre_staged = False

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df
            if pre_staged
            else events_to_staged_rows(batch_df, secret=secret)
        )
        # intra-batch attenuation: first occurrence per url wins (J4).
        # Deletion directives attenuate SEPARATELY from crawl events (the
        # engine splits them before its own first-wins pass, so a deletion
        # must never swallow — or be swallowed by — a payload/crawl event
        # for the same url in one micro-batch), and keyed deletes (url NULL,
        # addressed by payload_id) attenuate per-DOC: NULL urls all land in
        # one window partition, so without the payload leg two keyed deletes
        # for different docs would collapse to one
        is_del = F.coalesce(F.col("action") == "deleted", F.lit(False))
        del_pid = F.when(is_del, F.col("payload_id"))
        w = Window.partitionBy("url", is_del, del_pid).orderBy(
            "event_ms", "type"
        )
        rows = (
            rows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        rows.write.mode("append").parquet(staging_dir)

    return (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
