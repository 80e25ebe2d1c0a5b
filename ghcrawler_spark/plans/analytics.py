"""The driver-gate query suite: every operator family from SURVEY.md §2
expressed twice — as a Spark DataFrame plan (the engine) and as ANSI SQL for
the DuckDB oracle. Names are keyed to the SURVEY operator IDs.

The `events` table stands in for the crawl frontier (one event = one queued
request): tier from event_type, politeness host from user_id, FIFO seq from
event_id, retry attempt from event_id mod 7. The mapping is one fixed spec
(``_frontier``/``FRONTIER_SQL``) shared by all frontier queries so Spark and
the oracle see the identical virtual frontier.

Float discipline (oracle hash-parity): money sums are computed in integer
cents; similarity scores are rounded (cosine 4dp, jaccard/quality 6dp);
rank columns are cast to BIGINT on both sides.
"""

from __future__ import annotations

import os

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ghcrawler_spark.functions import text as T
from ghcrawler_spark.functions import urls as U
from ghcrawler_spark.functions import vectors as V
from ghcrawler_spark.hashing import (
    minhash_base_sql as _mh_base_sql,
    stable_long_hash,
    stable_long_hash_sql,
)
from ghcrawler_spark.operators import dedup as D
from ghcrawler_spark.operators import frontier_ops as FO
from ghcrawler_spark.operators import graph as G
from ghcrawler_spark.plans import policy as P
from ghcrawler_spark.operators import similarity as S

# ---------------------------------------------------------------------------
# shared specs
# ---------------------------------------------------------------------------

TIER_WEIGHTS = {"soon": 2, "normal": 3, "later": 2}
TIER_QUOTAS = {"soon": 40, "normal": 60, "later": 40}
HOST_TOPK = 3
GATE_NOW = "2024-01-02 12:00:00"
FRESH_CUT = "1999-01-01 00:00:00"
STALE_CUT = "1997-01-01 00:00:00"
HOST_ALLOWLIST = tuple(f"h{i}" for i in range(10))
DENY_RE = "(slow|error)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _normalize_scan(spark, spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def _normalize_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Scan-parallelism floor (guide §2.5 input skew: one unsplittable
    input → repartition immediately after the read).

    The deterministic fixture tables are single-row-group parquet files, so
    the scan yields 1 effective partition and every map-only plan (the
    whole text/dedup family) runs on ONE core no matter the cluster size.
    When — and only when — the scan has fewer partitions than the session's
    parallelism, hash-repartition the rows across the cores once, right
    above the scan, keyed by xxhash64 of the table's FIRST column (the key
    column in every fixture table): deterministic under task retries (guide
    §2.5 — never rand-derived) WITHOUT round-robin's sortBeforeRepartition
    local sort, which would serialize on the single scan partition, and
    without referencing the other columns — so column pruning still reaches
    the scan (hashing the whole row would force every column through the
    exchange; guide §6). Self-tuning, not a local[32] constant: at real
    corpus scale a table has orders of magnitude more row groups than
    cores, the branch never fires, and the plan is byte-identical to before
    (no Exchange). Results are partitioning-agnostic (no query depends on
    row placement), so this is timing-only."""
    try:
        n = df.rdd.getNumPartitions()
        cores = spark.sparkContext.defaultParallelism
    except Exception:
        return df
    if n < cores:
        return df.repartition(cores, F.xxhash64(F.col(df.columns[0])))
    return df


def _frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → virtual frontier rows (the fixed spec; see module doc)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.col("ts"),
        F.when(F.col("event_type") == "error", "soon")
        .when(F.col("event_type").isin("purchase", "signup"), "normal")
        .otherwise("later")
        .alias("tier"),
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string")).alias("host"),
        (F.col("event_id") % 7).alias("attempt"),
        F.col("event_type"),
        F.col("value"),
    )

FRONTIER_SQL = """
SELECT event_id, ts,
       CASE WHEN event_type = 'error' THEN 'soon'
            WHEN event_type IN ('purchase', 'signup') THEN 'normal'
            ELSE 'later' END AS tier,
       'h' || CAST(user_id % 40 AS VARCHAR) AS host,
       event_id % 7 AS attempt,
       event_type, value
FROM events
"""

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        # fail at import on a copy-paste name collision: a silent overwrite
        # would drop a query from the driver gate while it still prints
        # all-PASS (and drift the hand-maintained registry counts)
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# S1/W1/W2 — weighted tier rotation & quota pop (queueSet.js:46-65)
# ---------------------------------------------------------------------------

@register(
    "s1_tier_quota_pop",
    f"""
    WITH frontier AS ({FRONTIER_SQL}),
    ranked AS (
      SELECT tier, event_id,
             CAST(row_number() OVER (PARTITION BY tier ORDER BY event_id) AS BIGINT)
               AS rank_in_tier
      FROM frontier
    )
    SELECT tier, event_id, rank_in_tier FROM ranked
    WHERE rank_in_tier <= CASE tier WHEN 'soon' THEN {TIER_QUOTAS['soon']}
                                    WHEN 'normal' THEN {TIER_QUOTAS['normal']}
                                    ELSE {TIER_QUOTAS['later']} END
    """,
)
def s1_tier_quota_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = _frontier(spark, sf_dir)
    out = FO.tier_quota_select(fr, "tier", ["event_id"], TIER_QUOTAS)
    return out.select(
        "tier", "event_id", F.col("rank_in_tier").cast("long").alias("rank_in_tier")
    )


@register(
    "w1_weighted_rotation",
    f"""
    WITH frontier AS ({FRONTIER_SQL}),
    ranked AS (
      SELECT tier, event_id,
             CAST(row_number() OVER (PARTITION BY tier ORDER BY event_id) AS BIGINT)
               AS rank_in_tier
      FROM frontier
    ),
    vt AS (
      SELECT tier, event_id, rank_in_tier,
             rank_in_tier * CAST(CASE tier
               WHEN 'soon' THEN {FO.WEIGHT_SCALE // TIER_WEIGHTS['soon']}
               WHEN 'normal' THEN {FO.WEIGHT_SCALE // TIER_WEIGHTS['normal']}
               ELSE {FO.WEIGHT_SCALE // TIER_WEIGHTS['later']} END AS BIGINT)
               AS virtual_time
      FROM ranked
    )
    SELECT CAST(row_number() OVER (ORDER BY virtual_time, tier, rank_in_tier) AS BIGINT)
             AS pop_seq,
           tier, event_id, virtual_time
    FROM vt
    """,
)
def w1_weighted_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable (closed-form) rotation — no global single-partition window;
    pinned equal to the window variant by tests/test_frontier_ops.py."""
    fr = _frontier(spark, sf_dir)
    out = FO.weighted_rotation_order_scalable(fr, "tier", "event_id", TIER_WEIGHTS)
    return out.select(
        F.col("pop_seq").cast("long").alias("pop_seq"),
        "tier",
        "event_id",
        "virtual_time",
    )


# ---------------------------------------------------------------------------
# W3/J7 — per-host politeness top-k
# ---------------------------------------------------------------------------

@register(
    "w3_host_topk",
    f"""
    WITH frontier AS ({FRONTIER_SQL}),
    ranked AS (
      SELECT host, event_id,
             CAST(row_number() OVER (PARTITION BY host ORDER BY event_id) AS BIGINT)
               AS host_rank
      FROM frontier
    )
    SELECT host, event_id, host_rank FROM ranked WHERE host_rank <= {HOST_TOPK}
    """,
)
def w3_host_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = _frontier(spark, sf_dir)
    out = FO.host_topk(fr, "host", ["event_id"], k=HOST_TOPK)
    return out.select(
        "host", "event_id", F.col("host_rank").cast("long").alias("host_rank")
    )


# ---------------------------------------------------------------------------
# W4/W5/O13 — retry backoff gate + deadletter threshold (crawler.js:150-154,308-311)
# ---------------------------------------------------------------------------

@register(
    "w4_backoff_gate",
    f"""
    WITH frontier AS ({FRONTIER_SQL})
    SELECT event_id, attempt,
           CASE WHEN attempt > 5 THEN 'deadletter'
                WHEN ts + to_seconds(attempt * 5) > TIMESTAMP '{GATE_NOW}' THEN 'deferred'
                ELSE 'eligible' END AS gate_status
    FROM frontier
    """,
)
def w4_backoff_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = _frontier(spark, sf_dir).withColumn(
        "not_before", F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, attempt * 5)")
    )
    out = FO.backoff_gate(fr, F.lit(GATE_NOW).cast("timestamp"))
    return out.select("event_id", "attempt", "gate_status")


# ---------------------------------------------------------------------------
# J1/J5/U3 — seen-set anti-join (the Bloom-confirm join shape)
# ---------------------------------------------------------------------------

@register(
    "j1_seen_antijoin",
    None,  # oracle registered below — _j1_oracle() is shared with j9
)
def j1_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seen-set confirm join (J1/J5): candidates left-anti seen keys.
    The seen set here is a deterministic hash sample of the frontier — the
    same url_hash-keyed shape filter_unseen() confirms Bloom positives with."""
    fr = _frontier(spark, sf_dir)
    seen = (
        fr.filter(stable_long_hash("event_id") % 5 == 0)
        .select("event_id")
        .distinct()
    )
    return fr.join(seen, "event_id", "left_anti").select("event_id", "tier", "host")


def _j1_oracle() -> str:
    """The ONE anti-join oracle both j1 and j9 validate against (a single
    definition, so the two can never silently drift apart: j9's premise is
    'identical output to the plain anti-join')."""
    return f"""
    WITH frontier AS ({FRONTIER_SQL}),
    seen AS (
      SELECT DISTINCT event_id FROM frontier
      WHERE {stable_long_hash_sql('event_id')} % 5 = 0
    )
    SELECT f.event_id, f.tier, f.host FROM frontier f
    WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.event_id = f.event_id)
    """


_ORACLES["j1_seen_antijoin"] = _j1_oracle()


@register("j9_cuckoo_unseen", _j1_oracle())
def j9_cuckoo_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1's unseen filter through the CUCKOO seen set (operators/cuckoo.py —
    the deletable fingerprint-table alternative to Bloom, reference analog
    redisRequestTracker.js:17-53 incl. untag :47-53): probe-positive rows
    hit the exact anti-join confirm, so the output is IDENTICAL to the plain
    anti-join oracle regardless of FINGERPRINT collisions — the same
    filter-then-confirm contract the Bloom path is pinned by. (The exact
    confirm keys on the 60-bit url_hash, like the whole engine: a full
    stable_long_hash collision between two distinct ids — birthday ~2e-19·n²
    — would alias them on BOTH sides of the crawl, a design-level key-width
    tradeoff the filter contract does not cover.) Shard-local cogroup
    probe; candidate keys shuffle once on the shard id."""
    from ghcrawler_spark.operators.cuckoo import CuckooShardTable
    from ghcrawler_spark.operators.seen import filter_unseen

    fr = _frontier(spark, sf_dir).withColumn(
        "url_hash", stable_long_hash("event_id")
    )
    seen_keys = (
        fr.filter(F.col("url_hash") % 5 == 0).select("url_hash").distinct()
    )
    ck = CuckooShardTable.build(seen_keys, num_shards=8)
    out = (
        filter_unseen(fr, seen_keys, ck, key_col="url_hash")
        .select("event_id", "tier", "host")
        .localCheckpoint(eager=True)
    )
    ck.destroy()
    return out


@register(
    "j2_rehydrate_join",
    """
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def j2_rehydrate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """304-cache rehydrate analog (githubFetcher.js:79-84): equi-join the
    frontier against the doc store; dim side broadcast."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = _t(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")


@register(
    "j4_attenuate_dropdup",
    """
    WITH frontier AS (SELECT event_id, user_id, event_type FROM events),
    ranked AS (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
      FROM frontier
    )
    SELECT user_id, event_type, event_id FROM ranked WHERE rn = 1
    """,
)
def j4_attenuate_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    return FO.attenuate(ev, ["user_id", "event_type"], ["event_id"]).select(
        "user_id", "event_type", "event_id"
    )


# ---------------------------------------------------------------------------
# F1/F2/F5 — filters & freshness predicates
# ---------------------------------------------------------------------------

@register(
    "f1_allowlist_filter",
    f"""
    WITH frontier AS ({FRONTIER_SQL})
    SELECT event_id, host FROM frontier
    WHERE host IN ({', '.join(repr(h) for h in HOST_ALLOWLIST)})
    """,
)
def f1_allowlist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = _frontier(spark, sf_dir)
    return fr.filter(F.col("host").isin(*HOST_ALLOWLIST)).select("event_id", "host")


@register(
    "f2_regex_denylist",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE NOT regexp_matches(text, '{DENY_RE}')
    """,
)
def f2_regex_denylist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(~F.col("text").rlike(DENY_RE)).select("doc_id", "lang")


@register(
    "f5_freshness_policy",
    f"""
    SELECT CASE WHEN o_orderdate >= TIMESTAMP '{FRESH_CUT}' THEN 'fresh'
                WHEN o_orderdate >= TIMESTAMP '{STALE_CUT}' THEN 'stale'
                ELSE 'reprocess' END AS freshness,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders GROUP BY 1
    """,
)
def f5_freshness_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shouldProcess freshness buckets (traversalPolicy.js:170-188): fresh →
    skip, stale → etag-check, expired → reprocess."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "freshness",
            F.when(F.col("o_orderdate") >= F.lit(FRESH_CUT).cast("timestamp"), "fresh")
            .when(F.col("o_orderdate") >= F.lit(STALE_CUT).cast("timestamp"), "stale")
            .otherwise("reprocess"),
        )
        .groupBy("freshness")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# F8 — URL canonicalization + portable hash (the identity of the engine)
# ---------------------------------------------------------------------------

_RAW_URL_SQL = (
    "'HTTP://Src-' || source || '.test:80//docs//' || CAST(doc_id AS VARCHAR) "
    "|| '/?session=1#frag'"
)


@register(
    "f8_url_canonicalize",
    f"""
    SELECT doc_id,
           {U.canonicalize_url_sql(_RAW_URL_SQL)} AS canon_url,
           {U.extract_host_sql(_RAW_URL_SQL)} AS host,
           {stable_long_hash_sql(U.canonicalize_url_sql(_RAW_URL_SQL))} AS url_hash
    FROM documents
    """,
)
def f8_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTP://Src-"),
        F.col("source"),
        F.lit(".test:80//docs//"),
        F.col("doc_id").cast("string"),
        F.lit("/?session=1#frag"),
    )
    canon = U.canonicalize_url(raw)
    return docs.select(
        "doc_id",
        canon.alias("canon_url"),
        U.extract_host(raw).alias("host"),
        stable_long_hash(canon).alias("url_hash"),
    )


# ---------------------------------------------------------------------------
# W6 — pagination fan-out (githubProcessor.js:58-79)
# ---------------------------------------------------------------------------

@register(
    "w6_pagination_fanout",
    """
    SELECT o_orderkey, unnest(generate_series(2, 2 + (o_orderkey // 10) % 4)) AS page
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def w6_pagination_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection-page prefetch fan-out (githubProcessor.js:58-79): page 1 is
    in hand, pages 2..last_page become child frontier rows via explode."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    last_page = 2 + (F.col("o_orderkey") / 10).cast("long") % 4
    return orders.select(
        "o_orderkey",
        F.explode(F.sequence(F.lit(2).cast("long"), last_page)).alias("page"),
    )


# ---------------------------------------------------------------------------
# A1/A3/A5 — windowed rate counters & queue metrics
# ---------------------------------------------------------------------------

@register(
    "a1_rate_window",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY 1, 2
    """,
)
def a1_rate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )


@register(
    "a3_queue_depth",
    f"""
    WITH frontier AS ({FRONTIER_SQL})
    SELECT tier, CAST(count(*) AS BIGINT) AS depth FROM frontier GROUP BY tier
    """,
)
def a3_queue_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = _frontier(spark, sf_dir)
    return fr.groupBy("tier").agg(F.count(F.lit(1)).alias("depth"))


@register(
    "a5_outcome_metrics",
    f"""
    WITH frontier AS ({FRONTIER_SQL}),
    gated AS (
      SELECT tier,
             CASE WHEN attempt > 5 THEN 'deadletter'
                  WHEN ts + to_seconds(attempt * 5) > TIMESTAMP '{GATE_NOW}' THEN 'deferred'
                  ELSE 'eligible' END AS gate_status
      FROM frontier
    )
    SELECT tier, gate_status, CAST(count(*) AS BIGINT) AS n
    FROM gated GROUP BY tier, gate_status
    """,
)
def a5_outcome_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = _frontier(spark, sf_dir).withColumn(
        "not_before", F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, attempt * 5)")
    )
    gated = FO.backoff_gate(fr, F.lit(GATE_NOW).cast("timestamp"))
    return gated.groupBy("tier", "gate_status").agg(F.count(F.lit(1)).alias("n"))


@register(
    "a6_metrics_rollup",
    f"""
    WITH frontier AS ({FRONTIER_SQL})
    SELECT coalesce(tier, '(all)') AS tier,
           coalesce(event_type, '(all)') AS event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM frontier GROUP BY ROLLUP(tier, event_type)
    """,
)
def a6_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics rollup (SURVEY §2.4: Catalyst grouping-sets 'for free' —
    per-tier, per-(tier,type), and grand-total counts in one pass)."""
    fr = _frontier(spark, sf_dir)
    return (
        fr.rollup("tier", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("tier"), F.lit("(all)")).alias("tier"),
            F.coalesce(F.col("event_type"), F.lit("(all)")).alias("event_type"),
            "n",
        )
    )


@register(
    "s6_upsert_latest",
    """
    WITH ranked AS (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM ranked WHERE rn = 1
    """,
)
def s6_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-store upsert shape (S6: MERGE last-writer-wins on the key) as a
    window: latest row per key."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
        )
    )


@register(
    "s7_tombstone_visibility",
    """
    WITH ranked AS (
      SELECT user_id, event_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id AS live_event_id
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
)
def s7_tombstone_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone visibility (ROUND SPEC v5; lib/crawler.js:375,433-434
    deletedAt): merge-on-read with DELETES — 'error' events stand in for
    deletion directives, and a key is visible iff its LATEST row is not a
    deletion (deletion wins ties by construction of the strict ordering).
    This is the store-side semantics behind the engine's `tombstones`
    table: last-writer-wins upsert where the last writer may be a delete."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select("user_id", F.col("event_id").alias("live_event_id"))
    )


@register(
    "x1_json_extract",
    """
    SELECT event_type,
           CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def x1_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar family (§2.8: the reference round-trips queue messages
    through JSON; here: parse the props payload and aggregate a field)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("k_sum"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "f9_urn_identity",
    """
    WITH built AS (
      SELECT doc_id,
             ('urn' || ':' || 'src' || ':' || source) || ':' || 'doc' || ':'
               || CAST(doc_id AS VARCHAR) AS urn
      FROM documents
    )
    SELECT doc_id, urn,
           string_split(urn, ':')[len(string_split(urn, ':')) - 1] AS urn_type,
           array_to_string(list_slice(string_split(urn, ':'), 1,
                           len(string_split(urn, ':')) - 2), ':') AS parent_urn
    FROM built
    """,
)
def f9_urn_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URN identity chain (lib/request.js:106-117): build the hierarchical
    doc key from the parent qualifier, then recover type + parent from it."""
    from ghcrawler_spark.functions.urns import child_urn, root_urn, urn_parent, urn_type

    docs = _t(spark, sf_dir, "documents")
    built = docs.select(
        "doc_id",
        child_urn(root_urn(F.lit("src"), F.col("source")), F.lit("doc"), F.col("doc_id")).alias("urn"),
    )
    return built.select(
        "doc_id",
        "urn",
        urn_type("urn").alias("urn_type"),
        urn_parent("urn").alias("parent_urn"),
    )


@register(
    "f10_urn_prefix_rollup",
    """
    WITH built AS (
      SELECT doc_id,
             ('urn' || ':' || 'src' || ':' || source) || ':' || 'doc' || ':'
               || CAST(doc_id AS VARCHAR) AS urn
      FROM documents
    )
    SELECT array_to_string(list_slice(string_split(urn, ':'), 1,
                           len(string_split(urn, ':')) - 2), ':') AS parent_urn,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM built
    WHERE urn LIKE 'urn:src:%'
    GROUP BY parent_urn
    """,
)
def f10_urn_prefix_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URN-prefix storage query — the reference's primary lookup shape
    ("all commits of repo 12"): stored docs are keyed by hierarchical URN
    (lib/request.js:106-140; urlToUrnMappingStore.js:18-41), so subtree
    queries are prefix scans + parent rollups. Scale shape: pure string
    exprs + one hash aggregation on the derived parent key — codegen'd,
    no joins; at 10^10 docs this is a single shuffle on parent_urn."""
    from ghcrawler_spark.functions.urns import child_urn, root_urn, urn_parent

    docs = _t(spark, sf_dir, "documents")
    built = docs.select(
        "doc_id",
        child_urn(
            root_urn(F.lit("src"), F.col("source")), F.lit("doc"), F.col("doc_id")
        ).alias("urn"),
    )
    return (
        built.filter(F.col("urn").startswith("urn:src:"))
        .groupBy(urn_parent("urn").alias("parent_urn"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# D1-D5 — deduplication family (documents)
# ---------------------------------------------------------------------------

_TOKENS_SQL = T.tokens_sql("text")
_SHINGLES_SQL = T.shingles_sql("text", 3)

_DOC_SHINGLES_SQL = f"""
  SELECT DISTINCT doc_id AS doc, s.shingle AS shingle
  FROM documents, unnest({_SHINGLES_SQL}) AS s(shingle)
"""

_JACCARD_PAIRS_SQL = f"""
  WITH sh AS ({_DOC_SHINGLES_SQL}),
  sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
  inter AS (
    SELECT a.doc AS id_a, b.doc AS id_b, count(*) AS n_inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY 1, 2
  )
  SELECT i.id_a, i.id_b,
         round(i.n_inter / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE), 6)
           AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc = i.id_a
  JOIN sizes sb ON sb.doc = i.id_b
"""

# verify-twin of the ENGINE's hashed shingle sets: minhash_lsh_pairs /
# minhash_lsh_incremental intersect 31-bit minhash_base values (dedup.py
# _array_signatures `hs`), not raw shingle strings — hashing the oracle's
# shingles with the SAME family makes d3/d10 parity exact BY CONSTRUCTION
# at any scale, instead of drifting when two shingles in one document
# collide mod 2^31-1 (~1e-6 per ~90-shingle doc: a latent gate failure at
# large corpus sizes; the jaccard value itself shifts by ≤1e-6 vs the
# raw-string spec). d2/d6/d7 keep the raw-string oracle — their engine
# side (ngram_jaccard_pairs) is raw-string exact.
_HASHED_DOC_SHINGLES_SQL = f"""
  SELECT DISTINCT doc_id AS doc, {_mh_base_sql('s.shingle')} AS shingle
  FROM documents, unnest({_SHINGLES_SQL}) AS s(shingle)
"""
# same jaccard body, hashed shingle CTE swapped in (textual substitution
# keeps the two bodies identical forever)
_HASHED_JACCARD_PAIRS_SQL = _JACCARD_PAIRS_SQL.replace(
    _DOC_SHINGLES_SQL, _HASHED_DOC_SHINGLES_SQL
)


@register(
    "d1_dedup_exact",
    f"""
    SELECT {stable_long_hash_sql('text')} AS text_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def d1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.dedup_exact(docs, "doc_id", "text")


@register(
    "d2_ngram_jaccard",
    f"""
    SELECT id_a, id_b, jaccard FROM ({_JACCARD_PAIRS_SQL}) WHERE jaccard >= 0.2
    """,
)
def d2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.2)


def _minhash_sql(num_hashes: int = D.MINHASH_FUNCS) -> str:
    from ghcrawler_spark.hashing import minhash_base_sql, minhash_member_sql

    mins = ", ".join(
        f"CAST(min({minhash_member_sql('h', i)}) AS BIGINT) AS mh_{i}"
        for i in range(num_hashes)
    )
    base = (
        f"SELECT doc, {minhash_base_sql('shingle')} AS h FROM ({_DOC_SHINGLES_SQL})"
    )
    return f"SELECT doc, {mins} FROM ({base}) GROUP BY doc"


def _minhash_bands_sql(num_hashes: int = D.MINHASH_FUNCS, bands: int = D.MINHASH_BANDS) -> str:
    rows = num_hashes // bands
    selects = []
    for b in range(bands):
        members = " || '|' || ".join(
            f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        selects.append(
            f"SELECT doc, {b} AS band, md5({members}) AS bkey FROM sigs"
        )
    return " UNION ALL ".join(selects)


@register(
    "d3_minhash_lsh",
    f"""
    WITH sigs AS ({_minhash_sql()}),
    banded AS ({_minhash_bands_sql()}),
    cand AS (
      SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc < b.doc
    ),
    exact AS ({_HASHED_JACCARD_PAIRS_SQL})
    SELECT c.id_a, c.id_b, e.jaccard
    FROM cand c JOIN exact e ON e.id_a = c.id_a AND e.id_b = c.id_b
    WHERE e.jaccard >= 0.5
    """,
)
def d3_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, "doc_id", "text", k=3, threshold=0.5)


@register(
    "d4_simhash_signatures",
    f"""
    WITH tok AS (
      SELECT DISTINCT doc_id AS doc, t.tok AS tok
      FROM documents, unnest({_TOKENS_SQL}) AS t(tok)
    ),
    hashed AS (SELECT doc, {stable_long_hash_sql('tok')} AS th FROM tok),
    per_bit AS (
      SELECT doc, b.bit AS bit,
             sum(CASE WHEN (th >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM hashed, unnest(generate_series(0, {D.SIMHASH_BITS - 1})) AS b(bit)
      GROUP BY doc, b.bit
    )
    SELECT doc,
           CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM per_bit GROUP BY doc
    """,
)
def d4_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.simhash(docs, "doc_id", "text")


@register(
    "d5_embedding_neardup",
    f"""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(embedding,
                            x -> CAST(x * CAST(1.5 AS FLOAT) AS FLOAT))
      FROM embeddings WHERE vec_id < 50
    ),
    b AS (SELECT vec_id, embedding,
                 {V.sign_bucket_sql('embedding')} AS bucket
          FROM aug)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {V.cosine_sql('a.embedding', 'b.embedding')} AS score
    FROM b a JOIN b b ON a.vec_id < b.vec_id AND a.bucket = b.bucket
    WHERE {V.cosine_sql('a.embedding', 'b.embedding')} >= 0.8
    """,
)
def d5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup with sign-bucket blocking — the scale path (the
    all-pairs cross join is O(N²); blocking turns it into 2^bits per-bucket
    joins). The random fixture has no natural near-dups, so 50 SCALED COPIES
    (cosine exactly 1.0, same sign bucket) are planted in-query — the pair
    math is exercised on real matches, not an empty result. Float-cast on
    both sides keeps the planted vectors bit-identical in Spark and DuckDB.
    The exact unblocked scan shape is covered by n1_ann_bruteforce."""
    emb = _t(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.5).cast("float")).cast("float")
        ).alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(planted)
    return S.embedding_near_dup_pairs(aug, threshold=0.8, bucketed=True)


@register(
    "d6_dedup_clusters",
    f"""
    WITH RECURSIVE pairs AS (
      SELECT id_a, id_b FROM ({_JACCARD_PAIRS_SQL}) WHERE jaccard >= 0.2
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
    )
    SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
    FROM reach GROUP BY id
    """,
)
def d6_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components (keep one doc per CLUSTER).
    Oracle: transitive closure via recursive CTE; engine: iterative
    min-label propagation (operators/dedup.connected_components)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.2)
    out = D.connected_components(pairs, docs.select("doc_id"), id_col="doc_id")
    return out.select("doc_id", "cluster_id")


# ---------------------------------------------------------------------------
# N1/N2 — similarity search (embeddings)
# ---------------------------------------------------------------------------

_ANN_K = 10
_N_QUERIES = 5

_ANN_BF_SQL = f"""
  WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
             WHERE vec_id < {_N_QUERIES}),
  scored AS (
    SELECT q.qid, e.vec_id,
           {V.cosine_sql('e.embedding', 'q.qvec')} AS score
    FROM embeddings e, q
  ),
  ranked AS (
    SELECT qid, vec_id, score,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC)
                AS BIGINT) AS rnk
    FROM scored
  )
  SELECT qid, vec_id, score, rnk FROM ranked WHERE rnk <= {_ANN_K}
"""


@register("n1_ann_bruteforce", _ANN_BF_SQL)
def n1_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = S.ann_bruteforce(emb, q, k=_ANN_K)
    return out.select("qid", "vec_id", "score", F.col("rnk").cast("long").alias("rnk"))


@register(
    "n2_ann_bucketed",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec,
                      {V.sign_bucket_sql('embedding')} AS bucket
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id, embedding, {V.sign_bucket_sql('embedding')} AS bucket
          FROM embeddings),
    scored AS (
      SELECT q.qid, c.vec_id,
             {V.cosine_sql('c.embedding', 'q.qvec')} AS score
      FROM c JOIN q ON c.bucket = q.bucket
    ),
    ranked AS (
      SELECT qid, vec_id, score,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC)
                  AS BIGINT) AS rnk
      FROM scored
    )
    SELECT qid, vec_id, score, rnk FROM ranked WHERE rnk <= {_ANN_K}
    """,
)
def n2_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = S.ann_bucketed(emb, q, k=_ANN_K)
    return out.select("qid", "vec_id", "score", F.col("rnk").cast("long").alias("rnk"))


# ---------------------------------------------------------------------------
# T1/T2 — text analysis (documents)
# ---------------------------------------------------------------------------

@register(
    "t1_text_analysis",
    f"""
    SELECT doc_id,
           {T.predicted_lang_sql('text')} AS pred_lang,
           {T.quality_score_sql('text')} AS quality,
           CAST({T.token_count_ws_sql('text')} AS BIGINT) AS tok_ws,
           CAST({T.token_count_bpe_sql('text')} AS BIGINT) AS tok_bpe
    FROM documents
    """,
)
def t1_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hoisted-token plan (text.text_profile): tokenize once per doc instead
    # of once per lambda reference (~30x per row before) — same values
    docs = _t(spark, sf_dir, "documents")
    return T.text_profile(docs, "doc_id", "text")


@register(
    "t2_fingerprint",
    f"""
    SELECT doc_id, CAST({T.fingerprint_sql('text')} AS BIGINT) AS fp
    FROM documents
    """,
)
def t2_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint("text").alias("fp"))


# ---------------------------------------------------------------------------
# flagship: one crawl-round candidate selection end-to-end
# ---------------------------------------------------------------------------

@register(
    "flagship_crawl_round",
    f"""
    WITH frontier AS ({FRONTIER_SQL}),
    gated AS (
      SELECT * FROM frontier
      WHERE NOT (attempt > 5)
        AND NOT (ts + to_seconds(attempt * 5) > TIMESTAMP '{GATE_NOW}')
    ),
    seen AS (SELECT DISTINCT event_id FROM frontier WHERE event_type = 'purchase'),
    unseen AS (
      SELECT g.* FROM gated g WHERE NOT EXISTS
        (SELECT 1 FROM seen s WHERE s.event_id = g.event_id)
    ),
    polite AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY host ORDER BY event_id) AS BIGINT)
               AS host_rank
      FROM unseen
    ),
    capped AS (SELECT * FROM polite WHERE host_rank <= {HOST_TOPK}),
    ranked AS (
      SELECT tier, event_id, host, host_rank,
             CAST(row_number() OVER (PARTITION BY tier ORDER BY event_id) AS BIGINT)
               AS rank_in_tier
      FROM capped
    ),
    vt AS (
      SELECT *, rank_in_tier * CAST(CASE tier
               WHEN 'soon' THEN {FO.WEIGHT_SCALE // TIER_WEIGHTS['soon']}
               WHEN 'normal' THEN {FO.WEIGHT_SCALE // TIER_WEIGHTS['normal']}
               ELSE {FO.WEIGHT_SCALE // TIER_WEIGHTS['later']} END AS BIGINT)
               AS virtual_time
      FROM ranked
    )
    SELECT CAST(row_number() OVER (ORDER BY virtual_time, tier, rank_in_tier) AS BIGINT)
             AS pop_seq,
           tier, event_id, host, host_rank
    FROM vt
    """,
)
def flagship_crawl_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full crawl-round candidate selection: backoff gate → seen-set
    anti-join → per-host politeness cap → deterministic weighted pop order.
    This is the composed plan the round engine (plans/round_engine.py) runs
    against the real frontier table."""
    fr = _frontier(spark, sf_dir).withColumn(
        "not_before", F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, attempt * 5)")
    )
    gated = (
        FO.backoff_gate(fr, F.lit(GATE_NOW).cast("timestamp"))
        .filter(F.col("gate_status") == "eligible")
        .drop("gate_status")
    )
    seen = fr.filter(F.col("event_type") == "purchase").select("event_id").distinct()
    unseen = gated.join(seen, "event_id", "left_anti")
    capped = FO.host_topk(unseen, "host", ["event_id"], k=HOST_TOPK)
    # the scalable rotation (closed-form interleave, no global window) — the
    # plan actually run at 100TB; tests pin it equal to the window variant
    ordered = FO.weighted_rotation_order_scalable(
        capped, "tier", "event_id", TIER_WEIGHTS
    )
    return ordered.select(
        F.col("pop_seq").cast("long").alias("pop_seq"),
        "tier",
        "event_id",
        "host",
        F.col("host_rank").cast("long").alias("host_rank"),
    )




# ---------------------------------------------------------------------------
# F6/U2/A2/J6/S4 — policy, history, compute-cost, token-bench, lease operators
# ---------------------------------------------------------------------------

@register(
    "f6_fetch_source",
    """
    WITH reqs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'page' END AS type,
             doc_id % 3 = 0 AS stored,
             CASE doc_id % 5 WHEN 0 THEN 'storageOnly'
                             WHEN 1 THEN 'originStorage'
                             WHEN 2 THEN 'storageOriginIfMissing'
                             WHEN 3 THEN 'mutables'
                             ELSE 'originOnly' END AS policy_fetch
      FROM documents
    )
    SELECT doc_id, type, policy_fetch,
           CASE policy_fetch
             WHEN 'storageOnly' THEN
               CASE WHEN stored THEN 'storage' ELSE 'skip' END
             WHEN 'originOnly' THEN 'origin'
             WHEN 'storageOriginIfMissing' THEN
               CASE WHEN stored THEN 'storage' ELSE 'origin' END
             ELSE
               CASE WHEN stored AND type = 'image' THEN 'storage'
                    WHEN stored THEN 'etag' ELSE 'origin' END
           END AS fetch_src
    FROM reqs
    """,
)
def f6_fetch_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: fetch-source resolution (traversalPolicy.js:205-223) as a pure
    Column expression — the same plans/policy.fetch_source the round engine
    consults, evaluated over a deterministic policy/mutability/stored grid."""
    from ghcrawler_spark.plans.policy import fetch_source

    docs = _t(spark, sf_dir, "documents")
    reqs = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("page").alias("type"),
        (F.col("doc_id") % 3 == 0).alias("stored"),
        F.element_at(
            F.array(
                F.lit("storageOnly"),
                F.lit("originStorage"),
                F.lit("storageOriginIfMissing"),
                F.lit("mutables"),
                F.lit("originOnly"),
            ),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ).alias("policy_fetch"),
    )
    return reqs.select(
        "doc_id",
        "type",
        "policy_fetch",
        fetch_source(F.col("policy_fetch"), F.col("type"), F.col("stored")).alias(
            "fetch_src"
        ),
    )


@register(
    "u2_history_hasseen",
    """
    WITH reqs AS (
      SELECT doc_id,
             'doc@' || CAST(doc_id % 50 AS VARCHAR) AS child_key,
             ['doc@' || CAST(doc_id % 3 AS VARCHAR),
              'doc@' || CAST(doc_id % 5 AS VARCHAR),
              'doc@' || CAST(doc_id % 7 AS VARCHAR)] AS history
      FROM documents
    )
    SELECT doc_id, child_key FROM reqs
    WHERE NOT list_contains(history, child_key)
    """,
)
def u2_history_hasseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: per-traversal hasSeen (lib/request.js:66-74,146-150) — a child
    edge is invisible when its key appears in the request's history array;
    the same array_contains guard the round engine applies to child rows."""
    docs = _t(spark, sf_dir, "documents")
    key = F.concat(F.lit("doc@"), (F.col("doc_id") % 50).cast("string"))
    hist = F.array(
        *[
            F.concat(F.lit("doc@"), (F.col("doc_id") % m).cast("string"))
            for m in (3, 5, 7)
        ]
    )
    return (
        docs.select("doc_id", key.alias("child_key"), hist.alias("history"))
        .filter(~F.expr("array_contains(history, child_key)"))
        .select("doc_id", "child_key")
    )


@register(
    "a2_compute_budget",
    f"""
    WITH frontier AS ({FRONTIER_SQL}),
    costed AS (
      SELECT host, event_id,
             CAST(CASE event_type WHEN 'purchase' THEN 3
                                  WHEN 'signup' THEN 2 ELSE 1 END AS BIGINT)
               AS cost
      FROM frontier
    ),
    cum AS (
      SELECT host, event_id, cost,
             CAST(sum(cost) OVER (PARTITION BY host ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS spent
      FROM costed
    )
    SELECT host, event_id, cost, spent FROM cum WHERE spent <= 6
    """,
)
def a2_compute_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: compute-cost budget (computeLimiter.js:27-77) — per-host
    cumulative cost in FIFO order, truncated at the budget; the cumulative
    window the engine's politeness stage runs (ROUND SPEC v2 step 3)."""
    from pyspark.sql import Window

    fr = _frontier(spark, sf_dir)
    cost = (
        F.when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "signup", 2)
        .otherwise(1)
        .cast("long")
    )
    w = (
        Window.partitionBy("host")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        fr.withColumn("cost", cost)
        .withColumn("spent", F.sum("cost").over(w).cast("long"))
        .filter(F.col("spent") <= 6)
        .select("host", "event_id", "cost", "spent")
    )


@register(
    "j6_token_bench",
    f"""
    WITH frontier AS ({FRONTIER_SQL}),
    tokens AS (
      SELECT * FROM (VALUES
        ('error',    TIMESTAMP '2024-01-02 18:00:00'),
        ('purchase', TIMESTAMP '2024-01-01 00:00:00'),
        ('signup',   TIMESTAMP '2024-01-03 00:00:00')
      ) AS t(trait, bench_until)
    )
    SELECT f.event_id, f.event_type AS trait,
           CASE WHEN t.trait IS NULL THEN 'no_token'
                WHEN TIMESTAMP '{GATE_NOW}' < t.bench_until THEN 'benched'
                ELSE 'ready' END AS token_status
    FROM frontier f LEFT JOIN tokens t ON t.trait = f.event_type
    """,
)
def j6_token_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: token trait matching + benching (tokenFactory.js:41-93) — requests
    join a (trait, bench_until) token table; benched tokens defer their
    requests, absent tokens reject them. The broadcast-join shape the engine
    uses for trait budgets."""
    fr = _frontier(spark, sf_dir)
    tokens = spark.createDataFrame(
        [
            ("error", "2024-01-02 18:00:00"),
            ("purchase", "2024-01-01 00:00:00"),
            ("signup", "2024-01-03 00:00:00"),
        ],
        "trait string, bench_until string",
    ).withColumn("bench_until", F.col("bench_until").cast("timestamp"))
    now = F.lit(GATE_NOW).cast("timestamp")
    return (
        fr.join(F.broadcast(tokens), fr.event_type == tokens.trait, "left")
        .select(
            "event_id",
            F.col("event_type").alias("trait"),
            F.when(F.col("bench_until").isNull(), "no_token")
            .when(now < F.col("bench_until"), "benched")
            .otherwise("ready")
            .alias("token_status"),
        )
    )


@register(
    "s4_lease_reclaim",
    f"""
    WITH frontier AS ({FRONTIER_SQL}),
    leased AS (
      SELECT event_id, host,
             'w' || CAST(event_id % 3 AS VARCHAR) AS lease_owner,
             ts + to_seconds(60 + attempt * 300) AS locked_until
      FROM frontier
    )
    SELECT event_id, host, lease_owner,
           CASE WHEN locked_until > TIMESTAMP '{GATE_NOW}'
                THEN 'held' ELSE 'reclaimed' END AS lease_status
    FROM leased
    """,
)
def s4_lease_reclaim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S5: broker lease visibility-timeout reclaim (amqp10Queue.js:163-189,
    253-268) — messages whose lock expired are reclaimable by any worker.
    The engine itself needs no per-message leases (single-writer snapshot
    invariant, round_engine module doc) but the operator shape is here for
    multi-writer queue fronts."""
    fr = _frontier(spark, sf_dir)
    locked = F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, 60 + attempt * 300)")
    now = F.lit(GATE_NOW).cast("timestamp")
    return fr.select(
        "event_id",
        "host",
        F.concat(F.lit("w"), (F.col("event_id") % 3).cast("string")).alias(
            "lease_owner"
        ),
        F.when(locked > now, "held").otherwise("reclaimed").alias("lease_status"),
    )




@register(
    "n3_ann_multiprobe",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec,
                      {V.sign_bucket_sql('embedding', V.BUCKET_DIMS_8)} AS bucket
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    probes AS (
      SELECT qid, qvec,
             unnest({V.multiprobe_buckets_sql('bucket', len(V.BUCKET_DIMS_8))})
               AS bucket
      FROM q
    ),
    c AS (SELECT vec_id, embedding,
                 {V.sign_bucket_sql('embedding', V.BUCKET_DIMS_8)} AS bucket
          FROM embeddings),
    scored AS (
      SELECT p.qid, c.vec_id,
             {V.cosine_sql('c.embedding', 'p.qvec')} AS score
      FROM c JOIN probes p USING (bucket)
    ),
    ranked AS (
      SELECT qid, vec_id, score,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC)
                  AS BIGINT) AS rnk
      FROM scored
    )
    SELECT qid, vec_id, score, rnk FROM ranked WHERE rnk <= {_ANN_K}
    """,
)
def n3_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (the real index shape): 8-bit sign buckets (256
    partitions — each probe scans ~N/256) + Hamming-1 probe fan-out on the
    query side. Far better recall than the single-bucket join (n2) at ~9/256
    of the brute-force cost (n1)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = S.ann_multiprobe(emb, q, k=_ANN_K)
    return out.select("qid", "vec_id", "score", F.col("rnk").cast("long").alias("rnk"))


_IVF_NLIST = 16
_CENT_CACHE: dict = {}  # (sf_dir, table mtime) -> nlist centroid list


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> list:
    """The nlist sampled centroids (k-means iteration 0), memoized per
    (sf_dir, embeddings-table mtime): repeat invocations over the same
    fixture (bench warm+time passes; n4 and d11 sharing one index) skip
    the collect job, while a REGENERATED fixture at the same path (same-
    process test reuse) invalidates naturally instead of silently
    assigning against stale centroids."""
    tbl = os.path.join(sf_dir, "embeddings.parquet")
    try:
        mtime = os.path.getmtime(tbl)
    except OSError:
        mtime = 0.0
    key = (sf_dir, mtime)
    if key not in _CENT_CACHE:
        emb = _t(spark, sf_dir, "embeddings")
        _CENT_CACHE[key] = [
            (r["vec_id"], list(r["embedding"]))
            for r in emb.filter(F.col("vec_id") < _IVF_NLIST)
            .select("vec_id", "embedding")
            .collect()
        ]
    return _CENT_CACHE[key]
_IVF_NPROBE = 2


@register(
    "n4_ann_ivf",
    f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                  WHERE vec_id < {_IVF_NLIST}),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {V.cosine_sql('e.embedding', 'c.cv')} DESC, c.cid ASC
               ) AS arn
        FROM embeddings e, cent c
      ) WHERE arn = 1
    ),
    q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
          WHERE vec_id < {_N_QUERIES}),
    probes AS (
      SELECT qid, qvec, cid FROM (
        SELECT q.qid, q.qvec, c.cid,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY {V.cosine_sql('q.qvec', 'c.cv')} DESC, c.cid ASC
               ) AS prn
        FROM q, cent c
      ) WHERE prn <= {_IVF_NPROBE}
    ),
    scored AS (
      SELECT p.qid, a.vec_id,
             {V.cosine_sql('a.embedding', 'p.qvec')} AS score
      FROM assign a JOIN probes p USING (cid)
    ),
    ranked AS (
      SELECT qid, vec_id, score,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC)
                  AS BIGINT) AS rnk
      FROM scored
    )
    SELECT qid, vec_id, score, rnk FROM ranked WHERE rnk <= {_ANN_K}
    """,
)
def n4_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN (the FAISS-style inverted-file shape): nlist sampled
    centroids (k-means iteration 0 — deterministic, so the DuckDB oracle can
    replay the exact same index), map-only nearest-centroid assignment over
    a literal centroid array (zero shuffle at assignment time), probe the
    query's nprobe nearest lists only. Complements n2/n3: data-adaptive
    partitions instead of fixed sign hyperplanes."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = _ivf_centroids(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = S.ann_ivf(emb, q, cent, k=_ANN_K, nprobe=_IVF_NPROBE)
    return out.select("qid", "vec_id", "score", F.col("rnk").cast("long").alias("rnk"))


@register(
    "d7_dedup_keeplist",
    f"""
    WITH RECURSIVE pairs AS (
      SELECT id_a, id_b FROM ({_JACCARD_PAIRS_SQL}) WHERE jaccard >= 0.2
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
    ),
    labels AS (
      SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
      FROM reach GROUP BY id
    )
    SELECT cluster_id, CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS cluster_size
    FROM labels GROUP BY cluster_id
    """,
)
def d7_dedup_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's final artifact: one KEEPER per near-dup cluster
    (smallest doc id) + cluster size — what a training-data pipeline actually
    joins against to drop duplicates."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.2)
    labels = D.connected_components(pairs, docs.select("doc_id"), id_col="doc_id")
    return labels.groupBy("cluster_id").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )


@register(
    "d11_semdedup",
    f"""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(embedding,
                            x -> CAST(x * CAST(0.5 AS FLOAT) AS FLOAT))
      FROM embeddings WHERE vec_id < 30
    ),
    cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
             WHERE vec_id < {_IVF_NLIST}),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT a.vec_id, a.embedding, c.cid,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {{cos_ac}} DESC, c.cid ASC
               ) AS arn
        FROM aug a, cent c
      ) WHERE arn = 1
    ),
    dropped AS (
      SELECT DISTINCT hi.vec_id
      FROM assign hi JOIN assign lo
        ON hi.cid = lo.cid AND lo.vec_id < hi.vec_id
      WHERE {{cos_hl}} >= 0.999
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
           (d.vec_id IS NULL) AS kept
    FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """.format(
        cos_ac=V.cosine_sql("a.embedding", "c.cv"),
        cos_hl=V.cosine_sql("hi.embedding", "lo.embedding"),
    ),
)
def d11_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup, Abbas et al. 2023): cluster embeddings by
    nearest centroid (the IVF assignment fold — map-only), then prune
    near-duplicates WITHIN clusters only, keeping the lowest id per
    epsilon-ball. The random fixture has no natural semantic dups, so 30
    scaled copies (cosine 1.0, scale-invariant → same cluster) are planted
    in-query, mirroring d5's pattern. Clustering bounds the quadratic term
    to per-cluster joins — the paper's trick for LAION-scale corpora."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = _ivf_centroids(spark, sf_dir)
    planted = emb.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(0.5).cast("float")).cast("float")
        ).alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(planted)
    out = S.semantic_dedup(aug, cent, eps=0.999)
    return out.select(
        "vec_id", F.col("cid").cast("long").alias("cid"), "kept"
    )


@register("v1_image_validation", None)  # binary pipeline — rows-only check
def v1_image_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 / north_rule per-row invariant as a driver-gate entry: decode the
    fetched payload and validate PSNR ≥ 40 dB + caption equality against the
    reference pixels (functions/images.validate_against_reference). Binary
    columns are not DuckDB-expressible, so this registers without an oracle
    (rows-only check); exact pixel math is pinned by tests/test_images.py.
    The corpus is the deterministic seeded fixture (no external data)."""
    from ghcrawler_spark import fixtures
    from ghcrawler_spark.functions.images import validate_against_reference

    fx = fixtures.generate(seed=7, n_hosts=3)
    corpus, _links, _seeds = fixtures.to_spark(spark, fx)
    fetched = corpus.select("image_id", "bytes", "fmt", "caption")
    ref = corpus.select(
        "image_id",
        F.col("ref_bytes").alias("bytes"),
        F.lit("png").alias("fmt"),
        "caption",
    )
    out = validate_against_reference(fetched, ref)
    return out.select(
        "image_id",
        "fmt",
        F.least(F.round("psnr_db", 2), F.lit(99.0)).alias("psnr_db"),
        "caption_ok",
        "valid",
    ).orderBy("image_id")


_PHASH_SQL = stable_long_hash_sql("doc_id")


@register(
    "v2_phash_neardup",
    f"""
    WITH base AS (
      SELECT doc_id AS id, {_PHASH_SQL} AS phash FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             xor({_PHASH_SQL},
                 (CAST(1 AS BIGINT) << CAST(doc_id % 60 AS INT))
                 | (CAST(1 AS BIGINT) << CAST((doc_id * 17 + 3) % 60 AS INT)))
      FROM documents WHERE doc_id < 50
    ),
    bands AS (
      SELECT id, phash, b.band AS band,
             (phash >> CAST(b.band * 10 AS INT)) & 1023 AS slice
      FROM base, unnest(generate_series(0, 5)) AS b(band)
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.slice = b.slice AND a.id < b.id
    )
    SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 5
    """,
)
def v2_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image pHash near-dup (the BASELINE input_hint's phash:int64 column):
    banded-pigeonhole Hamming pairs, dedup.phash_neardup. The testdata has
    no image table, so the phash column is synthesized deterministically
    from doc_id (md5-derived 60-bit value) with a ≤2-bit perturbed twin for
    the first 50 docs — the operator itself is the one a real corpus's
    phash column feeds (v1/fixtures compute real phashes via
    functions/images.phash64; pinned by tests/test_dedup.py)."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        F.col("doc_id").alias("id"),
        stable_long_hash(F.col("doc_id")).alias("phash"),
    )
    mask = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 60 AS INT)) | "
        "shiftleft(CAST(1 AS BIGINT), CAST((doc_id * 17 + 3) % 60 AS INT))"
    )
    flipped = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("id"),
        stable_long_hash(F.col("doc_id")).bitwiseXOR(mask).alias("phash"),
    )
    return D.phash_neardup(base.unionByName(flipped)).orderBy("id_a", "id_b")


# same CASE text is valid Spark SQL and DuckDB SQL — one source of truth
_V3_FMT_SQL = (
    "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' "
    "WHEN 2 THEN 'gif' ELSE 'bmp' END"
)


@register(
    "v3_image_quality_gate",
    f"""
    WITH meta AS (
      SELECT doc_id AS image_id,
             CAST(64 + (doc_id * 53) % 4000 AS INT) AS w,
             CAST(64 + (doc_id * 97) % 4000 AS INT) AS h,
             {_V3_FMT_SQL} AS fmt,
             text AS caption
      FROM documents
    ),
    g AS (
      SELECT image_id, w, h, fmt,
             CAST({T.token_count_ws_sql('caption')} AS BIGINT)
               AS caption_tokens,
             (w >= 200 AND h >= 200) AS res_ok,
             (greatest(w, h) <= 3 * least(w, h)) AS aspect_ok,
             (fmt IN ('png', 'jpeg')) AS fmt_ok,
             ({T.token_count_ws_sql('caption')} >= 5
              AND length(caption) BETWEEN 20 AND 2048) AS caption_gate_ok
      FROM meta
    )
    SELECT image_id, w, h, fmt, caption_tokens,
           res_ok, aspect_ok, fmt_ok, caption_gate_ok,
           (res_ok AND aspect_ok AND fmt_ok AND caption_gate_ok) AS kept
    FROM g
    """,
)
def v3_image_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION/DataComp-style image curation gates (the metadata-only first
    cut of an image-corpus pipeline): resolution floor, aspect-ratio band,
    format allow-list, caption token/length window — over the input_hint
    image-table shape (w, h, fmt, caption). The testdata has no image table,
    so (w, h, fmt) are synthesized deterministically from doc_id (the
    v2/m1 pattern) while the caption is the real documents.text column;
    functions/images.curation_gates is the operator a real corpus's
    metadata columns feed. Map-only by construction — at 100 TB this gate
    discards most rows before any pixel decode job runs (plan pinned by
    tools/audit_plans.py)."""
    from ghcrawler_spark.functions import images as I

    docs = _t(spark, sf_dir, "documents")
    meta = docs.select(
        F.col("doc_id").alias("image_id"),
        (F.lit(64) + (F.col("doc_id") * 53) % 4000).cast("int").alias("w"),
        (F.lit(64) + (F.col("doc_id") * 97) % 4000).cast("int").alias("h"),
        F.expr(_V3_FMT_SQL).alias("fmt"),
        F.col("text").alias("caption"),
    )
    gates = I.curation_gates(
        F.col("w"), F.col("h"), F.col("fmt"), F.col("caption")
    )
    return meta.select(
        "image_id", "w", "h", "fmt",
        *[expr.alias(name) for name, expr in gates.items()],
    )


@register(
    "m1_audio_features",
    """
    WITH p AS (
      SELECT doc_id,
             8000 * (1 + doc_id % 3) AS sample_rate,
             2 + doc_id % 29 AS hp,
             256 + (doc_id * 37) % 1024 AS n_samples,
             1000 + (doc_id * 131) % 20000 AS amp
      FROM documents
    )
    SELECT doc_id, sample_rate, n_samples,
           (n_samples * 1000) // sample_rate AS duration_ms,
           amp AS peak,
           ROUND(CAST(amp AS DOUBLE), 4) AS rms,
           (n_samples - 1) // hp AS zero_crossings
    FROM p ORDER BY doc_id
    """,
)
def m1_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio lane: synthesize a deterministic PCM16 square wave
    per document, serialize it as a REAL RIFF/WAV file, then decode the
    bytes back (the decoder sees only the blob) and extract features
    (duration, peak, RMS, zero crossings) in one Arrow-batched pass. The
    oracle recomputes every feature analytically from the seed formulas, so
    the hash match proves the binary encode→decode round-trip is exact —
    stronger than the rows-only check binary pipelines usually get.
    Reference analog: opaque fetched payloads + typed metadata derived at
    process time (lib/crawler.js _processDocument)."""
    from ghcrawler_spark.functions import media as M

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (8000 * (1 + F.col("doc_id") % 3)).cast("long").alias("rate"),
        (2 + F.col("doc_id") % 29).cast("long").alias("hp"),
        (256 + (F.col("doc_id") * 37) % 1024).cast("long").alias("n"),
        (1000 + (F.col("doc_id") * 131) % 20000).cast("long").alias("amp"),
    )
    wav = params.select(
        "doc_id",
        M.synth_wav_udf(
            F.col("doc_id"), F.col("rate"), F.col("hp"), F.col("n"), F.col("amp")
        ).alias("bytes"),
    )
    return M.audio_features(wav, "bytes").select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "duration_ms",
        "peak",
        "rms",
        "zero_crossings",
    ).orderBy("doc_id")


@register(
    "m2_video_frame_sample",
    """
    WITH p AS (
      SELECT doc_id,
             16 + 8 * (doc_id % 4) AS width,
             16 + 8 * (doc_id % 3) AS height,
             6 + doc_id % 20 AS n_frames,
             (doc_id * 31) % 256 AS y0,
             1 + doc_id % 97 AS stp
      FROM documents WHERE doc_id < 120
    )
    SELECT doc_id, f.frame_idx,
           CAST(width AS INT) AS width, CAST(height AS INT) AS height,
           n_frames,
           ROUND(CAST((y0 + f.frame_idx * stp) % 256 AS DOUBLE), 4) AS mean_luma
    FROM p, unnest(generate_series(0, n_frames - 1, 3)) AS f(frame_idx)
    ORDER BY doc_id, frame_idx
    """,
)
def m2_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal video lane: constant-luma frames packed into a REAL
    YUV4MPEG2 stream (C420jpeg chroma planes included), then frame-sampled
    every 3rd frame via a mapInPandas fan-out — the training-pipeline shape
    for video (decode → sample frames → per-frame features), with pixel
    data never leaving the task. The oracle replays the frame schedule with
    generate_series and the luma formula; hash parity proves the Y4M
    parse (header fields, plane offsets, frame boundaries) is exact."""
    from ghcrawler_spark.functions import media as M

    # raw read, no scan normalization: this lane is FIXED at 120 docs by
    # spec at every sf, so spreading the scan over the cluster just buys
    # two extra exchanges and per-task Python round-trips (measured +1.5s
    # at sf0.1); the 120-row synth+decode runs fine on the scan's own
    # partitioning
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    params = docs.select(
        "doc_id",
        (16 + 8 * (F.col("doc_id") % 4)).cast("long").alias("w"),
        (16 + 8 * (F.col("doc_id") % 3)).cast("long").alias("h"),
        (6 + F.col("doc_id") % 20).cast("long").alias("nf"),
        ((F.col("doc_id") * 31) % 256).cast("long").alias("y0"),
        (1 + F.col("doc_id") % 97).cast("long").alias("stp"),
    )
    vid = params.select(
        "doc_id",
        M.synth_y4m_udf(
            F.col("doc_id"), F.col("w"), F.col("h"),
            F.col("nf"), F.col("y0"), F.col("stp"),
        ).alias("bytes"),
    )
    return M.video_frame_sample(vid, "doc_id", "bytes", every=3).orderBy(
        "doc_id", "frame_idx"
    )


@register(
    "t3_quality_filter",
    f"""
    WITH scored AS (
      SELECT doc_id,
             {T.predicted_lang_sql('text')} AS pred_lang,
             {T.quality_score_sql('text')} AS quality,
             CAST({T.token_count_ws_sql('text')} AS BIGINT) AS tok_ws
      FROM documents
    )
    SELECT doc_id, pred_lang, quality, tok_ws FROM scored
    WHERE quality >= 0.3 AND tok_ws BETWEEN 5 AND 1000
    """,
)
def t3_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-filtering keep-list a training pipeline applies after
    scoring: language + quality + length gates over the scored documents
    (composition of the t1 signals into the actual filter)."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        T.predicted_lang("text").alias("pred_lang"),
        T.quality_score("text").alias("quality"),
        T.token_count_ws("text").cast("long").alias("tok_ws"),
    )
    return scored.filter(
        (F.col("quality") >= 0.3) & F.col("tok_ws").between(5, 1000)
    )



# ---------------------------------------------------------------------------
# F12 — policy-spec string resolution (traversalPolicy.js:90-148)
# ---------------------------------------------------------------------------

_SPEC_EXPR_SQL = """
  (CASE (doc_id % 6) WHEN 0 THEN 'default' WHEN 1 THEN 'reprocess'
        WHEN 2 THEN 'always' WHEN 3 THEN 'reload' WHEN 4 THEN 'nonsense'
        ELSE 'reprocessAndUpdate' END)
  || (CASE (doc_id % 4) WHEN 0 THEN '' WHEN 1 THEN ':crawl'
        WHEN 2 THEN ':relationOnly/crawl@/teams' ELSE ':initialize/repo@' END)
"""

_POLICY_PAIR_CASES_SQL = " ".join(
    f"WHEN '{n}' THEN '{fe}|{fr}'" for n, (fe, fr) in P.POLICY_NAMES.items()
)

@register(
    "f12_policy_resolve",
    f"""
    WITH specs AS (SELECT doc_id, {_SPEC_EXPR_SQL} AS spec FROM documents),
    s1 AS (
      SELECT doc_id, spec,
        CASE WHEN instr(spec, ':') > 0
             THEN substr(spec, 1, instr(spec, ':') - 1) ELSE spec END AS n0,
        CASE WHEN instr(spec, ':') > 0
             THEN substr(spec, instr(spec, ':') + 1) ELSE '' END AS rest
      FROM specs),
    s2 AS (
      SELECT *,
        CASE WHEN instr(rest, '@') > 0
             THEN substr(rest, 1, instr(rest, '@') - 1) ELSE rest END AS mspec,
        CASE WHEN instr(rest, '@') > 0
             THEN substr(rest, instr(rest, '@') + 1) ELSE '/' END AS p0
      FROM s1),
    s3 AS (
      SELECT *,
        CASE WHEN instr(mspec, '/') > 0
             THEN substr(mspec, 1, instr(mspec, '/') - 1) ELSE 'default' END
          AS sc0,
        CASE WHEN instr(mspec, '/') > 0
             THEN substr(mspec, instr(mspec, '/') + 1) ELSE mspec END AS m0
      FROM s2),
    s4 AS (
      SELECT doc_id, spec,
        CASE (CASE WHEN n0 = '' THEN 'default' ELSE n0 END)
          {_POLICY_PAIR_CASES_SQL}
          ELSE '{P.DEFAULT_POLICY_PAIR[0]}|{P.DEFAULT_POLICY_PAIR[1]}' END
          AS pair,
        CASE WHEN sc0 = '' THEN 'default' ELSE sc0 END AS scenario,
        CASE WHEN m0 = '' THEN 'default' ELSE m0 END AS map_name,
        CASE WHEN p0 = '' THEN '/' ELSE p0 END AS path
      FROM s3)
    SELECT doc_id, spec,
           split_part(pair, '|', 1) AS fetch,
           split_part(pair, '|', 2) AS freshness,
           scenario, map_name, path
    FROM s4
    """,
)
def f12_policy_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-spec resolution table (traversalPolicy.js:90-148): a
    deterministic sample of the full spec grammar
    "<policyName>[:<[scenario/]mapName[@path]>]" resolved row-level by the
    pure-Column twin the engine seeds with (plans/policy.resolve_policy_cols)
    — named policy → (fetch, freshness), scenario cut, map path. The DuckDB
    oracle re-implements the grammar in SQL; tests additionally pin the
    Column twin == PolicySpec.parse."""
    docs = _t(spark, sf_dir, "documents")
    name = (
        F.when(F.pmod("doc_id", F.lit(6)) == 0, "default")
        .when(F.pmod("doc_id", F.lit(6)) == 1, "reprocess")
        .when(F.pmod("doc_id", F.lit(6)) == 2, "always")
        .when(F.pmod("doc_id", F.lit(6)) == 3, "reload")
        .when(F.pmod("doc_id", F.lit(6)) == 4, "nonsense")
        .otherwise("reprocessAndUpdate")
    )
    suffix = (
        F.when(F.pmod("doc_id", F.lit(4)) == 0, "")
        .when(F.pmod("doc_id", F.lit(4)) == 1, ":crawl")
        .when(F.pmod("doc_id", F.lit(4)) == 2, ":relationOnly/crawl@/teams")
        .otherwise(":initialize/repo@")
    )
    specs = docs.select(
        "doc_id", F.concat(name, suffix).alias("spec")
    )
    r = P.resolve_policy_cols(F.col("spec"))
    return specs.select(
        "doc_id",
        "spec",
        r["fetch"].alias("fetch"),
        r["freshness"].alias("freshness"),
        r["scenario"].alias("scenario"),
        r["map_name"].alias("map_name"),
        r["path"].alias("path"),
    )



# ---------------------------------------------------------------------------
# F7 — event timeline visibility (githubProcessor.js:460-478)
# ---------------------------------------------------------------------------

# the graft's visibility table over the synthetic event types — same SHAPE
# as the reference's: one blanket-invisible type ('error' ~ status/label),
# action-restricted types ('view'/'click' ~ issues/pull_request), the rest
# always visible
F7_VISIBILITY = {"view": ["opened", "closed"], "click": ["opened"], "error": []}

@register(
    "f7_event_visibility",
    """
    WITH ev AS (
      SELECT event_id, event_type,
             CASE (event_id % 3) WHEN 0 THEN 'opened' WHEN 1 THEN 'closed'
                  ELSE 'deleted' END AS action
      FROM events)
    SELECT event_id, event_type, action
    FROM ev
    WHERE CASE event_type
            WHEN 'view' THEN action IN ('opened', 'closed')
            WHEN 'click' THEN action IN ('opened')
            WHEN 'error' THEN FALSE
            ELSE TRUE END
    """,
)
def f7_event_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — the dedicated event-visibility predicate
    (githubProcessor.js:460-478 _isEventVisibleInTimeline), run by the SAME
    Column the engine's ingest gate uses (plans/policy.event_visible_col):
    deterministic (type, action) pairs over the events table, keep only
    timeline-visible rows."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(F.pmod("event_id", F.lit(3)) == 0, "opened")
        .when(F.pmod("event_id", F.lit(3)) == 1, "closed")
        .otherwise("deleted")
        .alias("action"),
    )
    return ev.filter(
        P.event_visible_col(F.col("event_type"), F.col("action"), F7_VISIBILITY)
    )


# ---------------------------------------------------------------------------
# F11 — typed links on stored docs (lib/request.js:119-140)
# ---------------------------------------------------------------------------

_F11_GUID_SQL = stable_long_hash_sql("urn || '|annotations'")

@register(
    "f11_links_by_type",
    f"""
    WITH d AS (
      SELECT doc_id,
             'urn:src:' || source || ':doc:' || CAST(doc_id AS VARCHAR) AS urn,
             'urn:src:' || source AS parent_urn
      FROM documents)
    SELECT doc_id, 'self' AS link_name, urn AS href, 'resource' AS link_type
    FROM d
    UNION ALL
    SELECT doc_id, 'siblings', parent_urn || ':docs', 'collection' FROM d
    UNION ALL
    SELECT doc_id, 'annotations',
           urn || ':annotations:pages:' || CAST({_F11_GUID_SQL} AS VARCHAR),
           'relation'
    FROM d
    UNION ALL
    SELECT doc_id, 'variants', urn || ':variants', 'collection' FROM d
    """,
)
def f11_links_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — the stored doc's typed `_metadata.links` envelope
    (lib/request.js:119-140: resource/collection/relation hrefs; relation
    pages branded with a deterministic state guid,
    githubProcessor.js:1005-1020), built by the SAME Column the engine
    persists docs with (plans/policy.doc_links_col) and exploded to one row
    per link for the oracle."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.concat(
            F.lit("urn:src:"), F.col("source"), F.lit(":doc:"),
            F.col("doc_id").cast("string"),
        ).alias("urn"),
        F.concat(F.lit("urn:src:"), F.col("source")).alias("parent_urn"),
    )
    maps = {
        "default": {
            "doc": {
                "annotations": ("page", "relation"),
                "variants": ("image", "collection"),
            }
        }
    }
    links = P.doc_links_col(
        F.col("urn"), F.col("parent_urn"), F.lit("doc"), F.lit("default"), maps
    )
    return (
        base.select("doc_id", F.explode(links).alias("l"))
        .select(
            "doc_id",
            F.col("l.name").alias("link_name"),
            F.col("l.href").alias("href"),
            F.col("l.type").alias("link_type"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-curation lane (round 4): the scrub/filter/mix operators a training-
# data pipeline runs AFTER dedup — PII redaction, Gopher repetition gates,
# chunk-level exact substring dedup (Lee et al. 2022 style), benchmark
# decontamination, and deterministic stratified source mixing. Every one is
# a pure-Column / banded plan that survives 100 TB (no all-pairs, no
# unbounded shuffle; t4/t5/t6 are map-only).
# ---------------------------------------------------------------------------

_TOKS_SQL = T.tokens_sql("text")

# Deterministic PII augmentation: the synthetic corpus is PII-free, so both
# engines inject the same synthetic identifiers before scrubbing — the
# detector/redactor parity is what's under test.
_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from "
    "10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 200 AS "
    "VARCHAR) || ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@register(
    "t4_pii_scrub",
    f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS atext FROM documents)
    SELECT doc_id,
           {T.pii_count_sql('atext', T.PII_PATTERNS[0][1])} AS n_email,
           {T.pii_count_sql('atext', T.PII_PATTERNS[1][1])} AS n_ip,
           {T.pii_count_sql('atext', T.PII_PATTERNS[2][1])} AS n_phone,
           CAST(length({T.pii_scrub_sql('atext')}) AS BIGINT) AS scrub_len,
           {stable_long_hash_sql(T.pii_scrub_sql('atext'))} AS scrub_fp
    FROM aug
    """,
)
def t4_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the corpus: count emails / IPv4s /
    phone-style numbers and fingerprint the redacted text. Pure regex
    Columns (whole-stage codegen, shuffle-free) — the hash parity with
    DuckDB's RE2 engine pins that the patterns mean the same thing in both
    regex dialects, which is the risky part of any PII pass."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."), (F.col("doc_id") % 200).cast("string"),
            F.lit(" tel 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("atext"),
    )
    scrubbed = T.pii_scrub("atext")
    return aug.select(
        "doc_id",
        T.pii_count("atext", T.PII_PATTERNS[0][1]).alias("n_email"),
        T.pii_count("atext", T.PII_PATTERNS[1][1]).alias("n_ip"),
        T.pii_count("atext", T.PII_PATTERNS[2][1]).alias("n_phone"),
        F.length(scrubbed).cast("long").alias("scrub_len"),
        stable_long_hash(scrubbed).alias("scrub_fp"),
    )


# Gopher-style repetition gates (Rae et al. 2021 §A1.1 heuristics, count-based
# variant): most-frequent-token ratio and duplicate/top 2-gram fractions.
_GOPHER_TOP_TOK = 0.10
_GOPHER_DUP2 = 0.05


@register(
    "t5_gopher_repetition",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    g AS (SELECT doc_id, t,
          list_transform({T.shingles_from_tokens_sql('t', 2)},
                         s -> {stable_long_hash_sql('s')}) AS g2
          FROM toks),
    m AS (
      SELECT doc_id,
        round({T.max_multiplicity_sql('t')} / CAST(len(t) AS DOUBLE), 6)
          AS top_tok_ratio,
        CASE WHEN len(g2) = 0 THEN 0.0
             ELSE round(1.0 - len(list_distinct(g2)) / CAST(len(g2) AS DOUBLE), 6)
        END AS dup_2gram_frac,
        CASE WHEN len(g2) = 0 THEN 0.0
             ELSE round({T.max_multiplicity_sql('g2')} / CAST(len(g2) AS DOUBLE), 6)
        END AS top_2gram_frac
      FROM g)
    SELECT doc_id, top_tok_ratio, dup_2gram_frac, top_2gram_frac,
           (top_tok_ratio <= {_GOPHER_TOP_TOK} AND dup_2gram_frac <= {_GOPHER_DUP2})
             AS keep
    FROM m
    """,
)
def t5_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters: per-document mode-token ratio plus
    duplicate- and top-2-gram fractions, thresholded into a keep flag.
    Map-only: every metric is a higher-order-function fold over arrays that
    are HOISTED into their own projections (the non-CSE trap — inlining the
    token array would re-tokenize per shingle position)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.tokens("text").alias("t"))
    # 2-grams are hashed to 60-bit int64s BEFORE the multiplicity folds:
    # the O(d·u) mode count then compares longs instead of ~12-char strings
    # (measured 1.7x on the whole query; the oracle hashes identically, so
    # the counts agree exactly — collisions at d<100, 60 bits are ~1e-15).
    g = toks.select(
        "doc_id",
        "t",
        F.transform(
            T.shingles_from_tokens(F.col("t"), 2),
            lambda s: stable_long_hash(s),
        ).alias("g2"),
    )
    # the mode counts run over PRE-SORTED projected arrays so the run-length
    # fold replaces the O(d·u) distinct×filter nest (same integers; ~6x of
    # this query's wall before)
    g = g.select(
        "doc_id",
        "t",
        "g2",
        F.array_sort("t").alias("_ts"),
        F.array_sort("g2").alias("_gs"),
    )
    n2 = F.size("g2")
    m = g.select(
        "doc_id",
        F.round(
            T.max_multiplicity_sorted(F.col("_ts")) / F.size("t").cast("double"), 6
        ).alias("top_tok_ratio"),
        F.when(n2 == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(1.0) - F.size(F.array_distinct("g2")) / n2.cast("double"), 6
            )
        )
        .alias("dup_2gram_frac"),
        F.when(n2 == 0, F.lit(0.0))
        .otherwise(
            F.round(T.max_multiplicity_sorted(F.col("_gs")) / n2.cast("double"), 6)
        )
        .alias("top_2gram_frac"),
    )
    return m.withColumn(
        "keep",
        (F.col("top_tok_ratio") <= _GOPHER_TOP_TOK)
        & (F.col("dup_2gram_frac") <= _GOPHER_DUP2),
    )


_CHUNK_TOKENS = 10


@register(
    "d8_chunk_dedup",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    ch AS (
      SELECT doc_id,
        CASE WHEN len(t) >= {_CHUNK_TOKENS}
          THEN list_transform(
                 generate_series(1, len(t) - {_CHUNK_TOKENS - 1}, {_CHUNK_TOKENS}),
                 i -> {stable_long_hash_sql(
                     f"array_to_string(list_slice(t, i, i + {_CHUNK_TOKENS - 1}), ' ')")})
          ELSE [{stable_long_hash_sql("array_to_string(t, ' ')")}] END AS chunks
      FROM toks),
    ex AS (SELECT doc_id, unnest(chunks) AS ch_hash FROM ch),
    cnt AS (SELECT ch_hash, count(DISTINCT doc_id) AS nd FROM ex GROUP BY ch_hash),
    per_doc AS (
      SELECT e.doc_id,
             count(*) AS n_chunks,
             count(*) FILTER (c.nd > 1) AS n_shared
      FROM ex e JOIN cnt c ON e.ch_hash = c.ch_hash
      GROUP BY e.doc_id)
    SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(n_shared AS BIGINT) AS n_shared,
           round(n_shared / CAST(n_chunks AS DOUBLE), 6) AS shared_frac
    FROM per_doc
    """,
)
def d8_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup at chunk granularity (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): 10-token
    stride windows hashed to fixed-width int64s, counted across documents,
    folded back to a per-document shared-chunk fraction. The only shuffled
    payload is (doc_id, chunk_hash) — 16 bytes/row regardless of document
    size, so the plan survives arbitrarily wide documents at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.tokens("text").alias("t"))
    n = F.size("t")
    windowed = F.transform(
        F.sequence(F.lit(1), n - (_CHUNK_TOKENS - 1), F.lit(_CHUNK_TOKENS)),
        lambda i: stable_long_hash(
            F.concat_ws(" ", F.slice(F.col("t"), i, _CHUNK_TOKENS))
        ),
    )
    whole = F.array(stable_long_hash(F.concat_ws(" ", F.col("t"))))
    ex = toks.select(
        "doc_id",
        F.explode(
            F.when(n >= _CHUNK_TOKENS, windowed).otherwise(whole)
        ).alias("ch_hash"),
    )
    cnt = ex.groupBy("ch_hash").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    return (
        ex.join(cnt, "ch_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count_if(F.col("nd") > 1).alias("n_shared"),
        )
        .select(
            "doc_id",
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared") / F.col("n_chunks").cast("double"), 6
            ).alias("shared_frac"),
        )
    )


# Benchmark decontamination: k=4 shingles (real pipelines use 8-13; the
# synthetic docs are 10-99 tokens of a small vocabulary, so k=4 keeps the
# overlap statistics meaningful at test scale — the plan is k-agnostic).
_DECON_K = 4
_DECON_BENCH_MOD = 50


@register(
    "d9_decontaminate",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents
                  WHERE len({_TOKS_SQL}) >= {_DECON_K}),
    sh AS (SELECT doc_id,
             list_transform(generate_series(1, len(t) - {_DECON_K - 1}),
               i -> {stable_long_hash_sql(
                   f"array_to_string(list_slice(t, i, i + {_DECON_K - 1}), ' ')")})
               AS s
           FROM toks),
    bench AS (SELECT DISTINCT unnest(s) AS g FROM sh
              WHERE doc_id % {_DECON_BENCH_MOD} = 0),
    cand AS (SELECT doc_id, unnest(s) AS g FROM sh
             WHERE doc_id % {_DECON_BENCH_MOD} <> 0)
    SELECT c.doc_id, CAST(count(DISTINCT c.g) AS BIGINT) AS n_hits
    FROM cand c JOIN bench b ON c.g = b.g
    GROUP BY c.doc_id
    """,
)
def d9_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: documents sharing any k-token shingle with
    the (small) benchmark set, with the distinct-overlap count. The
    benchmark shingle set is broadcast — the corpus side never shuffles its
    text, only the (doc_id, shingle_hash) rows that actually hit, so at
    100 TB the exchanged volume is proportional to contamination, not
    corpus size."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.tokens("text").alias("t")).filter(
        F.size("t") >= _DECON_K
    )
    # The shingle-hash transform is exploded INLINE (not projected to a
    # named array column first): explode over a plain column reference
    # trips InferFiltersFromGenerate, whose inferred size()>0/isnotnull
    # filters get pushed below the projection with the WHOLE md5 transform
    # re-inlined into an interpreted Filter — measured 8x on this query.
    # The rule skips non-attribute generator inputs, so inline is safe.
    sh_expr = F.transform(
        F.sequence(F.lit(1), F.size("t") - (_DECON_K - 1)),
        lambda i: stable_long_hash(
            F.concat_ws(" ", F.slice(F.col("t"), i, _DECON_K))
        ),
    )
    bench = (
        toks.filter(F.col("doc_id") % _DECON_BENCH_MOD == 0)
        .select(F.explode(sh_expr).alias("g"))
        .distinct()
    )
    cand = toks.filter(F.col("doc_id") % _DECON_BENCH_MOD != 0).select(
        "doc_id", F.explode(sh_expr).alias("g")
    )
    return (
        cand.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").cast("long").alias("n_hits"))
    )


# Incremental-ingest dedup: delta batch = doc_id % 10 == 9, corpus = rest.
_INCR_DELTA_MOD = 10
_INCR_DELTA_REM = 9


@register(
    "d10_incremental_dedup",
    f"""
    WITH sigs AS ({_minhash_sql()}),
    banded AS ({_minhash_bands_sql()}),
    cand AS (
      SELECT DISTINCT n.doc AS new_id, b.doc AS dup_of
      FROM banded b JOIN banded n
        ON b.band = n.band AND b.bkey = n.bkey
      WHERE n.doc % {_INCR_DELTA_MOD} = {_INCR_DELTA_REM}
        AND b.doc % {_INCR_DELTA_MOD} <> {_INCR_DELTA_REM}
    ),
    exact AS ({_HASHED_JACCARD_PAIRS_SQL}),
    verified AS (
      SELECT c.new_id, c.dup_of, e.jaccard
      FROM cand c JOIN exact e
        ON e.id_a = least(c.new_id, c.dup_of)
       AND e.id_b = greatest(c.new_id, c.dup_of)
      WHERE e.jaccard >= 0.5
    ),
    ranked AS (
      SELECT new_id, dup_of, jaccard,
             row_number() OVER (PARTITION BY new_id
                                ORDER BY jaccard DESC, dup_of ASC) AS rn
      FROM verified)
    SELECT new_id, dup_of, jaccard FROM ranked WHERE rn = 1
    """,
)
def d10_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup (the daily-batch shape): the documents with
    doc_id % 10 == 9 arrive as a new batch and are checked against the rest
    of the corpus via MinHash-LSH band collision + exact-Jaccard verify,
    reporting each new doc's best existing duplicate. The corpus side never
    exchanges (delta bands broadcast into the base band stream); in
    production the base band table is the persisted index, so the per-batch
    cost is O(batch + collisions), not O(corpus)."""
    docs = _t(spark, sf_dir, "documents")
    delta = docs.filter(F.col("doc_id") % _INCR_DELTA_MOD == _INCR_DELTA_REM)
    base = docs.filter(F.col("doc_id") % _INCR_DELTA_MOD != _INCR_DELTA_REM)
    return D.minhash_lsh_incremental(
        base, delta, "doc_id", "text", k=3, threshold=0.5
    )


_KNN_K = 5


@register(
    "n5_knn_join",
    f"""
    WITH c AS (SELECT vec_id, embedding,
                      {V.sign_bucket_sql('embedding')} AS bucket
               FROM embeddings),
    scored AS (
      SELECT a.vec_id AS qid, b.vec_id AS vec_id,
             {V.cosine_sql('a.embedding', 'b.embedding')} AS score
      FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT qid, vec_id, score,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY score DESC, vec_id ASC)
                  AS BIGINT) AS rnk
      FROM scored)
    SELECT qid, vec_id, score, rnk FROM ranked WHERE rnk <= {_KNN_K}
    """,
)
def n5_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-vs-corpus k-NN join (similar-document mining / hard-negative
    sampling): every vector's top-5 neighbors within its sign bucket. The
    bucket predicate blocks the quadratic self-join into per-bucket joins;
    ranking windows partition per query vector — no global sort."""
    emb = _t(spark, sf_dir, "embeddings")
    out = S.knn_join(emb, k=_KNN_K)
    return out.select(
        "qid", "vec_id", "score", F.col("rnk").cast("long").alias("rnk")
    )


@register(
    "t6_domain_mix",
    f"""
    WITH rated AS (
      SELECT doc_id, source,
             2500 * (1 + TRY_CAST(substr(source, 4) AS BIGINT) % 4) AS keep_bp,
             {stable_long_hash_sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 10000
               AS bucket
      FROM documents)
    SELECT doc_id, source, CAST(keep_bp AS BIGINT) AS keep_bp,
           CAST(bucket AS BIGINT) AS bucket,
           round(10000.0 / keep_bp, 6) AS mix_weight
    FROM rated WHERE bucket < keep_bp
    """,
)
def t6_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified source mixing (the data-mixing step of a
    training pipeline): per-source keep rates applied via a stable hash
    bucket, with the inverse-propensity mix weight for unbiased reweighting.
    Map-only and shuffle-free — repeatable across runs and engines, unlike
    ``df.sample`` whose output depends on partitioning."""
    docs = _t(spark, sf_dir, "documents")
    rated = docs.select(
        "doc_id",
        "source",
        # substring(4) to end-of-string + try_cast: the exact twin of the
        # oracle's substr(source, 4) / TRY_CAST — null on garbage in BOTH
        # engines (a plain cast raises CAST_INVALID_INPUT under PySpark
        # 4.x ANSI where the oracle would drop the row; ADVICE r5)
        (2500 * (1 + F.expr("substring(source, 4)").try_cast("long") % 4))
        .cast("long")
        .alias("keep_bp"),
        (
            stable_long_hash(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
            % 10000
        ).alias("bucket"),
    )
    return rated.filter(F.col("bucket") < F.col("keep_bp")).select(
        "doc_id",
        "source",
        "keep_bp",
        F.col("bucket").cast("long").alias("bucket"),
        F.round(F.lit(10000.0) / F.col("keep_bp"), 6).alias("mix_weight"),
    )


# ---------------------------------------------------------------------------
# G1 — link-graph crawl prioritization (integer fixed-point PageRank).
# The dynamic form of the reference's static tier weights
# (lib/queueSet.js:46-65): rank hosts by the discovered link graph, then
# feed rank_micro into frontier priority. Integer micro-unit arithmetic
# makes the recurrence bit-exact across engines (and across crawl resumes).
# ---------------------------------------------------------------------------

_PR_ITERS = 3
_PR_DAMP = 85
_PR_SCALE = 10**12
_PR_HOSTS = 40


def _pagerank_sql(
    n_iter: int = _PR_ITERS, d: int = _PR_DAMP, scale: int = _PR_SCALE
) -> str:
    """DuckDB twin of ``graph.pagerank_fixed_point``: the iterations are
    unrolled as CTEs (it1..itN), each one join+aggregate exactly mirroring
    the Spark recurrence — all-integer, so partial-sum order cannot
    diverge."""
    edge_hash = stable_long_hash_sql("'edge:' || CAST(event_id AS VARCHAR)")
    its = []
    for k in range(1, n_iter + 1):
        prev = f"it{k - 1}"
        its.append(
            f"""
    it{k} AS (
      SELECT nodes.node,
             CAST((({100 - d}) * (({scale} // c.n) * c.n)) // (100 * c.n)
               + (SELECT CAST(coalesce(sum((p.rank * {d}) // 100), 0) AS BIGINT)
                    FROM {prev} p LEFT JOIN outdeg o ON p.node = o.node
                   WHERE o.outdeg IS NULL) // c.n
               + coalesce(infl.inflow, 0) AS BIGINT) AS rank
      FROM nodes CROSS JOIN c
      LEFT JOIN (SELECT e.dst AS node,
                        CAST(sum((p.rank * {d}) // (100 * o.outdeg)) AS BIGINT)
                          AS inflow
                   FROM edges e
                   JOIN {prev} p ON e.src = p.node
                   JOIN outdeg o ON e.src = o.node
                  GROUP BY e.dst) infl ON nodes.node = infl.node)"""
        )
    return f"""
    WITH edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT 'h' || CAST(user_id % {_PR_HOSTS} AS VARCHAR) AS src,
               'h' || CAST({edge_hash} % {_PR_HOSTS} AS VARCHAR) AS dst
        FROM events)
      WHERE src <> dst),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    outdeg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
               FROM edges GROUP BY src),
    it0 AS (SELECT node, CAST({scale} // c.n AS BIGINT) AS rank
            FROM nodes CROSS JOIN c),{",".join(its)}
    SELECT node AS host, rank AS rank_micro FROM it{n_iter}
    """


@register("g1_host_rank", _pagerank_sql())
def g1_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph crawl priority: three fixed-point PageRank sweeps
    over the link graph the crawl has discovered (synthesized here as
    user→hash(event) host edges). Per iteration: one shuffle join on src +
    one groupBy(dst); node count and dangling mass ride 1-row broadcast
    frames — a single lazy plan, no driver collects, no global windows."""
    ev = _t(spark, sf_dir, "events")
    edges = (
        ev.select(
            F.concat(F.lit("h"), (F.col("user_id") % _PR_HOSTS).cast("string")).alias(
                "src"
            ),
            F.concat(
                F.lit("h"),
                (
                    stable_long_hash(
                        F.concat(F.lit("edge:"), F.col("event_id").cast("string"))
                    )
                    % _PR_HOSTS
                ).cast("string"),
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    out = G.pagerank_fixed_point(
        edges, n_iter=_PR_ITERS, damping_pct=_PR_DAMP, scale=_PR_SCALE
    )
    return out.select(F.col("node").alias("host"), "rank_micro")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
