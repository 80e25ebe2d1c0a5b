"""The crawl round engine — ghcrawler's processOne pipeline re-expressed as
one batch DataFrame job per round (SURVEY.md §3.4 lifecycle mapping).

Implements ROUND SPEC v1 (ghcrawler_spark/simulator.py module doc) — the
simulator is the oracle; tests pin engine order_log == simulator order_log
EXACTLY, at any parallelism (the spec has no order-dependence on partition
count: every window orders by a unique key).

Stage map (reference → here):
  queues.pop weighted rotation (queueSet.js:46-65)   → weighted_rotation_order
  token bench / rate limit (tokenFactory, limiters)  → host token-bucket join + host_topk
  tracker/etag dedup (redisRequestTracker, etag)     → Bloom probe + anti-join (filter_unseen)
  _fetch (githubFetcher.js:18-24)                    → corpus equi-join (+ decode/PSNR pandas UDF)
  _processDocument fan-out (githubProcessor:102-121) → links join + explode-equivalent + attenuate
  _completeRequest requeue/deadletter (crawler.js)   → attempt bump, tail re-enqueue, deadletter table
  ack-last durability (crawler.js:213-302)           → SnapshotStore atomic round commit

Scale design: frontier/seen/corpus/links never pass through the driver —
only per-round scalar counters (next_seq, row counts) are collected. All
joins are equi-joins on url/host; politeness + rotation windows partition by
host/tier. At 10^10 URLs the frontier table is partitioned by
(tier, pmod(url_hash, B)) and the seen anti-join is pre-filtered by the
sharded Bloom set so the exact join sees only probe-positives.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ghcrawler_spark.functions.images import psnr_vs_reference_udf
from ghcrawler_spark.functions.urls import extract_host
from ghcrawler_spark.hashing import stable_long_hash
from ghcrawler_spark.operators.frontier_ops import (
    WEIGHT_SCALE,
    host_topk,
    weighted_rotation_order_scalable,
)
from ghcrawler_spark.operators.seen import BloomShardSet, filter_unseen
from ghcrawler_spark.sources.snapshot import SnapshotStore

FRONTIER_SCHEMA = (
    "url string, type string, tier string, host string, enqueue_seq long, "
    "attempt int"
)
SEEN_SCHEMA = "url string, url_hash long"
ORDER_LOG_SCHEMA = (
    "seq long, round int, pop_seq long, url string, type string, tier string, "
    "host string, outcome string"
)
HOST_STATE_SCHEMA = "host string, level long"
DOCS_SCHEMA = "image_id string, url string, round int, psnr_db double, valid boolean"
DEADLETTER_SCHEMA = (
    "url string, type string, tier string, round int, attempt int, reason string"
)
EXCLUDED_SCHEMA = "url string, round int"
METRICS_SCHEMA = (
    "round int, selected long, children long, requeued long, deadlettered long, "
    "frontier_after long"
)
LINEAGE_SCHEMA = (
    "round int, tier string, host_bucket int, n_popped long, n_processed long, "
    "n_traversed long, n_requeued long, n_missing long"
)
LINEAGE_BUCKETS = 32


@dataclass
class CrawlConfig:
    tier_weights: dict = field(
        default_factory=lambda: {"immediate": 3, "soon": 2, "normal": 3, "later": 2}
    )
    bucket_capacity: int = 4
    bucket_fill: int = 2
    round_capacity: int = 16
    max_attempts: int = 5
    max_rounds: int = 200
    robots_deny: dict = field(default_factory=dict)  # host -> [path prefixes]
    # visitor map (lib/visitorMap.js analog): {parent_type: {edge: child_type}};
    # None = traverse every edge in the link table
    visitor_map: dict | None = None
    inject_failures: bool = True
    validate_images: bool = False  # decode+PSNR audit columns on docs
    use_bloom: bool = True
    bloom_shards: int = 16
    bloom_fpr: float = 0.01


def _path_col(url):
    p = F.regexp_extract(url, "://[^/]*(/.*)$", 1)
    return F.when(p == "", "/").otherwise(p)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        corpus: DataFrame,
        links: DataFrame,
        cfg: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.store = store
        self.cfg = cfg or CrawlConfig()
        self.corpus = corpus
        self.links = links
        deny_rows = [
            (h, p) for h, prefixes in self.cfg.robots_deny.items() for p in prefixes
        ]
        self.deny_df = spark.createDataFrame(
            deny_rows or [("_none_", "_never_")], "host string, prefix string"
        )

    # -- state helpers --------------------------------------------------------

    def _empty(self, schema: str) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def _robots_allowed(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Split rows into (allowed, denied) via broadcast semi/anti joins
        against the robots table — no shuffle of the candidate rows at all
        (the deny table is broadcast; per-host robots rules are small)."""
        with_path = df.withColumn("_path", _path_col(F.col("url")))
        deny = self.deny_df.select(
            F.col("host").alias("_d_host"), F.col("prefix").alias("_d_prefix")
        )
        cond = (F.col("host") == F.col("_d_host")) & F.col("_path").startswith(
            F.col("_d_prefix")
        )
        allowed = with_path.join(F.broadcast(deny), cond, "left_anti").drop("_path")
        denied = with_path.join(F.broadcast(deny), cond, "left_semi").drop("_path")
        return allowed, denied

    # -- bootstrap ------------------------------------------------------------

    def seed(self, seeds: DataFrame) -> None:
        """Round 0: robots-check the seed list, assign enqueue_seq, commit."""
        base = seeds.select(
            "url",
            "type",
            "tier",
            extract_host("url").alias("host"),
            F.lit(0).alias("attempt"),
        )
        allowed, denied = self._robots_allowed(base)
        w = Window.orderBy("url")
        frontier = allowed.withColumn(
            "enqueue_seq", F.row_number().over(w).cast("long")
        ).select("url", "type", "tier", "host", "enqueue_seq", F.col("attempt").cast("int"))
        n_seeded = frontier.count()
        # full-state tables: rewritten per round (deadletter is full-state —
        # it is small by nature and the requeue API rewrites it in place)
        self.store.write_tables(
            0,
            {
                "frontier": frontier,
                "host_state": self._empty(HOST_STATE_SCHEMA),
                "deadletter": self._empty(DEADLETTER_SCHEMA),
            },
        )
        # history tables: append-only deltas (Iceberg append-snapshot model)
        self.store.write_append(0, "seen", self._empty(SEEN_SCHEMA))
        self.store.write_append(0, "order_log", self._empty(ORDER_LOG_SCHEMA))
        self.store.write_append(0, "docs", self._empty(DOCS_SCHEMA))
        self.store.write_append(0, "lineage", self._empty(LINEAGE_SCHEMA))
        self.store.write_append(
            0, "excluded", denied.select("url", F.lit(0).alias("round"))
        )
        self.store.write_append(0, "metrics", self._empty(METRICS_SCHEMA))
        self.store.commit(
            0,
            {
                "next_seq": n_seeded,
                "total_popped": 0,
                "round": 0,
                "frontier_size": n_seeded,
            },
        )

    # -- one round -------------------------------------------------------------

    def run_round(self) -> bool:
        cfg = self.cfg
        manifest = self.store.read_manifest()
        version = manifest["current"]
        rnd = manifest["round"] + 1
        next_seq = manifest["next_seq"]
        total_popped = manifest["total_popped"]

        # frontier emptiness is a manifest scalar — no probe job
        if manifest.get("frontier_size", 1) == 0:
            return False
        frontier = self.store.read(self.spark, "frontier", version)
        seen = self.store.read_appends(self.spark, "seen", version)
        host_state = self.store.read(self.spark, "host_state", version)

        # 1. refill token buckets for all known + current hosts
        #    (first-seen hosts start at capacity)
        hosts = frontier.select("host").distinct()
        levels = hosts.join(host_state, "host", "full_outer").select(
            "host",
            F.least(
                F.lit(cfg.bucket_capacity),
                F.coalesce(
                    F.col("level"), F.lit(cfg.bucket_capacity - cfg.bucket_fill)
                )
                + cfg.bucket_fill,
            ).alias("level"),
        )

        # 2. deadletter split
        dead = frontier.filter(F.col("attempt") > cfg.max_attempts)
        eligible = frontier.filter(F.col("attempt") <= cfg.max_attempts)

        # 3. politeness: per-host budget = bucket level
        budgeted = eligible.join(levels, "host")
        polite = host_topk(
            budgeted, "host", ["enqueue_seq"], budget_col="level"
        ).drop("host_rank", "level")

        # 4. weighted rotation + round capacity (closed-form interleave —
        # no global window; see frontier_ops.weighted_rotation_order_scalable)
        ordered = weighted_rotation_order_scalable(
            polite, "tier", "enqueue_seq", cfg.tier_weights
        )
        selected = ordered.filter(F.col("pop_seq") <= cfg.round_capacity).drop(
            "rank_in_tier", "virtual_time"
        )

        # 5. fetch: corpus join + failure injection
        corpus_keys = self.corpus.select(
            F.col("url").alias("c_url"), F.col("image_id")
        )
        fetched = selected.join(
            corpus_keys, selected.url == corpus_keys.c_url, "left"
        ).drop("c_url")
        url_h = stable_long_hash(F.col("url"))
        fetched = fetched.withColumn(
            "_fails",
            F.lit(cfg.inject_failures)
            & (
                (url_h % 23 == 5)
                | ((url_h % 11 == 3) & (F.col("attempt") < 2))
            ),
        ).withColumn(
            "outcome",
            F.when(F.col("_fails"), "Requeued")
            .when(F.col("type") != "image", "Traversed")
            .when(F.col("image_id").isNotNull(), "Processed")
            .otherwise("Missing"),
        )
        fetched = fetched.persist()
        # ONE job yields the whole outcome histogram (selected/requeued/
        # processed/...) instead of a count per stage
        hist = {
            r["outcome"]: r["count"]
            for r in fetched.groupBy("outcome").count().collect()
        }
        n_selected = sum(hist.values())
        n_requeued = hist.get("Requeued", 0)
        n_dead = dead.count()

        # order log (seq = global running pop counter)
        log_rows = fetched.select(
            (F.lit(total_popped) + F.col("pop_seq")).alias("seq"),
            F.lit(rnd).alias("round"),
            F.col("pop_seq"),
            "url",
            "type",
            "tier",
            "host",
            "outcome",
        )

        # 6. seen += non-requeued pops
        newly_seen = fetched.filter(F.col("outcome") != "Requeued").select(
            "url", stable_long_hash(F.col("url")).alias("url_hash")
        )
        seen_next = seen.unionByName(newly_seen)

        # docs (+ optional decode/PSNR validation — the J8 audit)
        processed = fetched.filter(F.col("outcome") == "Processed")
        if cfg.validate_images:
            cval = self.corpus.select(
                F.col("url").alias("c_url"),
                "bytes",
                "fmt",
                "ref_bytes",
                "caption",
            )
            docs_new = (
                processed.join(cval, processed.url == cval.c_url)
                .withColumn(
                    "psnr_db",
                    psnr_vs_reference_udf(
                        F.col("bytes"), F.col("fmt"), F.col("ref_bytes"), F.lit("png")
                    ),
                )
                .withColumn("valid", F.col("psnr_db") >= 40.0)
                .select("image_id", "url", F.lit(rnd).alias("round"), "psnr_db", "valid")
            )
        else:
            docs_new = processed.select(
                "image_id",
                "url",
                F.lit(rnd).alias("round"),
                F.lit(None).cast("double").alias("psnr_db"),
                F.lit(None).cast("boolean").alias("valid"),
            )

        # 7. children of Traversed pages (all selected-derived frames read
        # the persisted `fetched` — `selected` itself is never re-executed)
        remaining = eligible.join(fetched.select("url"), "url", "left_anti")
        parents = fetched.filter(F.col("outcome") == "Traversed").select(
            F.col("url").alias("src_url"),
            F.col("pop_seq").alias("parent_pop"),
            F.col("type").alias("parent_type"),
        )
        raw_children = parents.join(self.links, "src_url").select(
            "parent_pop",
            "parent_type",
            F.col("edge"),
            F.col("dst_url").alias("url"),
            F.col("dst_type").alias("type"),
        )
        if cfg.visitor_map is not None:
            # only traverse edges the visitor map declares for the parent type
            # (visitorMap.js:140-390 — unlisted edges are not queued)
            from ghcrawler_spark.plans.policy import visitor_map_df

            vm = visitor_map_df(self.spark, cfg.visitor_map)
            raw_children = raw_children.join(
                F.broadcast(vm.select("parent_type", "edge")),
                ["parent_type", "edge"],
                "left_semi",
            )
        raw_children = raw_children.drop("parent_type")
        # attenuate: first discovery wins per dst (J4)
        w_att = Window.partitionBy("url").orderBy("parent_pop", "edge", "url")
        uniq = (
            raw_children.withColumn("_rn", F.row_number().over(w_att))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # dedup vs seen (Bloom + exact confirm) and vs in-flight frontier
        uniq = uniq.withColumn("url_hash", stable_long_hash(F.col("url")))
        bloom = None
        if cfg.use_bloom:
            # size shards from the manifest pop counter (upper bound on the
            # seen-set size) — avoids a count job per round
            bloom = BloomShardSet.build(
                seen_next.select("url_hash"),
                num_shards=cfg.bloom_shards,
                fpr=cfg.bloom_fpr,
                expected_per_shard=max(
                    64, (total_popped + n_selected) // cfg.bloom_shards + 1
                ),
            )
        unseen_children = filter_unseen(
            uniq, seen_next.select("url_hash"), bloom, key_col="url_hash"
        ).drop("url_hash")
        fresh = unseen_children.join(
            remaining.select("url").unionByName(
                fetched.filter(F.col("outcome") == "Requeued").select("url")
            ),
            "url",
            "left_anti",
        )
        # persist: both the allowed (frontier) and denied (excluded) branches
        # read this frame — without it the Bloom probe + joins run twice
        fresh = fresh.withColumn("host", extract_host(F.col("url"))).persist()
        fresh_allowed, fresh_denied = self._robots_allowed(fresh)

        # 7b+8. one window assigns enqueue_seq to children AND tail requeues:
        # children first (_grp=0, by parent pop then url), then requeues
        # (_grp=1, by pop order). The per-round enqueue batch is bounded by
        # round_capacity × fan-out, so the single-partition sort is safe.
        child_rows = fresh_allowed.select(
            "url",
            "type",
            F.when(F.col("edge") == "images", "soon").otherwise("normal").alias("tier"),
            "host",
            F.lit(0).cast("int").alias("attempt"),
            F.lit(0).alias("_grp"),
            F.col("parent_pop").cast("long").alias("_ord"),
        )
        rq_rows = fetched.filter(F.col("outcome") == "Requeued").select(
            "url",
            "type",
            "tier",
            "host",
            (F.col("attempt") + 1).cast("int").alias("attempt"),
            F.lit(1).alias("_grp"),
            F.col("pop_seq").cast("long").alias("_ord"),
        )
        w_enq = Window.orderBy("_grp", "_ord", "url")
        new_rows = (
            child_rows.unionByName(rq_rows)
            .withColumn("enqueue_seq", F.lit(next_seq) + F.row_number().over(w_enq))
            .persist()
        )
        n_children = new_rows.filter(F.col("_grp") == 0).count()
        new_rows_clean = new_rows.select(
            "url", "type", "tier", "host", "enqueue_seq", "attempt"
        )

        # 9. bucket spend
        spend = fetched.groupBy("host").agg(F.count(F.lit(1)).alias("_n"))
        levels_next = levels.join(spend, "host", "left").select(
            "host",
            (F.col("level") - F.coalesce(F.col("_n"), F.lit(0))).alias("level"),
        )

        frontier_next = remaining.unionByName(new_rows_clean)
        # size arithmetic — no count jobs (invariant-checked by tests)
        n_frontier_after = (
            manifest["frontier_size"] - n_dead - n_selected + n_children + n_requeued
        )

        metrics_new = self.spark.createDataFrame(
            [(rnd, n_selected, n_children, n_requeued, n_dead, n_frontier_after)],
            METRICS_SCHEMA,
        )

        deadletter_prev = self.store.read(self.spark, "deadletter", version)
        deadletter_next = deadletter_prev.unionByName(
            dead.select(
                "url",
                "type",
                "tier",
                F.lit(rnd).alias("round"),
                "attempt",
                F.lit("max_attempts").alias("reason"),
            )
        )
        self.store.write_tables(
            rnd,
            {
                "frontier": frontier_next,
                "host_state": levels_next,
                "deadletter": deadletter_next,
            },
        )
        self.store.write_append(rnd, "seen", newly_seen)
        self.store.write_append(rnd, "order_log", log_rows)
        # per-partition lineage (north_rule): which (tier, host-bucket)
        # partition produced what this round — the audit trail that lets a
        # resumed run prove each partition was applied exactly once
        lineage = (
            fetched.groupBy(
                "tier",
                F.pmod(F.xxhash64("host"), F.lit(LINEAGE_BUCKETS))
                .cast("int")
                .alias("host_bucket"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_popped"),
                F.sum((F.col("outcome") == "Processed").cast("long")).alias("n_processed"),
                F.sum((F.col("outcome") == "Traversed").cast("long")).alias("n_traversed"),
                F.sum((F.col("outcome") == "Requeued").cast("long")).alias("n_requeued"),
                F.sum((F.col("outcome") == "Missing").cast("long")).alias("n_missing"),
            )
            .select(
                F.lit(rnd).alias("round"),
                "tier",
                "host_bucket",
                "n_popped",
                "n_processed",
                "n_traversed",
                "n_requeued",
                "n_missing",
            )
        )
        self.store.write_append(rnd, "lineage", lineage)
        if hist.get("Processed", 0) > 0:
            self.store.write_append(rnd, "docs", docs_new)
        self.store.write_append(
            rnd, "excluded", fresh_denied.select("url", F.lit(rnd).alias("round"))
        )
        self.store.write_append(rnd, "metrics", metrics_new)
        self.store.commit(
            rnd,
            {
                "next_seq": next_seq + n_children + n_requeued,
                "total_popped": total_popped + n_selected,
                "round": rnd,
                "frontier_size": n_frontier_after,
            },
        )
        fetched.unpersist()
        new_rows.unpersist()
        fresh.unpersist()
        return True

    def requeue_deadletters(self, url_filter: str | None = None) -> int:
        """Deadletter requeue API (lib/crawlerService.js:119-130 analog):
        move deadletters (optionally only urls rlike ``url_filter``) back
        into the frontier with attempt=0 at the tail, and clear them from
        the deadletter table. Committed as its own snapshot round."""
        manifest = self.store.read_manifest()
        version = manifest["current"]
        rnd = manifest["round"] + 1
        next_seq = manifest["next_seq"]

        dead = self.store.read(self.spark, "deadletter", version)
        if url_filter is not None:
            to_requeue = dead.filter(F.col("url").rlike(url_filter))
            keep = dead.filter(~F.col("url").rlike(url_filter))
        else:
            to_requeue, keep = dead, dead.limit(0)
        frontier = self.store.read(self.spark, "frontier", version)

        w = Window.orderBy("url")
        revived = to_requeue.select(
            "url",
            "type",
            "tier",
            F.col("url").alias("_h"),
        ).withColumn("host", extract_host(F.col("_h"))).drop("_h").withColumn(
            "enqueue_seq", F.lit(next_seq) + F.row_number().over(w)
        ).withColumn("attempt", F.lit(0).cast("int")).select(
            "url", "type", "tier", "host", "enqueue_seq", "attempt"
        )
        n_revived = revived.count()
        if n_revived == 0:
            return 0

        self.store.write_tables(
            rnd,
            {
                "frontier": frontier.unionByName(revived),
                "host_state": self.store.read(self.spark, "host_state", version),
                "deadletter": keep,
            },
        )
        self.store.commit(
            rnd,
            {
                "next_seq": next_seq + n_revived,
                "total_popped": manifest["total_popped"],
                "round": rnd,
                "frontier_size": manifest["frontier_size"] + n_revived,
            },
        )
        return n_revived

    def run(self) -> int:
        """Run rounds until the frontier drains; returns rounds executed."""
        rounds = 0
        while rounds < self.cfg.max_rounds and self.run_round():
            rounds += 1
        return rounds
