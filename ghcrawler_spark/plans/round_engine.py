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
only per-round scalar counters (next_seq, row counts) and the Bloom shard
BLOBS are collected. All joins are equi-joins on url/host; politeness +
rotation windows partition by host/tier; the seen anti-join is pre-filtered
by the sharded Bloom set so the exact join sees only probe-positives.

State I/O is MERGE-ON-READ (the Iceberg MOR model the north_rule's snapshot
store maps to): a round writes only the rows it touched — frontier adds,
frontier equality-deletes (popped/dead enqueue_seqs), deadletter adds, seen
delta, Bloom blobs — never a full-table rewrite. The Bloom set is folded
forward per round (union = bitwise OR over same-sized shard filters), so
per-round cost is O(rows touched), not O(crawl history). Compaction every
cfg.compact_every rounds rewrites the frontier/seen bases, bounding a
reader's delta fan-in. On a real cluster the per-version parquet dirs become
Iceberg append/delete files and the base swap becomes overwritePartitions.

CONCURRENCY INVARIANT: the snapshot store has exactly ONE writer (the
engine); the manifest swap is the commit point. External producers (the
streaming event source) never write engine tables — they stage rows into an
ingest directory the engine absorbs at round start (see attach_event_stream),
which is the snapshot-model replacement for per-message broker leases
(amqp10Queue.js:163-189): the engine needs no lease reclaim because nothing
else can hold its rows in flight.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ghcrawler_spark.functions.images import psnr_vs_reference_udf
from ghcrawler_spark.functions.urls import extract_host
from ghcrawler_spark.hashing import stable_long_hash
from ghcrawler_spark.operators.frontier_ops import (
    WEIGHT_SCALE,
    host_topk,
    scalable_rank_by_key,
    weighted_rotation_order_scalable,
)
from ghcrawler_spark.operators.seen import SHARD_SCHEMA, BloomShardSet, filter_unseen
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
    # merge-on-read state: rewrite the frontier/seen bases every K rounds;
    # between compactions a round writes only its own adds/removes deltas
    compact_every: int = 8


def _path_col(url):
    p = F.regexp_extract(url, "://[^/]*(/.*)$", 1)
    return F.when(p == "", "/").otherwise(p)


_TRACE = os.environ.get("SPARK_GRAFT_TRACE", "") == "1"


class _Tracer:
    """Phase stopwatch, printed when SPARK_GRAFT_TRACE=1 (perf forensics)."""

    def __init__(self, label: str):
        self.label = label
        self.t = time.perf_counter()

    def mark(self, phase: str) -> None:
        if _TRACE:
            now = time.perf_counter()
            print(f"[trace {self.label}] {phase}: {now - self.t:.2f}s", flush=True)
            self.t = now


def _run_writes(writes: list) -> None:
    """Run independent write jobs concurrently (wall = slowest, not sum)."""
    with ThreadPoolExecutor(max_workers=min(8, max(1, len(writes)))) as pool:
        list(pool.map(lambda w: w(), writes))


def _bloom_manifest(bloom: BloomShardSet) -> dict:
    return {
        "m_bits": bloom.m_bits,
        "k_funcs": bloom.k_funcs,
        "capacity_per_shard": bloom.capacity_per_shard,
        "num_shards": bloom.num_shards,
    }


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
        # Bloom shard blobs are cached on the engine (keyed by the committed
        # version they reflect) and persisted to the store every round, so a
        # resumed run reloads them instead of rescanning the whole seen set
        self._bloom = None
        self._bloom_version: int | None = None
        deny_rows = [
            (h, p) for h, prefixes in self.cfg.robots_deny.items() for p in prefixes
        ]
        self.deny_df = spark.createDataFrame(
            deny_rows or [("_none_", "_never_")], "host string, prefix string"
        )

    # -- state helpers --------------------------------------------------------

    def _empty(self, schema: str) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def _bases(self, manifest: dict) -> dict:
        version = manifest["current"]
        return manifest.get(
            "bases", {"frontier": version, "seen": None, "deadletter": version}
        )

    def _read_frontier(self, version: int, bases: dict) -> DataFrame:
        """Merge-on-read frontier: base ∪ per-round adds, minus the equality
        deletes (keyed on enqueue_seq — unique per row INCARNATION, so a url
        popped in round r and re-enqueued later is never shadowed by the
        old remove)."""
        return self.store.read_merged(
            self.spark, "frontier", version, bases["frontier"], key_col="enqueue_seq"
        )

    def _read_seen(self, version: int, bases: dict) -> DataFrame:
        base_v = bases.get("seen")
        if base_v is None:
            return self.store.read_appends(self.spark, "seen", version)
        out = self.store.read(self.spark, "seen", base_v)
        try:
            deltas = self.store.read_appends(
                self.spark, "seen", version, from_version=base_v + 1
            )
            out = out.unionByName(deltas)
        except FileNotFoundError:
            pass
        return out

    def _read_deadletter(self, version: int, bases: dict) -> DataFrame:
        out = self.store.read(self.spark, "deadletter", bases["deadletter"])
        try:
            adds = self.store.read_appends(
                self.spark,
                "deadletter_adds",
                version,
                from_version=bases["deadletter"] + 1,
            )
            out = out.unionByName(adds)
        except FileNotFoundError:
            pass
        return out

    def current_frontier(self) -> DataFrame:
        """The live frontier view at the committed manifest version."""
        manifest = self.store.read_manifest()
        return self._read_frontier(manifest["current"], self._bases(manifest))

    def current_deadletter(self) -> DataFrame:
        """The live deadletter view at the committed manifest version
        (crawlerService list/count analog, lib/crawlerService.js:91-130)."""
        manifest = self.store.read_manifest()
        return self._read_deadletter(manifest["current"], self._bases(manifest))

    def deadletter_count(self) -> int:
        return self.current_deadletter().count()

    def list_deadletters(self, limit: int = 10_000) -> list:
        """First ``limit`` deadletters (storageDocStore.js:96-189 caps its
        list API at 10000 the same way)."""
        return self.current_deadletter().limit(limit).collect()

    def _write_bloom(self, version: int, bloom: BloomShardSet) -> None:
        """Persist shard blobs (tiny: num_shards rows) so a resumed run
        reloads them instead of rebuilding from the full seen set."""
        rows_df = self.spark.createDataFrame(bloom.to_rows(), SHARD_SCHEMA)
        self.store.write_append(version, "bloom", rows_df)

    def _load_bloom(self, version: int, manifest: dict, seen: DataFrame) -> BloomShardSet:
        """Cached blobs when this engine committed ``version``; else the
        persisted blobs; else (pre-incremental store) a full rebuild."""
        if self._bloom is not None and self._bloom_version == version:
            return self._bloom
        info = manifest.get("bloom")
        if info is not None:
            try:
                rows = self.store.read_appends(
                    self.spark, "bloom", version, from_version=version
                ).collect()
                return BloomShardSet.from_rows(
                    rows,
                    num_shards=info["num_shards"],
                    m_bits=info["m_bits"],
                    k_funcs=info["k_funcs"],
                    capacity_per_shard=info["capacity_per_shard"],
                )
            except FileNotFoundError:
                pass
        return BloomShardSet.build(
            seen.select("url_hash"),
            num_shards=self.cfg.bloom_shards,
            fpr=self.cfg.bloom_fpr,
        )

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
        # enqueue_seq = rank by url — via the range-partitioned distributed
        # rank, NOT a global Window.orderBy (a 10^10-URL seed list would sort
        # in one task)
        persisted: list = []
        frontier = scalable_rank_by_key(
            allowed, ["url"], "enqueue_seq", persisted=persisted
        ).select("url", "type", "tier", "host", "enqueue_seq", F.col("attempt").cast("int"))
        n_seeded = frontier.count()
        # v0 holds the BASE tables of the merge-on-read model; rounds write
        # only adds/removes deltas until a compaction moves the base pointer
        self.store.write_tables(
            0,
            {
                "frontier": frontier,
                "host_state": self._empty(HOST_STATE_SCHEMA),
                "deadletter": self._empty(DEADLETTER_SCHEMA),
            },
        )
        # history tables: append-only deltas (Iceberg append-snapshot model)
        _run_writes(
            [
                lambda: self.store.write_append(0, "seen", self._empty(SEEN_SCHEMA)),
                lambda: self.store.write_append(
                    0, "order_log", self._empty(ORDER_LOG_SCHEMA)
                ),
                lambda: self.store.write_append(0, "docs", self._empty(DOCS_SCHEMA)),
                lambda: self.store.write_append(
                    0, "lineage", self._empty(LINEAGE_SCHEMA)
                ),
                lambda: self.store.write_append(
                    0, "excluded", denied.select("url", F.lit(0).alias("round"))
                ),
                lambda: self.store.write_append(
                    0, "metrics", self._empty(METRICS_SCHEMA)
                ),
            ]
        )
        bloom = BloomShardSet.empty(
            num_shards=self.cfg.bloom_shards,
            expected_per_shard=max(
                4096, 2 * n_seeded // max(self.cfg.bloom_shards, 1)
            ),
            fpr=self.cfg.bloom_fpr,
        )
        self._write_bloom(0, bloom)
        self.store.commit(
            0,
            {
                "next_seq": n_seeded,
                "total_popped": 0,
                "round": 0,
                "frontier_size": n_seeded,
                "bases": {"frontier": 0, "seen": None, "deadletter": 0},
                "bloom": _bloom_manifest(bloom),
            },
        )
        self._bloom, self._bloom_version = bloom, 0
        for f in persisted:
            f.unpersist()

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
        persisted: list = []  # frames to unpersist once the round commits
        tr = _Tracer(f"round {rnd}")
        bases = self._bases(manifest)
        # persist the merged frontier view: half a dozen downstream frames
        # (hosts, dead, eligible, remaining, ...) scan it, and the merge-on-
        # read union+anti-join is no longer a free parquet re-read
        frontier = self._read_frontier(version, bases).persist()
        persisted.append(frontier)
        seen = self._read_seen(version, bases)
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
        # bounds come from the manifest (enqueue_seq ∈ [1, next_seq]) — saves
        # the rank's min/max pass over the politeness output
        ordered = weighted_rotation_order_scalable(
            polite,
            "tier",
            "enqueue_seq",
            cfg.tier_weights,
            bounds=(1, max(1, next_seq)),
            persisted=persisted,
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
        tr.mark("select+fetch (hist)")
        n_selected = sum(hist.values())
        n_requeued = hist.get("Requeued", 0)
        n_dead = dead.count()
        tr.mark("dead count")

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
        bloom_prev = None
        if cfg.use_bloom:
            # INCREMENTAL: Bloom union is bitwise OR — fold only this round's
            # newly-seen keys into last round's persisted shard blobs instead
            # of rescanning the whole seen set (O(batch), not O(total)).
            # Filter contents only affect probe selectivity, never output
            # (exact anti-join confirms), so a replay that merges onto a
            # slightly different filter still commits identical state.
            bloom_prev = self._load_bloom(version, manifest, seen)
            bloom = bloom_prev.merged(newly_seen.select("url_hash"))
            tr.mark("bloom merge")
            if bloom.overflowed():
                # amortized resize: full rebuild at 4x capacity (happens
                # O(log n) times over a crawl, never per round)
                bloom = BloomShardSet.build(
                    seen_next.select("url_hash"),
                    num_shards=cfg.bloom_shards,
                    fpr=cfg.bloom_fpr,
                    expected_per_shard=max(64, 4 * bloom.capacity_per_shard),
                )
        unseen_children = filter_unseen(
            uniq, seen_next.select("url_hash"), bloom, key_col="url_hash",
            persisted=persisted,
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
        tr.mark("children+enqueue (count)")
        new_rows_clean = new_rows.select(
            "url",
            "type",
            "tier",
            "host",
            # explicit: lit(int)+row_number is IntegerType, but the delta
            # files must match the base table's long schema exactly
            F.col("enqueue_seq").cast("long").alias("enqueue_seq"),
            "attempt",
        )

        # 9. bucket spend
        spend = fetched.groupBy("host").agg(F.count(F.lit(1)).alias("_n"))
        levels_next = levels.join(spend, "host", "left").select(
            "host",
            (F.col("level") - F.coalesce(F.col("_n"), F.lit(0))).alias("level"),
        )

        # size arithmetic — no count jobs (invariant-checked by tests)
        n_frontier_after = (
            manifest["frontier_size"] - n_dead - n_selected + n_children + n_requeued
        )

        metrics_new = self.spark.createDataFrame(
            [(rnd, n_selected, n_children, n_requeued, n_dead, n_frontier_after)],
            METRICS_SCHEMA,
        )

        # ---- state writes: merge-on-read. A round writes ONLY the rows it
        # touched — frontier adds (children+requeues), frontier removes
        # (popped+dead enqueue_seqs, i.e. Iceberg-style equality deletes),
        # deadletter adds, and the (tiny, per-host) token-bucket table.
        # Every cfg.compact_every rounds the current frontier/seen views are
        # rewritten as new BASES, which bounds both the delta-dir fan-in and
        # the delete-key anti-join a read performs.
        full_tables = {"host_state": levels_next}
        new_bases = dict(bases)
        if cfg.compact_every and rnd - bases["frontier"] >= cfg.compact_every:
            full_tables["frontier"] = remaining.unionByName(new_rows_clean)
            new_bases["frontier"] = rnd
            full_tables["seen"] = seen_next
            new_bases["seen"] = rnd
        writes: list = [
            lambda: self.store.write_tables(rnd, full_tables),
            lambda: self.store.write_append(rnd, "frontier_adds", new_rows_clean),
            lambda: self.store.write_append(
                rnd,
                "frontier_removes",
                fetched.select("enqueue_seq").unionByName(dead.select("enqueue_seq")),
            ),
            lambda: self.store.write_append(rnd, "seen", newly_seen),
            lambda: self.store.write_append(rnd, "order_log", log_rows),
        ]
        if n_dead > 0:
            writes.append(
                lambda: self.store.write_append(
                    rnd,
                    "deadletter_adds",
                    dead.select(
                        "url",
                        "type",
                        "tier",
                        F.lit(rnd).alias("round"),
                        "attempt",
                        F.lit("max_attempts").alias("reason"),
                    ),
                )
            )
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
        writes.append(lambda: self.store.write_append(rnd, "lineage", lineage))
        if hist.get("Processed", 0) > 0:
            writes.append(lambda: self.store.write_append(rnd, "docs", docs_new))
        if self.cfg.robots_deny:
            writes.append(
                lambda: self.store.write_append(
                    rnd,
                    "excluded",
                    fresh_denied.select("url", F.lit(rnd).alias("round")),
                )
            )
        writes.append(lambda: self.store.write_append(rnd, "metrics", metrics_new))
        if cfg.use_bloom:
            writes.append(lambda: self._write_bloom(rnd, bloom))
        # the round's dozen-odd state writes are independent parquet jobs over
        # small frames — submit them concurrently so the wall cost is the
        # slowest write, not the sum of per-job scheduling latencies. (The
        # durability point is still the single manifest swap in commit().)
        _run_writes(writes)
        tr.mark("state writes")
        extras = {
            "next_seq": next_seq + n_children + n_requeued,
            "total_popped": total_popped + n_selected,
            "round": rnd,
            "frontier_size": n_frontier_after,
            "bases": new_bases,
        }
        if cfg.use_bloom:
            extras["bloom"] = _bloom_manifest(bloom)
        self.store.commit(rnd, extras)
        fetched.unpersist()
        new_rows.unpersist()
        fresh.unpersist()
        for f in persisted:
            f.unpersist()
        if cfg.use_bloom:
            # cache the new set for next round; free superseded broadcasts
            old = self._bloom
            self._bloom, self._bloom_version = bloom, rnd
            # old and bloom_prev are normally the same object; dedup by id
            for stale in {id(s): s for s in (old, bloom_prev)}.values():
                if stale is not None and stale is not bloom:
                    stale.destroy()
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
        bases = self._bases(manifest)

        dead = self._read_deadletter(version, bases)
        if url_filter is not None:
            to_requeue = dead.filter(F.col("url").rlike(url_filter))
            keep = dead.filter(~F.col("url").rlike(url_filter))
        else:
            to_requeue, keep = dead, dead.limit(0)

        persisted: list = []
        revived = (
            scalable_rank_by_key(
                to_requeue.select("url", "type", "tier"),
                ["url"],
                "_rank",
                persisted=persisted,
            )
            .withColumn("host", extract_host(F.col("url")))
            .withColumn(
                "enqueue_seq", (F.lit(next_seq) + F.col("_rank")).cast("long")
            )
            .withColumn("attempt", F.lit(0).cast("int"))
            .select("url", "type", "tier", "host", "enqueue_seq", "attempt")
        )
        n_revived = revived.count()
        if n_revived == 0:
            for f in persisted:
                f.unpersist()
            return 0

        # revived rows are frontier ADDS; the deadletter table is compacted
        # in place (its base pointer moves to this round) — requeue is the
        # one op that removes deadletter rows, and it is rare by nature
        self.store.write_tables(
            rnd,
            {
                "host_state": self.store.read(self.spark, "host_state", version),
                "deadletter": keep,
            },
        )
        self.store.write_append(rnd, "frontier_adds", revived)
        new_bases = dict(bases)
        new_bases["deadletter"] = rnd
        extras = {
            "next_seq": next_seq + n_revived,
            "total_popped": manifest["total_popped"],
            "round": rnd,
            "frontier_size": manifest["frontier_size"] + n_revived,
            "bases": new_bases,
        }
        if "bloom" in manifest:
            # blobs are per-version: carry the previous version's forward
            self._write_bloom(
                rnd,
                self._load_bloom(
                    version, manifest, self._read_seen(version, bases)
                ),
            )
            extras["bloom"] = manifest["bloom"]
        self.store.commit(rnd, extras)
        if self._bloom_version == version:
            self._bloom_version = rnd
        for f in persisted:
            f.unpersist()
        return n_revived

    def run(self) -> int:
        """Run rounds until the frontier drains; returns rounds executed."""
        rounds = 0
        while rounds < self.cfg.max_rounds and self.run_round():
            rounds += 1
        return rounds
