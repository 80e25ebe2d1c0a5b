"""Pure-Python reference simulator — the crawl-order oracle.

Implements ghcrawler's loop semantics (pop → filter → fetch → process →
store → complete, lib/crawler.js:92-107) under the engine's DETERMINISTIC
serialization spec (SURVEY.md §4 "hard parts": the reference's Math.random
queue rotation is replaced by seeded integer virtual-time rotation in BOTH
the simulator and the Spark engine, so order is well-defined and
parallelism-independent).

=== ROUND SPEC v1 (the contract tests pin engine == simulator on) ===

State: frontier rows (url, type, tier, host, enqueue_seq, attempt);
seen set (urls ever popped); host bucket levels (integer token bucket);
order log; docs; deadletter; next_seq counter.

Round r = 1, 2, ...:
 1. refill: level = min(capacity, level + fill_rate) for all known and
    current hosts; first-seen hosts start at capacity. (integer arithmetic)
 2. deadletter: frontier rows with attempt > max_attempts move to the
    deadletter table (not logged in the order log — never popped).
 3. politeness: rank eligible rows per host by enqueue_seq;
    keep host_rank <= level(host)           [W3; tokenFactory benching]
 4. weighted rotation: rank_in_tier (by enqueue_seq) * (2520/weight[tier])
    = virtual_time; pop order = (virtual_time, tier, rank_in_tier);
    keep pop_seq <= round_capacity          [W1/W2; queueSet.js:46-65]
 5. fetch: selected image URLs resolve in the corpus (Processed / Missing);
    pages resolve in the link table (Traversed). Deterministic failure
    injection: urls with stable_hash(url) % 11 == 3 fail while
    attempt < 2 → outcome Requeued, attempt+1, re-enqueued at the tail
    (new enqueue_seq)                       [retry: crawler.js:150-154]
 6. seen += successfully popped urls (Processed/Traversed/Missing —
    NOT Requeued).
 7. children of Traversed pages: edge 'images' → tier 'soon', 'pages' →
    'normal' [pagination-to-soon analog githubProcessor.js:58-79];
    attenuate within batch (first by (parent pop_seq, edge, dst_url) per
    dst_url) [J4]; drop urls in seen or still in frontier [J1/J5]; drop
    robots-denied urls (path prefix match → excluded log) [F1/robots];
    survivors get enqueue_seq = next_seq + rank(parent pop_seq, dst_url),
    attempt=0.
 8. requeued rows re-enter after children: enqueue_seq ordered by pop_seq.
 9. bucket level -= popped count per host.
10. round metrics; stop when the frontier is empty.

Robots check also applies to the SEED list at enqueue time.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

WEIGHT_SCALE = 2520
TIER_WEIGHTS = {"immediate": 3, "soon": 2, "normal": 3, "later": 2}


def stable_hash(s: str) -> int:
    """Must equal hashing.stable_long_hash (md5 hex prefix, 60 bits)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def host_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    return rest.split("/", 1)[0].lower()


def path_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    return "/" + rest.split("/", 1)[1] if "/" in rest else "/"


def fails_fetch(url: str, attempt: int) -> bool:
    """Deterministic failure injection: hash%11==3 → transient (secondary
    throttle analog, recovers at attempt 2); hash%23==5 → permanent (Bailed
    analog, requeues until max_attempts → deadletter)."""
    h = stable_hash(url)
    return h % 23 == 5 or (h % 11 == 3 and attempt < 2)


@dataclass
class SimConfig:
    tier_weights: dict = field(default_factory=lambda: dict(TIER_WEIGHTS))
    bucket_capacity: int = 4
    bucket_fill: int = 2
    round_capacity: int = 16
    max_attempts: int = 5
    max_rounds: int = 200
    robots_deny: dict = field(default_factory=dict)  # host -> [path prefixes]
    visitor_map: dict | None = None  # {parent_type: {edge: child_type}}
    inject_failures: bool = True


@dataclass
class FrontierRow:
    url: str
    type: str
    tier: str
    host: str
    enqueue_seq: int
    attempt: int = 0


class ReferenceSimulator:
    """Single-threaded oracle. corpus: {image_url: image_id};
    links: {src_url: [(edge, dst_url, dst_type)]} (sorted lists)."""

    def __init__(self, corpus: dict, links: dict, cfg: SimConfig):
        self.corpus = corpus
        self.links = links
        self.cfg = cfg
        self.frontier: list[FrontierRow] = []
        self.seen: set[str] = set()
        self.levels: dict[str, int] = {}
        self.order_log: list[dict] = []
        self.deadletter: list[dict] = []
        self.excluded: list[dict] = []
        self.docs: list[dict] = []
        self.metrics: list[dict] = []
        self.next_seq = 0
        self.round = 0

    def _denied(self, url: str) -> bool:
        host = host_of(url)
        return any(path_of(url).startswith(p) for p in self.cfg.robots_deny.get(host, ()))

    def seed(self, seeds: list[dict]) -> None:
        for s in sorted(seeds, key=lambda x: x["url"]):
            if self._denied(s["url"]):
                self.excluded.append({"url": s["url"], "round": 0})
                continue
            self.next_seq += 1
            self.frontier.append(
                FrontierRow(
                    url=s["url"], type=s["type"], tier=s["tier"],
                    host=host_of(s["url"]), enqueue_seq=self.next_seq,
                )
            )

    def run_round(self) -> bool:
        """One round; returns False when the frontier was empty (done)."""
        if not self.frontier:
            return False
        self.round += 1
        cfg = self.cfg

        # 1. refill (all known + current hosts — levels recover while idle)
        hosts = {r.host for r in self.frontier} | set(self.levels)
        for h in hosts:
            self.levels[h] = min(
                cfg.bucket_capacity,
                self.levels.get(h, cfg.bucket_capacity - cfg.bucket_fill)
                + cfg.bucket_fill,
            )

        # 2. deadletter
        dead = [r for r in self.frontier if r.attempt > cfg.max_attempts]
        self.frontier = [r for r in self.frontier if r.attempt <= cfg.max_attempts]
        for r in dead:
            self.deadletter.append(
                {"url": r.url, "type": r.type, "tier": r.tier, "round": self.round,
                 "attempt": r.attempt, "reason": "max_attempts"}
            )

        # 3. politeness
        by_host: dict[str, list[FrontierRow]] = {}
        for r in sorted(self.frontier, key=lambda x: x.enqueue_seq):
            by_host.setdefault(r.host, []).append(r)
        polite: list[FrontierRow] = []
        for h, rows in by_host.items():
            polite.extend(rows[: max(self.levels[h], 0)])

        # 4. weighted rotation + round capacity
        by_tier: dict[str, list[FrontierRow]] = {}
        for r in sorted(polite, key=lambda x: x.enqueue_seq):
            by_tier.setdefault(r.tier, []).append(r)
        schedule = []
        for tier, rows in by_tier.items():
            stride = WEIGHT_SCALE // cfg.tier_weights[tier]
            for i, r in enumerate(rows, start=1):
                schedule.append((i * stride, tier, i, r))
        schedule.sort(key=lambda x: (x[0], x[1], x[2]))
        selected = [r for _, _, _, r in schedule[: cfg.round_capacity]]
        selected_urls = {r.url for r in selected}
        self.frontier = [r for r in self.frontier if r.url not in selected_urls]

        # 5-6. fetch + outcomes
        requeued: list[FrontierRow] = []
        traversed: list[tuple[int, FrontierRow]] = []
        for pop_seq, r in enumerate(selected, start=1):
            if cfg.inject_failures and fails_fetch(r.url, r.attempt):
                outcome = "Requeued"
                r.attempt += 1
                requeued.append(r)
            elif r.type == "image":
                if r.url in self.corpus:
                    outcome = "Processed"
                    self.docs.append(
                        {"image_id": self.corpus[r.url], "url": r.url,
                         "round": self.round}
                    )
                else:
                    outcome = "Missing"
                self.seen.add(r.url)
            else:
                outcome = "Traversed"
                self.seen.add(r.url)
                traversed.append((pop_seq, r))
            self.order_log.append(
                {"seq": len(self.order_log) + 1, "round": self.round,
                 "pop_seq": pop_seq, "url": r.url, "type": r.type,
                 "tier": r.tier, "host": r.host, "outcome": outcome}
            )

        # 9. bucket spend (all popped rows consumed a fetch slot)
        for r in selected:
            self.levels[r.host] -= 1

        # 7. children (requeued rows are still in-flight → count as frontier)
        frontier_urls = {r.url for r in self.frontier} | {r.url for r in requeued}
        best: dict[str, tuple] = {}  # dst_url -> (parent_pop, edge, dst_type)
        for pop_seq, parent in traversed:
            for edge, dst, dst_type in self.links.get(parent.url, ()):
                if cfg.visitor_map is not None and edge not in cfg.visitor_map.get(
                    parent.type, {}
                ):
                    continue
                key = (pop_seq, edge, dst)
                if dst not in best or key < best[dst][:3]:
                    best[dst] = (pop_seq, edge, dst, dst_type)
        children = []
        for dst, (ppop, edge, _, dst_type) in best.items():
            if dst in self.seen or dst in frontier_urls:
                continue
            if self._denied(dst):
                self.excluded.append({"url": dst, "round": self.round})
                continue
            children.append((ppop, dst, edge, dst_type))
        children.sort(key=lambda x: (x[0], x[1]))
        for ppop, dst, edge, dst_type in children:
            self.next_seq += 1
            self.frontier.append(
                FrontierRow(
                    url=dst, type=dst_type,
                    tier="soon" if edge == "images" else "normal",
                    host=host_of(dst), enqueue_seq=self.next_seq,
                )
            )

        # 8. requeues re-enter at the tail
        for r in requeued:
            self.next_seq += 1
            r.enqueue_seq = self.next_seq
            self.frontier.append(r)

        self.metrics.append(
            {"round": self.round, "selected": len(selected),
             "children": len(children), "requeued": len(requeued),
             "deadlettered": len(dead), "frontier_after": len(self.frontier)}
        )
        return True

    def run(self) -> None:
        while self.round < self.cfg.max_rounds and self.run_round():
            pass
