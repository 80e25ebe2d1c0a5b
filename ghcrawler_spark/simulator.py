"""Pure-Python reference simulator — the crawl-order oracle.

Implements ghcrawler's loop semantics (pop → filter → fetch → process →
store → complete, lib/crawler.js:92-107) under the engine's DETERMINISTIC
serialization spec (SURVEY.md §4 "hard parts": the reference's Math.random
queue rotation is replaced by seeded integer virtual-time rotation in BOTH
the simulator and the Spark engine, so order is well-defined and
parallelism-independent).

=== ROUND SPEC v5 (the contract tests pin engine == simulator on) ===

State: frontier rows (url, type, tier, host, enqueue_seq, attempt,
policy_fetch, policy_freshness, map_path, history, payload_id, qualifier,
map_name); seen set (urls ever completed); stored docs {url: (round,
version)}; tombstones {url: deletion round}; host state (integer token
bucket level, bench_until round); order log; docs; deadletter; excluded;
next_seq counter; pending event batches; cost_baseline (measured-cost mode
running min).

v5 additions over v4 (round 5):
 - ``bounced`` metric (redisRequestTracker.js:27 logs every tracker-bounced
   push): child candidates that survive attenuation AND the seen-set dedup
   but are dropped because their url is already in flight (J5) are counted
   per round. The J5 check order is now pinned as seen-dedup FIRST, then
   in-flight (both orders drop the same rows; the order only defines which
   counter a doubly-dropped url lands in).
 - ``exclude_not_found`` (lib/crawler.js:528-533 excludeNotFound): when set,
   a row whose origin fetch finds nothing (outcome Missing) goes STRAIGHT to
   the deadletter with reason 'excludeNotFound' in the same round — it still
   logs Missing and completes into the seen set, but never burns attempts.
   (Fidelity note: the reference's policy SKIPS STORING the 404 deadletter
   doc; the graft records the row with that reason instead — a strict
   superset for auditability. Filter reason != 'excludeNotFound' to get the
   reference's store contents.)
 - ``bailed_retry`` (githubFetcher.js:67-72): when set, a PERMANENT-class
   failure gets exactly ONE retry (the reference's single elevated-token
   retry) and then deadletters with reason 'Bailed' (outcome ``Bailed``,
   completes into seen) instead of looping to max_attempts. Transient
   (throttle-class) failures keep their own retry semantics and take
   precedence while they apply.
 - ``tombstones`` (lib/crawler.js:375,433-434 deletedAt;
   githubProcessor.js:599-724 deletion handlers): an event with action
   'deleted' is a DELETION DIRECTIVE, not a crawl request — it never
   enqueues; it stamps tombstones[url] = round. A deletion may be
   cacheKey-addressed (githubProcessor deletes by cache key when no url is
   known): url absent but payload_id set resolves to the stored doc whose
   image_id == payload_id (latest upsert wins). A url is DELETED while
   tombstone_round >= round of the latest stored doc (ties: deletion wins).
   Popping a deleted url short-circuits: non-origin fetch sources log
   ``Deleted`` (the stored doc is tombstoned, crawler.js:375); an origin
   contact finds the entity GONE at origin → ``Missing`` (and the
   excludeNotFound lane applies if configured). Either way the row
   completes into seen, stores no doc, and traverses no children — the
   deleted subtree is never re-queued (crawler.js:433-434). Only a later
   event carrying an inline payload document resurrects the url (its doc
   upsert outdates the tombstone). Deletion directives are exempt from F7
   timeline visibility (they are control flow, not timeline items); a
   deletion with neither url nor payload_id deadletters as 'malformed'.

v4 additions over v3 (round 4):
 - Outcome taxonomy (lib/crawler.js:509-519, request.js markRequeue): a
   TRANSIENT (throttle-class) failure now logs outcome ``Throttled``
   (markRequeue('Throttled'), githubFetcher.js:176-192); ``Requeued`` is
   reserved for permanent-fail retries. Both re-enqueue identically.
 - Metrics gain ``attenuated`` (duplicate child edges collapsed by J4 this
   round, counted over enqueued children: occurrences − 1 per kept dst) and
   ``deferred`` (eligible rows withheld because their host is benched —
   the deferred-visibility analog of crawler.js:512-515).
 - Policy SPEC strings (traversalPolicy.js:90-148): seeds may carry
   ``policy="<name>[:<[scenario/]map[@path]>]"``; the named policy resolves
   to (fetch, freshness), the scenario selects a NAMED visitor-map cut
   (visitorMap.js:366-390 mapList), recorded per row as ``map_name`` and
   inherited by children. Explicit policy columns always win over the spec.
 - Typed links on stored docs (lib/request.js:119-140): every doc carries
   ``links`` = [self(resource), siblings(collection)] + the map cut's
   declared edges; relation hrefs are branded with the deterministic
   page-set guid stable_hash(urn|edge) (githubProcessor.js:1005-1020).
 - Pagination fan-out (githubProcessor.js:58-79): a ``paginate_types`` row
   that traverses also queues pages 2..synthetic_last_page(url) to 'soon'
   (pseudo-edge '_pages', same attenuation/dedup funnel); pages keep the
   parent's own qualifier + map path and never re-paginate.
 - F7 event visibility (githubProcessor.js:460-478): with
   ``event_visibility`` set, staged events whose (type, action) is not
   timeline-visible are dropped before the first-wins dedup.

v3 additions over v2:
 - URN lineage (lib/request.js:106-140): every frontier row carries a
   ``qualifier`` — seeds/events anchor at ``urn:host:<host>``; a child's
   qualifier is its parent's URN (qualifier:type:stable_hash(url)); stored
   docs persist (urn, parent_urn), so the doc store answers URN-prefix
   queries ("everything under host X") like the reference's mapping stores.
 - Webhook authenticity (routes/webhook.js:15-24): with webhook_secret set,
   an event must carry sig == HMAC-SHA1(secret, url|type); mismatches (and
   unsigned events) deadletter with reason 'unverified' BEFORE any other
   check.
 - Measured compute cost (computeLimiter.js:44-77): with measured_costs,
   politeness still preallocates the static per-type cost, but step 9
   charges max(1, synthetic_elapsed − cost_baseline) once a baseline
   exists; cost_baseline = running min of observed elapsed, refreshed from
   each round's observations after the spend.

Round r = 1, 2, ...:
 0. event ingest: pending webhook-style events (sorted by (event_ms, url),
    first occurrence per url wins) enter the 'events' tier (weight 10,
    crawlerFactory.js:86) with the event policy (freshness 'always' — an
    event announces a change, so the seen set does not block it); rows
    already in the frontier are dropped; malformed rows (null/relative url
    or missing type) go to the deadletter with reason 'malformed'
    (lib/crawler.js:563-576); robots-denied rows are excluded. Events may
    carry a payload document (payload_id) — those skip the fetch entirely
    (lib/crawler.js:348-358).
 1. refill: level = min(capacity, level + fill_rate) for all known and
    current hosts; first-seen hosts start at capacity. (integer arithmetic;
    benched hosts keep refilling — tokenFactory.js restores benched tokens)
 2. deadletter: frontier rows with attempt > max_attempts move to the
    deadletter table (not logged in the order log — never popped).
 3. politeness: benched hosts (bench_until >= r) are withheld entirely
    (tokenFactory bench, tokenFactory.js:41-93). Per host, take rows in
    enqueue_seq order while the cumulative COMPUTE COST stays within the
    bucket level (computeLimiter.js:27-77; cost = compute_costs[type],
    default 1 — with unit costs this is exactly rank <= level)  [W3/J6/A2]
 3b. trait caps: when trait_budgets is set, requests map to a token trait
    (type_traits[type], default the type itself) and at most
    trait_budgets[trait] rows per trait survive per round, FIFO
    (token trait matching, tokenFactory.js:41-74)                   [J6]
 4. weighted rotation: rank_in_tier (by enqueue_seq) * (2520/weight[tier])
    = virtual_time; pop order = (virtual_time, tier, rank_in_tier);
    keep pop_seq <= round_capacity          [W1/W2; queueSet.js:46-65]
 5. fetch (traversalPolicy.js:205-223 fetch-source resolution):
      stored   = url in the doc store
      fsrc     = fetch_source(policy_fetch, type mutability, stored)
      payload rows → Processed (no fetch, no failure possible)
      deterministic failure injection applies ONLY to origin contact
      (fsrc in {origin, etag}): hash%23==5 permanent, hash%11==3 while
      attempt<2 transient → outcome Throttled (permanent: Requeued),
      attempt+1, re-enqueued at the tail     [retry: crawler.js:150-154]
      fsrc == skip → outcome Skipped (storageOnly and nothing stored)
      pages (not skipped/failed) → Traversed
      images: origin fetch resolves in the corpus (else Missing);
      stored content (fsrc storage, or etag → 304 since the corpus is
      static) arrives with content_from_origin = False; then
      should_process(freshness) (traversalPolicy.js:170-188) decides
      Processed (doc upserted with (round, processor_version)) vs
      Unchanged (completed, no doc)
 6. seen += every popped url whose outcome is not requeue-class
    (Throttled/Requeued re-enter; everything else completes).
 7. children of Traversed pages: edge 'images' → tier 'soon', 'pages' →
    'normal'; a child edge is INVISIBLE when its key (type@url) appears in
    parent.history + [parent key] (per-traversal hasSeen,
    lib/request.js:66-74,146-150) — this alone bounds cyclic revisits;
    attenuate within batch (first by (parent pop_seq, edge, dst_url) per
    dst_url) [J4]; drop urls still in the frontier [J5]; drop urls in the
    global seen set UNLESS the child's freshness policy is 'always'
    (revisit-policies may re-crawl; 'match' and friends defer to the dedup
    cache) [J1/U2]; drop robots-denied urls (→ excluded) [F1]; survivors
    inherit the winning parent's policy with map_path descended one step
    (traversalPolicy.js:154-160) and history extended by the parent key;
    enqueue_seq = next_seq + rank(parent pop_seq, dst_url).
 8. requeued rows re-enter after children: enqueue_seq ordered by pop_seq.
 9. bucket level -= Σ compute cost of popped rows per host; when
    bench_on_throttle is set, a host that took a TRANSIENT (throttle-class)
    failure this round is benched: bench_until = r + bench_rounds
    (403-retry-after benching, githubFetcher.js:176-192).
10. round metrics; stop when the frontier is empty and no events pend.

Robots + malformed checks also apply to the SEED list at enqueue time.
Defaults (policy originStorage:match@/, no payload, no costs/traits/bench,
empty events) reproduce ROUND SPEC v1 verbatim — pinned by the preexisting
oracle tests.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import re
from dataclasses import dataclass, field, replace

WEIGHT_SCALE = 2520
TIER_WEIGHTS = {"events": 10, "immediate": 3, "soon": 2, "normal": 3, "later": 2}

IMMUTABLE_TYPES = ("image",)
EVENT_POLICY = ("originStorage", "always", "/")

_URL_RE = re.compile(r"^https?://")


def stable_hash(s: str) -> int:
    """Must equal hashing.stable_long_hash (md5 hex prefix, 60 bits)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def host_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    return rest.split("/", 1)[0].lower()


def path_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    return "/" + rest.split("/", 1)[1] if "/" in rest else "/"


def is_malformed(url, type_) -> bool:
    """F3 pre-filter (lib/crawler.js:563-576 routes these to deadletter)."""
    return not url or not type_ or not _URL_RE.match(url)


def is_transient_fail(url: str, attempt: int) -> bool:
    """Secondary-throttle analog: recovers at attempt 2, benches the host
    when bench_on_throttle is set."""
    return stable_hash(url) % 11 == 3 and attempt < 2


def is_permanent_fail(url: str) -> bool:
    """Bailed analog: requeues until max_attempts → deadletter."""
    return stable_hash(url) % 23 == 5


def fails_fetch(url: str, attempt: int) -> bool:
    return is_permanent_fail(url) or is_transient_fail(url, attempt)


def fetch_source(policy_fetch: str, type_: str, stored: bool) -> str:
    """Python twin of plans/policy.fetch_source (traversalPolicy.js:205-223)."""
    immutable = type_ in IMMUTABLE_TYPES
    if policy_fetch == "storageOnly":
        return "storage" if stored else "skip"
    if policy_fetch == "originOnly":
        return "origin"
    if policy_fetch == "storageOriginIfMissing":
        return "storage" if stored else "origin"
    # mutables / originStorage (default)
    if stored and immutable:
        return "storage"
    if stored:
        return "etag" if policy_fetch in ("mutables", "originStorage") else "origin"
    return "origin"


def should_process(
    freshness: str,
    content_from_origin: bool,
    stored_version: int,
    current_version: int,
    age_rounds: int,
) -> bool:
    """Python twin of plans/policy.should_process (traversalPolicy.js:170-188).
    Callers guarantee the document IS stored (unstored docs always process)."""
    if freshness == "always":
        return True
    if freshness == "match":
        return content_from_origin
    if freshness == "version":
        return stored_version < current_version
    if freshness == "matchOrVersion":
        return content_from_origin or stored_version < current_version
    return age_rounds > int(freshness)  # numeric: N rounds as the day analog


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
    processor_version: int = 1
    compute_costs: dict | None = None  # type -> integer cost (None = all 1)
    trait_budgets: dict | None = None  # trait -> per-round cap (None = off)
    type_traits: dict | None = None  # type -> trait (default: the type)
    bench_on_throttle: bool = False
    bench_rounds: int = 2
    # webhook authenticity gate (routes/webhook.js:15-24): when set, events
    # must carry sig == HMAC-SHA1(secret, url|type); mismatches deadletter
    # with reason 'unverified'
    webhook_secret: str | None = None
    # measured compute-cost mode (computeLimiter.js:44-77): politeness still
    # PREALLOCATES static costs, but the bucket spend (step 9) charges
    # observed elapsed minus the running-min baseline, refreshed per round
    measured_costs: bool = False
    # collection types whose traversal fans out pages 2..last to 'soon'
    # (githubProcessor.js:58-79 collection(); None = no pagination)
    paginate_types: tuple | None = None
    # F7 event timeline visibility (githubProcessor.js:460-478): event type
    # -> visible actions ([] = never visible; absent type = always visible)
    event_visibility: dict | None = None
    # NAMED scenario maps (visitorMap.js:366-390 mapList): {scenario:
    # {parent_type: {edge: child_type | (child_type, link_type)}}}. A row's
    # map_name selects the cut; rows naming an unknown scenario traverse
    # nothing. None falls back to the flat visitor_map (scenario 'default').
    scenario_maps: dict | None = None
    # v5 (module doc): 404-class rows straight to deadletter
    # (lib/crawler.js:528-533)
    exclude_not_found: bool = False
    # v5: permanent failures get ONE elevated retry then deadletter 'Bailed'
    # (githubFetcher.js:67-72)
    bailed_retry: bool = False
    # v5: deletion-event tombstone flow (lib/crawler.js:375,433-434)
    tombstones: bool = False
    # v5: graph-derived crawl priority (the OPIC/PageRank idea the static
    # tier weights approximate; SURVEY g1 wired into the engine): each
    # host's politeness prefix is ordered by (link-graph rank DESC,
    # enqueue_seq) instead of pure FIFO. Rank = integer fixed-point
    # PageRank over the link table (pagerank_fixed_point_py == the engine's
    # operators/graph recurrence, bit-exact). The input graph here is
    # static, so one computation is exact; a live crawl with growing link
    # discovery would recompute every k rounds over the accumulated table.
    rank_priority: bool = False
    rank_iters: int = 3


def webhook_signature(secret: str, url: str, type_: str) -> str:
    """Python twin of streaming.event_source.hmac_sha1_hex over url|type."""
    return _hmac.new(
        secret.encode(), f"{url}|{type_}".encode(), hashlib.sha1
    ).hexdigest()


PAGINATE_MAX_LAST = 4


def synthetic_last_page(url: str) -> int:
    """Deterministic link-header twin (githubProcessor.js:58-66 parses the
    response's `link` header for `last.page`; the graft derives it from the
    url): 1..PAGINATE_MAX_LAST."""
    return 1 + stable_hash("pages:" + url) % PAGINATE_MAX_LAST


def page_url(url: str, page: int) -> str:
    """Reference page-url form (githubProcessor.js:64-66)."""
    sep = "&" if "?" in url else "?"
    return f"{url}{sep}page={page}&per_page=100"


def synthetic_elapsed(url: str, static_cost: int) -> int:
    """Deterministic 'observed elapsed' for measured-cost mode: a fixed
    overhead (which the running-min baseline learns to subtract,
    computeLimiter.js:44-60) + work proportional to the static cost +
    per-url jitter."""
    return 20 + static_cost * 10 + stable_hash(url) % 7


def pagerank_fixed_point_py(
    edges, n_iter: int = 3, damping_pct: int = 85, scale: int = 10**12
) -> dict:
    """Pure-Python twin of operators/graph.pagerank_fixed_point — the SAME
    integer fixed-point recurrence (all integral, order-free sums), so the
    simulator's rank-driven priorities are bit-exact against the engine's.
    ``edges``: iterable of (src, dst)."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    if n == 0:
        return {}
    d = damping_pct
    rank0 = scale // n
    base = ((100 - d) * (rank0 * n)) // (100 * n)
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {v: rank0 for v in nodes}
    for _ in range(n_iter):
        shares = {
            v: (ranks[v] * d) // (100 * outdeg[v]) for v in nodes if v in outdeg
        }
        dang = sum((ranks[v] * d) // 100 for v in nodes if v not in outdeg)
        inflow: dict = {}
        for s, dst in edges:
            if s in shares:
                inflow[dst] = inflow.get(dst, 0) + shares[s]
        ranks = {v: base + dang // n + inflow.get(v, 0) for v in nodes}
    return ranks


def root_qualifier(url: str) -> str:
    """Seed/event rows anchor the URN chain at the host entity
    (lib/request.js:106-117: a root request's qualifier is its own URN)."""
    return f"urn:host:{host_of(url)}"


def _edge_entry(value):
    """Python twin of plans.policy._edge_entry: value → (child_type, link_type)."""
    if isinstance(value, (tuple, list)):
        return str(value[0]), str(value[1])
    return str(value), "collection"


def doc_links(urn: str, parent_urn: str, type_: str, map_name: str,
              maps: dict | None) -> list[dict]:
    """Python twin of plans.policy.doc_links_col — the stored doc's typed
    links envelope (lib/request.js:119-140): self + siblings + the map
    cut's declared edges; relation hrefs carry the deterministic page-set
    guid (githubProcessor.js:1005-1020)."""
    links = [
        {"name": "self", "href": urn, "type": "resource"},
        {"name": "siblings", "href": f"{parent_urn}:{type_}s",
         "type": "collection"},
    ]
    if maps:
        for edge, v in (maps.get(map_name) or {}).get(type_, {}).items():
            _ctype, ltype = _edge_entry(v)
            if ltype == "relation":
                href = f"{urn}:{edge}:pages:{stable_hash(urn + '|' + edge)}"
            else:
                href = f"{urn}:{edge}"
            links.append({"name": edge, "href": href, "type": ltype})
    return links


def row_urn(qualifier: str, type_: str, url: str) -> str:
    """A row's own URN: qualifier + ':' + type + ':' + id, with the id the
    stable url hash (the graft's deterministic entity id — colon-free,
    unlike the raw url). Children inherit this as THEIR qualifier
    (createQualifiedUrn, lib/request.js:113-117)."""
    return f"{qualifier}:{type_}:{stable_hash(url)}"


@dataclass
class FrontierRow:
    url: str
    type: str
    tier: str
    host: str
    enqueue_seq: int
    attempt: int = 0
    policy_fetch: str = "originStorage"
    policy_freshness: str = "match"
    map_path: str = "/"
    history: tuple = ()
    payload_id: str | None = None
    qualifier: str = ""
    map_name: str = "default"


class ReferenceSimulator:
    """Single-threaded oracle. corpus: {image_url: image_id};
    links: {src_url: [(edge, dst_url, dst_type)]} (sorted lists)."""

    def __init__(self, corpus: dict, links: dict, cfg: SimConfig):
        self.corpus = corpus
        self.links = links
        self.cfg = cfg
        self.frontier: list[FrontierRow] = []
        self.seen: set[str] = set()
        self.stored: dict[str, tuple[int, int]] = {}  # url -> (round, version)
        self.tombstones: dict[str, int] = {}  # url -> deletion round (v5)
        self.levels: dict[str, int] = {}
        self.bench_until: dict[str, int] = {}
        self.order_log: list[dict] = []
        self.deadletter: list[dict] = []
        self.excluded: list[dict] = []
        self.docs: list[dict] = []
        self.metrics: list[dict] = []
        self.pending_events: list[dict] = []
        self.next_seq = 0
        self.round = 0
        self.cost_baseline: int | None = None  # running min observed elapsed
        self._ranks: dict | None = None  # v5 rank_priority cache
        self._seeded = False  # update_config round-bump gate (engine twin)

    def update_config(self, **patch) -> None:
        """Twin of CrawlEngine.update_config (routes/config.js:12-18 PATCH
        /config): patch per-round options between rounds. The engine
        journals each patch as its own snapshot commit, which OCCUPIES a
        round number in its versioning (as every admin commit there does);
        the twin bumps its round counter to match, so round-stamped state —
        order-log round column, freshness ages, bench windows — stays
        aligned. Pre-seed patches don't commit on the engine side either."""
        self.cfg = replace(self.cfg, **patch)
        if self._seeded:
            self.round += 1

    def _rank(self, url: str) -> int:
        if self._ranks is None:
            self._ranks = pagerank_fixed_point_py(
                [
                    (src, dst)
                    for src, lst in self.links.items()
                    for _, dst, _ in lst
                ],
                n_iter=self.cfg.rank_iters,
            )
        return self._ranks.get(url, 0)

    def _denied(self, url: str) -> bool:
        host = host_of(url)
        return any(path_of(url).startswith(p) for p in self.cfg.robots_deny.get(host, ()))

    def _cost(self, type_: str) -> int:
        if self.cfg.compute_costs is None:
            return 1
        return int(self.cfg.compute_costs.get(type_, 1))

    def _trait(self, type_: str) -> str:
        return (self.cfg.type_traits or {}).get(type_, type_)

    def _resolved_request(self, s: dict, tier_default: str = "normal") -> dict:
        """Resolve one request spec to its effective attribute tuple —
        the ONE place intake precedence lives (explicit truthy column >
        policy SPEC > graft default; the reference treats '' like absent,
        js-falsy; unknown policy/tier values fall through to the default
        like unknown policy NAMES do in traversalPolicy.getPolicy — the
        engine's _resolve_request_rows applies the same domain checks).
        Shared by the sort key and the seed/queue loop bodies so they can
        never drift. Raises at once on a non-string policy — sorted()
        evaluates keys before any state mutates, so bad input fails fast
        instead of mid-iteration."""
        from ghcrawler_spark.plans.policy import (
            FETCH_POLICIES,
            FRESHNESS_POLICIES,
        )

        if s.get("policy"):
            from ghcrawler_spark.plans.policy import resolve_policy

            r_fetch, r_fresh, r_scen, _r_map, r_path = resolve_policy(
                s["policy"]
            )
        else:
            r_fetch, r_fresh, r_scen, r_path = (
                "originStorage", "match", "default", "/",
            )

        def _intish(v) -> bool:
            try:
                int(v)
                return True
            except (TypeError, ValueError):
                return False

        tier = s.get("tier")
        fetch = s.get("policy_fetch")
        fresh = s.get("policy_freshness")
        return {
            "tier": (tier if tier in self.cfg.tier_weights else None)
            or tier_default,
            "policy_fetch": (fetch if fetch in FETCH_POLICIES else None)
            or r_fetch,
            "policy_freshness": (
                fresh
                if fresh in FRESHNESS_POLICIES or _intish(fresh)
                else None
            )
            or r_fresh,
            "map_path": s.get("map_path") or r_path,
            "map_name": s.get("map_name") or r_scen,
        }

    def _request_sort_key(self, s: dict, tier_default: str = "normal") -> tuple:
        """Deterministic intake order: url first, then the RESOLVED
        attribute tuple in the exact column order of the engine's
        intra-batch dedup window (round_engine._dedupe_batch_urls), so when
        a batch repeats a url both twins keep the SAME winner — the
        reference's tracked push tags on first push and bounces later
        copies (redisRequestTracker.js:21-27)."""
        r = self._resolved_request(s, tier_default)
        return (
            s.get("url") or "",
            s.get("type") or "",
            r["tier"],
            r["policy_fetch"],
            r["policy_freshness"],
            r["map_path"],
            r["map_name"],
        )

    def seed(self, seeds: list[dict]) -> None:
        self._seeded = True
        queued_urls: set[str] = set()
        for s in sorted(seeds, key=self._request_sort_key):
            if is_malformed(s.get("url"), s.get("type")):
                self.deadletter.append(
                    {"url": s.get("url") or "", "type": s.get("type") or "",
                     "tier": s.get("tier") or "", "round": 0, "attempt": 0,
                     "reason": "malformed"}
                )
                continue
            if self._denied(s["url"]):
                self.excluded.append({"url": s["url"], "round": 0})
                continue
            if s["url"] in queued_urls:
                continue  # duplicate in the seed batch: first push wins
            queued_urls.add(s["url"])
            self.next_seq += 1
            # optional policy SPEC string (traversalPolicy.js:97-106):
            # "name[:scenario/map@path]" resolves to the named policy's
            # (fetch, freshness) + scenario cut; explicit truthy columns win
            # (_resolved_request — the same precedence the sort key used)
            r = self._resolved_request(s)
            self.frontier.append(
                FrontierRow(
                    url=s["url"], type=s["type"], tier=r["tier"],
                    host=host_of(s["url"]), enqueue_seq=self.next_seq,
                    policy_fetch=r["policy_fetch"],
                    policy_freshness=r["policy_freshness"],
                    map_path=r["map_path"],
                    qualifier=root_qualifier(s["url"]),
                    map_name=r["map_name"],
                )
            )

    def queue_requests(self, specs: list[dict], tier: str = "normal") -> dict:
        """Twin of CrawlEngine.queue_requests (routes/requests.js:23-28
        POST /requests/:queue): push new requests into a named tier
        mid-crawl — seed()'s intake funnel (policy specs, malformed →
        deadletter, robots → excluded) plus the tracker's in-flight dedup;
        urls already in the frontier bounce. The engine journals the push
        as its own snapshot commit, so the twin bumps its round counter to
        match (the deadletter/excluded stamps use the bumped round)."""
        if self._seeded:
            self.round += 1
        inflight = {r.url for r in self.frontier}
        queued = malformed = denied = bounced = 0
        for s in sorted(specs, key=lambda x: self._request_sort_key(x, tier)):
            if is_malformed(s.get("url"), s.get("type")):
                self.deadletter.append(
                    {"url": s.get("url") or "", "type": s.get("type") or "",
                     "tier": s.get("tier") or tier, "round": self.round,
                     "attempt": 0, "reason": "malformed"}
                )
                malformed += 1
                continue
            if self._denied(s["url"]):
                self.excluded.append({"url": s["url"], "round": self.round})
                denied += 1
                continue
            if s["url"] in inflight:
                bounced += 1
                continue
            r = self._resolved_request(s, tier)
            self.next_seq += 1
            self.frontier.append(
                FrontierRow(
                    url=s["url"], type=s["type"], tier=r["tier"],
                    host=host_of(s["url"]), enqueue_seq=self.next_seq,
                    policy_fetch=r["policy_fetch"],
                    policy_freshness=r["policy_freshness"],
                    map_path=r["map_path"],
                    qualifier=root_qualifier(s["url"]),
                    map_name=r["map_name"],
                )
            )
            queued += 1
            # the tracked push tags the url NOW: a later copy of the same
            # url in this batch bounces, matching the engine's intra-batch
            # dedup (first-wins counts into 'bounced')
            inflight.add(s["url"])
        return {"queued": queued, "malformed": malformed, "denied": denied,
                "bounced": bounced}

    def inject_events(self, events: list[dict]) -> None:
        """Stage webhook-style events; absorbed at the next round start.
        Each: {url, type, event_ms, payload_id?}."""
        self.pending_events.extend(events)

    def _absorb_events(self) -> int:
        if not self.pending_events:
            return 0
        pf, fresh, mp = EVENT_POLICY
        events = sorted(
            self.pending_events,
            key=lambda x: (x.get("event_ms", 0), x.get("url") or "", x.get("type") or ""),
        )
        self.pending_events = []
        inflight = {r.url for r in self.frontier}
        valid: dict[str, dict] = {}
        for e in events:
            if self.cfg.webhook_secret is not None:
                u, t = e.get("url"), e.get("type")
                ok = (
                    u is not None
                    and t is not None
                    and e.get("sig")
                    == webhook_signature(self.cfg.webhook_secret, u, t)
                )
                if not ok:
                    self.deadletter.append(
                        {"url": u or "", "type": t or "", "tier": "events",
                         "round": self.round, "attempt": 0,
                         "reason": "unverified"}
                    )
                    continue
            if self.cfg.tombstones and e.get("action") == "deleted":
                # v5 DELETION DIRECTIVE (module doc): tombstone, never
                # enqueue. cacheKey-addressed (no url, payload_id names the
                # stored doc id) resolves via the LATEST doc with that id.
                u = e.get("url")
                if not u and e.get("payload_id"):
                    # latest doc with that id: max (round, url) — the same
                    # deterministic rule the engine's groupBy-max implements
                    cands = [
                        (d["round"], d["url"])
                        for d in self.docs
                        if d["image_id"] == e["payload_id"]
                    ]
                    u = max(cands)[1] if cands else None
                    if u is None:
                        continue  # unknown cache key: nothing to delete
                if not u or not _URL_RE.match(u):
                    self.deadletter.append(
                        {"url": e.get("url") or "", "type": e.get("type") or "",
                         "tier": "events", "round": self.round, "attempt": 0,
                         "reason": "malformed"}
                    )
                    continue
                self.tombstones[u] = self.round
                continue
            if is_malformed(e.get("url"), e.get("type")):
                self.deadletter.append(
                    {"url": e.get("url") or "", "type": e.get("type") or "",
                     "tier": "events", "round": self.round, "attempt": 0,
                     "reason": "malformed"}
                )
                continue
            if self.cfg.event_visibility is not None:
                from ghcrawler_spark.plans.policy import event_visible

                # F7 (githubProcessor.js:460-478): events not visible in
                # the timeline are simply not queued — dropped BEFORE the
                # first-wins dedup so an invisible event can never mask a
                # visible one for the same url
                if not event_visible(
                    e["type"], e.get("action"), self.cfg.event_visibility
                ):
                    continue
            if e["url"] not in valid:
                valid[e["url"]] = e  # first occurrence per url wins (J4)
        absorbed = 0
        for u in sorted(valid):  # enqueue_seq assigned in url order
            e = valid[u]
            if self._denied(u):
                self.excluded.append({"url": u, "round": self.round})
                continue
            if u in inflight:
                continue  # in-flight dedup; freshness 'always' ignores seen
            self.next_seq += 1
            self.frontier.append(
                FrontierRow(
                    url=u, type=e["type"],
                    # v5 streaming unification: limiter-throttled events
                    # enter 'later' (weight 2), not 'events' (weight 10)
                    tier="later" if e.get("throttled") else "events",
                    host=host_of(u),
                    enqueue_seq=self.next_seq, policy_fetch=pf,
                    policy_freshness=fresh, map_path=mp,
                    payload_id=e.get("payload_id"),
                    qualifier=root_qualifier(u),
                )
            )
            absorbed += 1
        return absorbed

    def run_round(self) -> bool:
        """One round; returns False when the frontier was empty (done)."""
        if not self.frontier and not self.pending_events:
            return False
        self.round += 1
        cfg = self.cfg

        # 0. event ingest
        n_ingested = self._absorb_events()

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

        # 3. politeness: benched hosts withheld; cumulative-cost budget
        by_host: dict[str, list[FrontierRow]] = {}
        for r in sorted(self.frontier, key=lambda x: x.enqueue_seq):
            by_host.setdefault(r.host, []).append(r)
        polite: list[FrontierRow] = []
        n_deferred = 0
        for h, rows in by_host.items():
            if self.bench_until.get(h, 0) >= self.round:
                n_deferred += len(rows)  # withheld: host benched (Deferred)
                continue
            if cfg.rank_priority:
                # v5: the politeness prefix favors graph-important urls
                # (rank DESC), FIFO within equal rank
                rows = sorted(
                    rows, key=lambda x: (-self._rank(x.url), x.enqueue_seq)
                )
            budget = max(self.levels[h], 0)
            spent = 0
            for r in rows:
                spent += self._cost(r.type)
                if spent > budget:
                    break
                polite.append(r)

        # 3b. trait caps
        if cfg.trait_budgets is not None:
            by_trait: dict[str, int] = {}
            capped = []
            for r in sorted(polite, key=lambda x: x.enqueue_seq):
                t = self._trait(r.type)
                n = by_trait.get(t, 0) + 1
                if n <= cfg.trait_budgets.get(t, 10**9):
                    capped.append(r)
                    by_trait[t] = n
            polite = capped

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

        # 5-6. fetch + outcomes (ROUND SPEC v2 decision table; v5 adds the
        # Deleted short-circuit, Bailed, and excludeNotFound lanes)
        requeued: list[FrontierRow] = []
        traversed: list[tuple[int, FrontierRow]] = []
        throttled_hosts: set[str] = set()
        new_docs: list[tuple[str, str]] = []  # (url, image_id) upserts
        n_dl_extra = 0  # v5: Bailed + excludeNotFound deadletters this round
        for pop_seq, r in enumerate(selected, start=1):
            stored = r.url in self.stored
            fsrc = fetch_source(r.policy_fetch, r.type, stored)
            # v5: a url is DELETED while its tombstone is at least as new as
            # its latest stored doc; non-origin fetch sources short-circuit
            # (crawler.js:375 checks _metadata.deletedAt before processing)
            deleted_now = (
                cfg.tombstones
                and r.url in self.tombstones
                and (
                    not stored
                    or self.stored[r.url][0] <= self.tombstones[r.url]
                )
            )
            if r.payload_id is not None:
                # an event-carried payload is fresh content — it RESURRECTS
                # a tombstoned url (the doc upsert outdates the tombstone)
                outcome = "Processed"
                new_docs.append((r, r.payload_id))
                self.seen.add(r.url)
            elif deleted_now:
                # storage/etag/skip sources short-circuit on the tombstone
                # (crawler.js:375); an origin contact finds the entity GONE
                # at origin (the deletion event said so) → Missing. Either
                # way the row completes with no doc and NO TRAVERSAL — the
                # deleted subtree is never re-queued (crawler.js:433-434).
                if fsrc != "origin":
                    outcome = "Deleted"
                else:
                    outcome = "Missing"
                    if cfg.exclude_not_found:
                        self.deadletter.append(
                            {"url": r.url, "type": r.type, "tier": r.tier,
                             "round": self.round, "attempt": r.attempt,
                             "reason": "excludeNotFound"}
                        )
                        n_dl_extra += 1
                self.seen.add(r.url)
            elif (
                cfg.inject_failures
                and fsrc in ("origin", "etag")
                and fails_fetch(r.url, r.attempt)
            ):
                # taxonomy (crawler.js:509-519): throttle-class transient
                # failures log 'Throttled' (markRequeue('Throttled'),
                # githubFetcher.js:176-192); permanent-fail retries stay
                # 'Requeued'. Both re-enter at the tail identically — except
                # under v5 bailed_retry, where a permanent failure past its
                # single elevated retry deadletters as 'Bailed'
                # (githubFetcher.js:67-72 markDead('Bailed')).
                if is_transient_fail(r.url, r.attempt):
                    outcome = "Throttled"
                    throttled_hosts.add(r.host)
                    r.attempt += 1
                    requeued.append(r)
                elif cfg.bailed_retry and r.attempt >= 1:
                    outcome = "Bailed"
                    self.seen.add(r.url)
                    self.deadletter.append(
                        {"url": r.url, "type": r.type, "tier": r.tier,
                         "round": self.round, "attempt": r.attempt,
                         "reason": "Bailed"}
                    )
                    n_dl_extra += 1
                else:
                    outcome = "Requeued"
                    r.attempt += 1
                    requeued.append(r)
            elif fsrc == "skip":
                outcome = "Skipped"
                self.seen.add(r.url)
            elif r.type != "image":
                outcome = "Traversed"
                self.seen.add(r.url)
                traversed.append((pop_seq, r))
            else:
                if fsrc == "origin" and r.url not in self.corpus:
                    outcome = "Missing"
                    if cfg.exclude_not_found:
                        # v5 (crawler.js:528-533): straight to deadletter,
                        # no attempt loop; the row still completes (seen)
                        self.deadletter.append(
                            {"url": r.url, "type": r.type, "tier": r.tier,
                             "round": self.round, "attempt": r.attempt,
                             "reason": "excludeNotFound"}
                        )
                        n_dl_extra += 1
                else:
                    # storage/etag arrive unchanged (static corpus → 304)
                    from_origin = fsrc == "origin"
                    if not stored:
                        process = True
                    else:
                        srnd, sver = self.stored[r.url]
                        process = should_process(
                            r.policy_freshness, from_origin, sver,
                            cfg.processor_version, self.round - srnd,
                        )
                    if process:
                        outcome = "Processed"
                        image_id = self.corpus.get(r.url)
                        if image_id is None and stored:
                            image_id = f"stored:{r.url}"
                        new_docs.append((r, image_id))
                    else:
                        outcome = "Unchanged"
                self.seen.add(r.url)
            self.order_log.append(
                {"seq": len(self.order_log) + 1, "round": self.round,
                 "pop_seq": pop_seq, "url": r.url, "type": r.type,
                 "tier": r.tier, "host": r.host, "outcome": outcome}
            )
        doc_maps = cfg.scenario_maps
        if doc_maps is None and cfg.visitor_map is not None:
            doc_maps = {"default": cfg.visitor_map}
        for r, image_id in new_docs:
            self.stored[r.url] = (self.round, cfg.processor_version)
            urn = row_urn(r.qualifier, r.type, r.url)
            self.docs.append(
                {"image_id": image_id, "url": r.url, "round": self.round,
                 "version": cfg.processor_version,
                 "urn": urn, "parent_urn": r.qualifier,
                 "links": doc_links(urn, r.qualifier, r.type, r.map_name,
                                    doc_maps)}
            )

        # 9. bucket spend (compute cost per popped row) + benching.
        # Measured mode (computeLimiter.js:44-77): charge observed elapsed
        # minus last round's running-min baseline (preallocation = the
        # static cost — used while no baseline exists yet); refresh the
        # baseline AFTER the spend from this round's observations.
        if cfg.measured_costs:
            observed = []
            for r in selected:
                el = synthetic_elapsed(r.url, self._cost(r.type))
                observed.append(el)
                if self.cost_baseline is None:
                    charge = self._cost(r.type)
                else:
                    charge = max(1, el - self.cost_baseline)
                self.levels[r.host] -= charge
            if observed:
                mn = min(observed)
                self.cost_baseline = (
                    mn if self.cost_baseline is None else min(self.cost_baseline, mn)
                )
        else:
            for r in selected:
                self.levels[r.host] -= self._cost(r.type)
        if cfg.bench_on_throttle:
            for h in throttled_hosts:
                self.bench_until[h] = self.round + cfg.bench_rounds

        # 7. children (requeued rows are still in-flight → count as frontier)
        frontier_urls = {r.url for r in self.frontier} | {r.url for r in requeued}
        best: dict[str, tuple] = {}  # dst_url -> (parent_pop, edge, dst, dst_type, parent)
        dup_count: dict[str, int] = {}  # dst_url -> visible candidate edges
        for pop_seq, parent in traversed:
            parent_key = f"{parent.type}@{parent.url}"
            blocked = set(parent.history) | {parent_key}
            vm_maps = cfg.scenario_maps
            if vm_maps is None and cfg.visitor_map is not None:
                vm_maps = {"default": cfg.visitor_map}
            for edge, dst, dst_type in self.links.get(parent.url, ()):
                if vm_maps is not None and edge not in vm_maps.get(
                    parent.map_name, {}
                ).get(parent.type, {}):
                    continue
                if f"{dst_type}@{dst}" in blocked:
                    continue  # per-traversal hasSeen (U2)
                dup_count[dst] = dup_count.get(dst, 0) + 1
                key = (pop_seq, edge, dst)
                if dst not in best or key < best[dst][:3]:
                    best[dst] = (pop_seq, edge, dst, dst_type, parent, False)
            # pagination fan-out (githubProcessor.js:58-79): a collection
            # type's pages 2..last queue alongside its element edges — same
            # attenuation / in-flight / seen / robots funnel, pseudo-edge
            # '_pages', but the page inherits the SAME context (qualifier +
            # map path — the page is an implementation detail, not a
            # traversal step)
            if (
                cfg.paginate_types
                and parent.type in cfg.paginate_types
                and "per_page=" not in parent.url  # a page never re-paginates
            ):
                for i in range(2, synthetic_last_page(parent.url) + 1):
                    dst = page_url(parent.url, i)
                    if f"{parent.type}@{dst}" in blocked:
                        continue
                    dup_count[dst] = dup_count.get(dst, 0) + 1
                    key = (pop_seq, "_pages", dst)
                    if dst not in best or key < best[dst][:3]:
                        best[dst] = (pop_seq, "_pages", dst, parent.type,
                                     parent, True)
        children = []
        n_bounced = 0
        for dst, (ppop, edge, _, dst_type, parent, _pg) in best.items():
            # v5 pinned order: seen-dedup FIRST, then the in-flight check —
            # so `bounced` counts exactly the tracker-bounced pushes
            # (redisRequestTracker.js:27): candidates the dedup cache let
            # through that an in-flight request then rejected (J5)
            if dst in self.seen and parent.policy_freshness != "always":
                continue
            if dst in frontier_urls:
                n_bounced += 1
                continue
            if self._denied(dst):
                self.excluded.append({"url": dst, "round": self.round})
                continue
            children.append((ppop, dst, edge, dst_type, parent))
        children.sort(key=lambda x: (x[0], x[1]))
        for ppop, dst, edge, dst_type, parent in children:
            self.next_seq += 1
            is_page = edge == "_pages"
            mp = parent.map_path
            next_mp = mp if is_page else (f"/{edge}" if mp == "/" else f"{mp}/{edge}")
            self.frontier.append(
                FrontierRow(
                    url=dst, type=dst_type,
                    tier="soon" if is_page or edge == "images" else "normal",
                    host=host_of(dst), enqueue_seq=self.next_seq,
                    policy_fetch=parent.policy_fetch,
                    policy_freshness=parent.policy_freshness,
                    map_path=next_mp,
                    history=tuple(parent.history) + (f"{parent.type}@{parent.url}",),
                    qualifier=(
                        parent.qualifier
                        if is_page
                        else row_urn(parent.qualifier, parent.type, parent.url)
                    ),
                    map_name=parent.map_name,
                )
            )

        # 8. requeues re-enter at the tail
        for r in requeued:
            self.next_seq += 1
            r.enqueue_seq = self.next_seq
            self.frontier.append(r)

        n_attenuated = sum(
            dup_count.get(dst, 1) - 1 for _, dst, _, _, _ in children
        )
        self.metrics.append(
            {"round": self.round, "selected": len(selected),
             "children": len(children), "requeued": len(requeued),
             "deadlettered": len(dead) + n_dl_extra,
             "frontier_after": len(self.frontier),
             "ingested": n_ingested, "attenuated": n_attenuated,
             "deferred": n_deferred, "bounced": n_bounced}
        )
        return True

    def run(self) -> None:
        while self.round < self.cfg.max_rounds and self.run_round():
            pass
