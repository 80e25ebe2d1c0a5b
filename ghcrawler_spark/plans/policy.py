"""Traversal policy — ghcrawler's TraversalPolicy + VisitorMap re-expressed.

Reference semantics (lib/traversalPolicy.js, lib/visitorMap.js):
- a policy is (fetch, freshness, map@path); the spec string form is
  ``"name:mapName@/path"`` (traversalPolicy.js:97-106, request.js:30-37)
- ``getNextPolicy(edge)`` descends the map path one step
  (traversalPolicy.js:154-160)
- the visitor map decides which named edges exist per entity type
  (visitorMap.js:140-390); absent edges are simply not traversed
- fetch-source resolution: policy + mutability → storage | etag | origin
  (traversalPolicy.js:205-223; immutable set :198-200)
- freshness: always / match / version / matchOrVersion / N-days
  (traversalPolicy.js:170-188)

Everything row-level is a Column expression (when-chains and string concat);
the visitor map itself is a tiny broadcast table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FETCH_POLICIES = (
    "storageOnly",
    "originStorage",
    "storageOriginIfMissing",
    "mutables",
    "originOnly",
)
FRESHNESS_POLICIES = ("always", "match", "version", "matchOrVersion")

# graft entity types; 'image' is immutable (content-addressed payload), the
# analog of the reference's immutable 'commit' type (traversalPolicy.js:198)
IMMUTABLE_TYPES = ("image",)

# default visitor map for the crawl graph (visitorMap.js:140-390 analog):
# type -> {edge -> child type}
DEFAULT_VISITOR_MAP: dict[str, dict[str, str]] = {
    "page": {"pages": "page", "images": "image"},
    "image": {},
}


# named policies (traversalPolicy.js:108-148): policy name → (fetch,
# freshness). `default`/`event`/`refresh` share the mutables/match pair; the
# reprocess family reads from storage with version-based freshness.
POLICY_NAMES: dict[str, tuple[str, str]] = {
    "default": ("mutables", "match"),
    "event": ("mutables", "match"),
    "refresh": ("mutables", "match"),
    "reload": ("originStorage", "match"),
    "reprocess": ("storageOnly", "version"),
    "reprocessAndDiscover": ("storageOriginIfMissing", "version"),
    "reprocessAndUpdate": ("mutables", "matchOrVersion"),
    "always": ("originOnly", "always"),
    "reprocessAlways": ("storageOnly", "always"),
}
# unknown policy names resolve to the graft's default pair (the reference
# dies Bogus, lib/request.js:53-60; a batch engine prefers a defined default)
DEFAULT_POLICY_PAIR = ("originStorage", "match")
DEFAULT_SCENARIO = "default"


@dataclass(frozen=True)
class PolicySpec:
    """Parsed ``<policyName>[:<[scenario/]mapName[@path]>]`` — the full
    reference spec-string grammar (traversalPolicy.js:90-106: a bare policy
    name picks the default scenario; ``default:self`` names a map;
    ``reprocess:relationOnly/crawl@/teams`` pins scenario+map+path)."""

    name: str
    map_name: str
    path: str
    scenario: str = DEFAULT_SCENARIO

    @staticmethod
    def parse(spec: str) -> "PolicySpec":
        name, rest = spec.split(":", 1) if ":" in spec else (spec, "")
        map_spec, path = rest.split("@", 1) if "@" in rest else (rest, "/")
        if "/" in map_spec:
            scenario, map_name = map_spec.split("/", 1)
        else:
            scenario, map_name = DEFAULT_SCENARIO, map_spec
        return PolicySpec(
            name=name or "default",
            map_name=map_name or "default",
            path=path or "/",
            scenario=scenario or DEFAULT_SCENARIO,
        )

    def fetch_freshness(self) -> tuple[str, str]:
        return POLICY_NAMES.get(self.name, DEFAULT_POLICY_PAIR)

    def render(self) -> str:
        return f"{self.name}:{self.scenario}/{self.map_name}@{self.path}"


def resolve_policy(spec: str) -> tuple[str, str, str, str, str]:
    """Python twin (simulator-side) of :func:`resolve_policy_cols`:
    spec string → (fetch, freshness, scenario, map_name, path)."""
    p = PolicySpec.parse(spec)
    fetch, fresh = p.fetch_freshness()
    return fetch, fresh, p.scenario, p.map_name, p.path


def resolve_policy_cols(spec: Column | str) -> Column:
    """Row-level spec resolution as ONE struct Column (seed lists are data,
    not config — 10^10 seed rows resolve distributed, codegen'd, never on
    the driver): struct(fetch, freshness, scenario, map_name, path).
    Same grammar as PolicySpec.parse; pinned equal by tests."""
    s = F.col(spec) if isinstance(spec, str) else spec

    def _split_first(col: Column, sep: str, default_rest: str):
        """(before-first-sep, after-first-sep | default_rest) as Columns."""
        pos = F.instr(col, sep)
        before = F.when(pos > 0, col.substr(F.lit(1), pos - 1)).otherwise(col)
        after = F.when(pos > 0, col.substr(pos + 1, F.length(col))).otherwise(
            F.lit(default_rest)
        )
        return before, after

    name, rest = _split_first(s, ":", "")
    map_spec, path = _split_first(rest, "@", "/")
    pos_slash = F.instr(map_spec, "/")
    scenario = F.when(
        pos_slash > 0, map_spec.substr(F.lit(1), pos_slash - 1)
    ).otherwise(F.lit(DEFAULT_SCENARIO))
    map_name = F.when(
        pos_slash > 0, map_spec.substr(pos_slash + 1, F.length(map_spec))
    ).otherwise(map_spec)
    name = F.when(name == "", "default").otherwise(name)
    pairs = [x for n, (fe, fr) in POLICY_NAMES.items() for x in (F.lit(n), F.lit(f"{fe}|{fr}"))]
    pair = F.coalesce(
        F.element_at(F.create_map(*pairs), name),
        F.lit("|".join(DEFAULT_POLICY_PAIR)),
    )
    return F.struct(
        F.substring_index(pair, "|", 1).alias("fetch"),
        F.substring_index(pair, "|", -1).alias("freshness"),
        F.when(scenario == "", DEFAULT_SCENARIO).otherwise(scenario).alias("scenario"),
        F.when(map_name == "", "default").otherwise(map_name).alias("map_name"),
        F.when(path == "", "/").otherwise(path).alias("path"),
    )


def next_map_path(map_path: Column | str, edge: Column | str) -> Column:
    """getNextPolicy's path descent: '/' + edge appended (one map step)."""
    p = F.col(map_path) if isinstance(map_path, str) else map_path
    e = F.col(edge) if isinstance(edge, str) else edge
    return F.when(p == "/", F.concat(F.lit("/"), e)).otherwise(
        F.concat(p, F.lit("/"), e)
    )


def _edge_entry(value) -> tuple[str, str]:
    """Map-entry value → (child_type, link_type). A bare string is a
    collection edge (the visitorMap.js default shape); a (child_type,
    link_type) pair pins resource/collection/relation explicitly
    (visitorMap.js self/collection/relation constructors)."""
    if isinstance(value, (tuple, list)):
        return str(value[0]), str(value[1])
    return str(value), "collection"


def visitor_map_df(spark: SparkSession, vmap: dict | None = None) -> DataFrame:
    """(parent_type, edge, child_type, link_type) broadcast table."""
    vmap = vmap or DEFAULT_VISITOR_MAP
    rows = [
        (ptype, edge, *_edge_entry(v))
        for ptype, edges in vmap.items()
        for edge, v in edges.items()
    ]
    return spark.createDataFrame(
        rows or [("_none_", "_never_", "_none_", "collection")],
        "parent_type string, edge string, child_type string, link_type string",
    )


def scenario_maps_df(spark: SparkSession, maps: dict) -> DataFrame:
    """(map_name, parent_type, edge, child_type, link_type) broadcast table
    for NAMED scenario maps (visitorMap.js:366-390 mapList: `initialize`,
    `default`, `relationOnly` cut the same entity graph differently). A
    frontier row's `map_name` selects which cut governs its traversal."""
    rows = [
        (scenario, ptype, edge, *_edge_entry(v))
        for scenario, vmap in maps.items()
        for ptype, edges in (vmap or {}).items()
        for edge, v in edges.items()
    ]
    return spark.createDataFrame(
        rows or [("_none_", "_none_", "_never_", "_none_", "collection")],
        "map_name string, parent_type string, edge string, child_type string, "
        "link_type string",
    )


LINKS_COL_TYPE = "array<struct<name:string,href:string,type:string>>"


def event_visible_col(
    type_col: Column, action_col: Column, visibility: dict | None
) -> Column:
    """F7 — event timeline visibility (githubProcessor.js:460-478
    _isEventVisibleInTimeline): ``visibility`` maps event type → the list of
    actions visible in the timeline. A type mapped to an empty list is never
    visible (the reference's deployment/label/status/… blanket block); a
    type absent from the table is always visible; a listed type shows only
    the listed actions (issues/pull_request: opened|closed|reopened;
    comment deletes hidden). Pure Column: driver-side dict folded into a
    literal create_map — no join, no UDF."""
    if not visibility:
        return F.lit(True)
    kv = []
    for t, actions in visibility.items():
        # empty action list → bare "|" sentinel (matches NO "|action|",
        # including the empty action — blanket-invisible type)
        packed = "|" + "|".join(sorted(actions)) + "|" if actions else "|"
        kv.extend([F.lit(t), F.lit(packed)])
    allowed = F.element_at(F.create_map(*kv), type_col)
    act = F.coalesce(action_col, F.lit(""))
    return allowed.isNull() | allowed.contains(F.concat(F.lit("|"), act, F.lit("|")))


def event_visible(type_: str, action: str | None, visibility: dict | None) -> bool:
    """Python twin of :func:`event_visible_col` (simulator-side)."""
    if not visibility or type_ not in visibility:
        return True
    return (action or "") in visibility[type_]


def link_guid(urn: Column, edge: Column) -> Column:
    """Deterministic page-set GUID for a relation link — the graft's
    replay-safe stand-in for the reference's uuid.v4 per relation state
    (githubProcessor.js:1005-1020: the guid brands every page of one
    coherent state of the relation)."""
    from ghcrawler_spark.hashing import stable_long_hash

    return stable_long_hash(F.concat(urn, F.lit("|"), edge)).cast("string")


def doc_links_col(
    urn: Column,
    parent_urn: Column,
    type_col: Column,
    map_name_col: Column,
    maps: dict | None,
) -> Column:
    """The stored document's typed `_metadata.links` envelope
    (lib/request.js:119-140) as a pure Column — array of (name, href, type):

    - ``self``: the doc's own URN, type ``resource`` (addSelfLink)
    - ``siblings``: parent URN + ':' + type + 's', type ``collection``
      (linkSiblings — the same-type collection under the parent)
    - one entry per edge the row's map cut declares for its type:
      ``resource``/``collection`` hrefs are urn:edge; ``relation`` hrefs
      carry the deterministic page-set guid (urn:edge:pages:guid,
      _addRelation, githubProcessor.js:1005-1020)

    The edge table comes from the DRIVER-side map config, folded into a
    literal create_map keyed by 'map_name|type' — no join, pure codegen.
    """
    base = F.array(
        F.struct(
            F.lit("self").alias("name"),
            urn.alias("href"),
            F.lit("resource").alias("type"),
        ),
        F.struct(
            F.lit("siblings").alias("name"),
            F.concat(parent_urn, F.lit(":"), type_col, F.lit("s")).alias("href"),
            F.lit("collection").alias("type"),
        ),
    )
    if not maps:
        return base
    kv = []
    for scen, vmap in maps.items():
        for ptype, edges in (vmap or {}).items():
            entries = [
                F.struct(
                    F.lit(edge).alias("name"), F.lit(_edge_entry(v)[1]).alias("ltype")
                )
                for edge, v in edges.items()
            ]
            if not entries:
                continue
            kv.extend([F.lit(f"{scen}|{ptype}"), F.array(*entries)])
    if not kv:
        return base
    declared = F.element_at(
        F.create_map(*kv), F.concat(map_name_col, F.lit("|"), type_col)
    )
    edge_links = F.transform(
        F.coalesce(declared, F.array().cast(
            "array<struct<name:string,ltype:string>>"
        )),
        lambda e: F.struct(
            e["name"].alias("name"),
            F.when(
                e["ltype"] == "relation",
                F.concat(
                    urn, F.lit(":"), e["name"], F.lit(":pages:"),
                    link_guid(urn, e["name"]),
                ),
            )
            .otherwise(F.concat(urn, F.lit(":"), e["name"]))
            .alias("href"),
            e["ltype"].alias("type"),
        ),
    )
    return F.concat(base, edge_links)


def fetch_source(
    policy_fetch: Column | str,
    type_col: Column | str,
    stored: Column,
) -> Column:
    """Policy + mutability + presence → 'storage' | 'etag' | 'origin' | 'skip'
    (traversalPolicy.js initialFetch :205-212 + shouldFetchMissing :217-223).

    stored: boolean Column — do we already hold a copy?
    """
    p = F.col(policy_fetch) if isinstance(policy_fetch, str) else policy_fetch
    t = F.col(type_col) if isinstance(type_col, str) else type_col
    immutable = t.isin(*IMMUTABLE_TYPES)
    return (
        F.when(p == "storageOnly", F.when(stored, "storage").otherwise("skip"))
        .when(p == "originOnly", F.lit("origin"))
        .when(
            p == "storageOriginIfMissing",
            F.when(stored, "storage").otherwise("origin"),
        )
        # originStorage AND mutables share one arm (identical decision
        # table: immutable + stored → storage; stored → conditional etag;
        # else origin). Intake validates policy_fetch against
        # FETCH_POLICIES, so no OTHER value can reach this otherwise — the
        # python twin (simulator.fetch_source) relies on that to stay
        # branch-for-branch equal.
        .otherwise(
            F.when(stored & immutable, "storage")
            .when(stored, "etag")
            .otherwise("origin")
        )
    )


def should_process(
    policy_freshness: Column | str,
    content_from_origin: Column,
    stored_version: Column,
    current_version: int,
    processed_age_days: Column,
) -> Column:
    """Freshness decision (traversalPolicy.js:170-188): process the document
    again? 'always' → yes; 'match' → only when content came from origin
    (i.e., changed); 'version' → stored version older than processor;
    'matchOrVersion' → either; numeric N (passed as string) → older than N
    days."""
    p = (
        F.col(policy_freshness)
        if isinstance(policy_freshness, str)
        else policy_freshness
    )
    version_stale = stored_version < F.lit(current_version)
    return (
        F.when(p == "always", F.lit(True))
        .when(p == "match", content_from_origin)
        .when(p == "version", version_stale)
        .when(p == "matchOrVersion", content_from_origin | version_stale)
        # numeric-N freshness; try_cast so a value that somehow bypassed
        # intake validation degrades to NULL (= don't reprocess) instead of
        # an ANSI cast error killing the round
        .otherwise(processed_age_days > p.try_cast("int"))
    )
