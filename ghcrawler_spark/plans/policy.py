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


@dataclass(frozen=True)
class PolicySpec:
    name: str
    map_name: str
    path: str

    @staticmethod
    def parse(spec: str) -> "PolicySpec":
        """``"default:crawl@/pages"`` → PolicySpec (request.js:30-37 form)."""
        name, rest = spec.split(":", 1) if ":" in spec else ("default", spec)
        map_name, path = rest.split("@", 1) if "@" in rest else (rest, "/")
        return PolicySpec(name=name, map_name=map_name, path=path or "/")

    def render(self) -> str:
        return f"{self.name}:{self.map_name}@{self.path}"


def next_map_path(map_path: Column | str, edge: Column | str) -> Column:
    """getNextPolicy's path descent: '/' + edge appended (one map step)."""
    p = F.col(map_path) if isinstance(map_path, str) else map_path
    e = F.col(edge) if isinstance(edge, str) else edge
    return F.when(p == "/", F.concat(F.lit("/"), e)).otherwise(
        F.concat(p, F.lit("/"), e)
    )


def visitor_map_df(spark: SparkSession, vmap: dict | None = None) -> DataFrame:
    """(parent_type, edge, child_type) broadcast table."""
    vmap = vmap or DEFAULT_VISITOR_MAP
    rows = [
        (ptype, edge, ctype)
        for ptype, edges in vmap.items()
        for edge, ctype in edges.items()
    ]
    return spark.createDataFrame(
        rows or [("_none_", "_never_", "_none_")],
        "parent_type string, edge string, child_type string",
    )


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
        .when(
            p == "mutables",
            F.when(stored & immutable, "storage")
            .when(stored, "etag")
            .otherwise("origin"),
        )
        # originStorage: immutable + stored → storage; else conditional etag
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
        .otherwise(processed_age_days > p.cast("int"))
    )
