"""Traversal policy parity: spec parsing, map-path descent, fetch-source
resolution truth table (traversalPolicy.js:205-223), freshness decisions
(:170-188), and visitor-map-restricted traversal (engine == simulator)."""

from pyspark.sql import functions as F

from ghcrawler_spark import fixtures
from ghcrawler_spark.plans.policy import (
    PolicySpec,
    fetch_source,
    next_map_path,
    should_process,
    visitor_map_df,
)
from ghcrawler_spark.plans.round_engine import CrawlConfig, CrawlEngine
from ghcrawler_spark.simulator import ReferenceSimulator, SimConfig
from ghcrawler_spark.sources.snapshot import SnapshotStore


def test_policy_spec_roundtrip():
    s = PolicySpec.parse("reload:crawl@/pages/images")
    assert s == PolicySpec("reload", "crawl", "/pages/images")
    assert PolicySpec.parse(s.render()) == s
    assert PolicySpec.parse("crawl").path == "/"


def test_next_map_path(spark):
    df = spark.createDataFrame(
        [("/", "pages"), ("/pages", "images")], ["p", "e"]
    )
    got = {r["p"]: r["n"] for r in df.select("p", next_map_path("p", "e").alias("n")).collect()}
    assert got == {"/": "/pages", "/pages": "/pages/images"}


def test_fetch_source_truth_table(spark):
    rows = []
    for pol in ("storageOnly", "originOnly", "storageOriginIfMissing", "mutables", "originStorage"):
        for typ in ("image", "page"):
            for stored in (True, False):
                rows.append((pol, typ, stored))
    df = spark.createDataFrame(rows, "pol string, typ string, stored boolean")
    got = {
        (r["pol"], r["typ"], r["stored"]): r["src"]
        for r in df.select(
            "pol", "typ", "stored",
            fetch_source("pol", "typ", F.col("stored")).alias("src"),
        ).collect()
    }
    # storageOnly never goes to origin (traversalPolicy.js storageOnly)
    assert got[("storageOnly", "page", True)] == "storage"
    assert got[("storageOnly", "page", False)] == "skip"
    # originOnly always refetches
    assert got[("originOnly", "image", True)] == "origin"
    # immutable + stored → storage, no conditional GET (etag skip, :198-212)
    assert got[("originStorage", "image", True)] == "storage"
    # mutable + stored → conditional etag fetch
    assert got[("originStorage", "page", True)] == "etag"
    assert got[("originStorage", "page", False)] == "origin"
    assert got[("storageOriginIfMissing", "page", False)] == "origin"
    assert got[("mutables", "page", True)] == "etag"
    assert got[("mutables", "image", True)] == "storage"


def test_should_process_matrix(spark):
    df = spark.createDataFrame(
        [
            ("always", False, 13, 0),
            ("match", True, 13, 0),
            ("match", False, 13, 0),
            ("version", False, 12, 0),
            ("version", False, 13, 0),
            ("matchOrVersion", False, 12, 0),
            ("30", False, 13, 40),
            ("30", False, 13, 10),
        ],
        "pol string, origin boolean, ver int, age int",
    )
    got = [
        r["p"]
        for r in df.select(
            should_process("pol", F.col("origin"), F.col("ver"), 13, F.col("age")).alias("p")
        ).collect()
    ]
    assert got == [True, True, False, True, False, True, True, False]


def test_visitor_map_restricted_crawl_matches_sim(spark, tmp_path):
    """Restrict the map to page→images only (no page links): both engine and
    simulator must stop after the seeds' images — and match each other."""
    vmap = {"page": {"images": "image"}, "image": {}}
    fx = fixtures.generate(seed=13, n_hosts=3, n_seeds=2)

    corpus = dict(zip(fx.corpus["url"], fx.corpus["image_id"]))
    links = {}
    for row in fx.links.itertuples(index=False):
        links.setdefault(row.src_url, []).append((row.edge, row.dst_url, row.dst_type))
    for v in links.values():
        v.sort()
    sim = ReferenceSimulator(corpus, links, SimConfig(visitor_map=vmap))
    sim.seed(fx.seeds.to_dict("records"))
    sim.run()
    # restriction is real: no page other than the seeds is ever traversed
    assert all(r["type"] == "image" for r in sim.order_log if r["round"] > 1 and r["outcome"] == "Processed")
    assert not any(
        r["type"] == "page" and r["url"] not in set(fx.seeds["url"])
        for r in sim.order_log
    )

    cdf, ldf, sdf = fixtures.to_spark(spark, fx)
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlEngine(spark, store, cdf, ldf, CrawlConfig(visitor_map=vmap))
    eng.seed(sdf)
    eng.run()
    log = [
        r.asDict()
        for r in store.read_appends(spark, "order_log")
        .orderBy("seq")
        .select("seq", "round", "pop_seq", "url", "type", "tier", "host", "outcome")
        .collect()
    ]
    assert log == sim.order_log


def test_visitor_map_df(spark):
    vm = visitor_map_df(spark)
    rows = {(r["parent_type"], r["edge"]): r["child_type"] for r in vm.collect()}
    assert rows[("page", "images")] == "image"
    assert rows[("page", "pages")] == "page"


def test_policy_spec_grammar_twins(spark):
    """PolicySpec.parse / resolve_policy (Python) == resolve_policy_cols
    (Column) on the full reference grammar (traversalPolicy.js:90-106)."""
    from ghcrawler_spark.plans.policy import (
        PolicySpec,
        resolve_policy,
        resolve_policy_cols,
    )

    specs = [
        "default",
        "reprocess",
        "always:self",
        "reload:crawl@/pages",
        "reprocess:relationOnly/crawl@/teams",
        "event:initialize/repo@/",
        "nonsense",
        "reprocessAndUpdate:relationOnly/x@",
        "",
    ]
    df = spark.createDataFrame([(s,) for s in specs], "spec string")
    out = {
        r["spec"]: r["r"].asDict()
        for r in df.select(
            "spec", resolve_policy_cols("spec").alias("r")
        ).collect()
    }
    for s in specs:
        fetch, fresh, scen, mapn, path = resolve_policy(s)
        got = out[s]
        assert got["fetch"] == fetch, (s, got)
        assert got["freshness"] == fresh, (s, got)
        assert got["scenario"] == scen, (s, got)
        assert got["map_name"] == mapn, (s, got)
        assert got["path"] == path, (s, got)
    # the named-policy table matches the reference's definitions
    assert PolicySpec.parse("reprocess:relationOnly/crawl@/teams") == PolicySpec(
        name="reprocess", map_name="crawl", path="/teams", scenario="relationOnly"
    )
    assert resolve_policy("reprocess")[:2] == ("storageOnly", "version")
    assert resolve_policy("always")[:2] == ("originOnly", "always")
