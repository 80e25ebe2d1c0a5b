"""URN identity chain (lib/request.js:106-117) + deadletter requeue API
(lib/crawlerService.js:119-130)."""

from pyspark.sql import functions as F

from ghcrawler_spark import fixtures
from ghcrawler_spark.functions.urns import child_urn, root_urn, urn_parent, urn_type
from ghcrawler_spark.plans.round_engine import CrawlConfig, CrawlEngine
from ghcrawler_spark.sources.snapshot import SnapshotStore


def test_urn_build_and_parse(spark):
    df = spark.createDataFrame([("repoX", 12, "abc123")], ["repo", "num", "sha"])
    built = df.select(
        child_urn(
            child_urn(root_urn(F.lit("repo"), F.col("num")), F.lit("commit"), F.col("sha")),
            F.lit("file"),
            F.lit(7),
        ).alias("urn")
    )
    row = built.select(
        "urn",
        urn_type("urn").alias("t"),
        urn_parent("urn").alias("p"),
    ).collect()[0]
    assert row["urn"] == "urn:repo:12:commit:abc123:file:7"
    assert row["t"] == "file"
    assert row["p"] == "urn:repo:12:commit:abc123"
    # parse is the inverse of one build step
    assert urn_type is not None


import shutil

import pytest


@pytest.fixture(scope="module")
def drained(spark, tmp_path_factory):
    """One fully-drained crawl, shared; tests copy the store before mutating."""
    root = str(tmp_path_factory.mktemp("drained") / "s")
    fx = fixtures.generate(seed=42, n_hosts=4, n_seeds=2)
    cdf, ldf, sdf = fixtures.to_spark(spark, fx)
    eng = CrawlEngine(spark, SnapshotStore(root), cdf, ldf, CrawlConfig(max_rounds=60))
    eng.seed(sdf)
    eng.run()
    return root, cdf, ldf


def _engine_over_copy(spark, drained, tmp_path):
    root, cdf, ldf = drained
    dst = str(tmp_path / "copy")
    shutil.copytree(root, dst)
    store = SnapshotStore(dst)
    return CrawlEngine(spark, store, cdf, ldf, CrawlConfig(max_rounds=60)), store


def test_requeue_deadletters_roundtrip(spark, drained, tmp_path):
    """Deadletters return to the frontier with attempt=0, get crawled (our
    permanent-fail rule keeps failing them, so they deadletter again) — and
    the requeue round itself is a committed, resumable snapshot."""
    eng, store = _engine_over_copy(spark, drained, tmp_path)

    dead_before = {r.url for r in eng.current_deadletter().collect()}
    assert dead_before, "fixture must produce deadletters (hash%23==5 urls)"
    frontier_size_before = store.read_manifest()["frontier_size"]
    assert frontier_size_before == 0  # crawl drained

    n = eng.requeue_deadletters()
    assert n == len(dead_before)
    assert eng.current_deadletter().count() == 0
    m = store.read_manifest()
    assert m["frontier_size"] == n
    fr = eng.current_frontier().collect()
    assert {r.url for r in fr} == dead_before
    assert all(r.attempt == 0 for r in fr)

    # the revived rows crawl again (and re-deadletter, being permanent fails)
    eng.run()
    assert store.read_manifest()["frontier_size"] == 0
    dead_after = {r.url for r in eng.current_deadletter().collect()}
    assert dead_after == dead_before


def test_docs_carry_urn_lineage(spark, drained, tmp_path):
    """Stored docs carry the qualifier chain (urn + parent_urn) exactly as
    the reference builds it (lib/request.js:106-140, crawler.js:386-421):
    engine docs == simulator docs on (url, urn, parent_urn), every urn
    parses back to its parent, and a URN-prefix rollup answers 'all docs
    under host X' — the reference's primary storage query."""
    from ghcrawler_spark.simulator import ReferenceSimulator, SimConfig

    root, cdf, ldf = drained
    store = SnapshotStore(root)
    fx = fixtures.generate(seed=42, n_hosts=4, n_seeds=2)
    corpus = dict(zip(fx.corpus["url"], fx.corpus["image_id"]))
    links = {}
    for row in fx.links.itertuples(index=False):
        links.setdefault(row.src_url, []).append((row.edge, row.dst_url, row.dst_type))
    for v in links.values():
        v.sort()
    sim = ReferenceSimulator(corpus, links, SimConfig(max_rounds=60))
    sim.seed(fx.seeds.to_dict("records"))
    sim.run()

    eng_docs = {
        (r["url"], r["round"], r["urn"], r["parent_urn"])
        for r in store.read_appends(spark, "docs").collect()
    }
    sim_docs = {
        (d["url"], d["round"], d["urn"], d["parent_urn"]) for d in sim.docs
    }
    assert eng_docs == sim_docs
    assert eng_docs, "drained crawl must store docs"
    # every stored urn decomposes back into (parent_urn, type)
    parsed = (
        store.read_appends(spark, "docs")
        .select("urn", "parent_urn", urn_parent("urn").alias("p"))
        .collect()
    )
    assert all(r["p"] == r["parent_urn"] for r in parsed)
    # URN-prefix rollup: docs per host subtree, computable from urn alone
    roll = (
        store.read_appends(spark, "docs")
        .groupBy(F.regexp_extract("urn", "^urn:host:([^:]+)", 1).alias("host"))
        .count()
        .collect()
    )
    assert sum(r["count"] for r in roll) == len(eng_docs)
    assert all(r["host"] for r in roll)


def test_requeue_with_filter(spark, drained, tmp_path):
    eng, store = _engine_over_copy(spark, drained, tmp_path)
    dead = [r.url for r in eng.current_deadletter().collect()]
    if not dead:
        return
    target = dead[0]
    n = eng.requeue_deadletters(url_filter=f"^{target}$")
    assert n == 1
    assert eng.current_deadletter().count() == len(dead) - 1
