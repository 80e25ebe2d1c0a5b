"""ROUND SPEC v2 scenario tests — policy-driven fetch (F6), per-traversal
history (U2), compute-cost budgets (A2), token trait caps + throttle benching
(J6), events-tier ingest with payload-carried requests (§2.9), and malformed
routing to the deadletter (F3). Every scenario pins engine == simulator on
the order log and seen set, mirroring the reference suites
(githubFetcherTests.js:56-89,158-179; processingTests.js)."""

from pyspark.sql import functions as F

from ghcrawler_spark.plans.round_engine import CrawlConfig, CrawlEngine
from ghcrawler_spark.simulator import ReferenceSimulator, SimConfig
from ghcrawler_spark.sources.snapshot import SnapshotStore

CORPUS_SCHEMA = "image_id string, url string"
LINKS_SCHEMA = "src_url string, edge string, dst_url string, dst_type string"
SEEDS_SCHEMA = (
    "url string, type string, tier string, policy_fetch string, "
    "policy_freshness string, map_path string"
)


def _build(spark, tmp_path, corpus, links, seeds, cfg_kw):
    """corpus: {url: image_id}; links: {src: [(edge, dst, dtype)]};
    seeds: list of dicts. Returns (engine, store, simulator)."""
    corpus_df = spark.createDataFrame(
        [(iid, url) for url, iid in sorted(corpus.items())] or [("_x_", "http://_none_/")],
        CORPUS_SCHEMA,
    )
    link_rows = [
        (src, e, d, t) for src, lst in sorted(links.items()) for e, d, t in lst
    ]
    links_df = spark.createDataFrame(
        link_rows or [("http://_none_/", "pages", "http://_none_/x", "page")],
        LINKS_SCHEMA,
    )
    seeds_df = spark.createDataFrame(
        [
            (
                s.get("url"),
                s.get("type"),
                s.get("tier", "normal"),
                s.get("policy_fetch", "originStorage"),
                s.get("policy_freshness", "match"),
                s.get("map_path", "/"),
            )
            for s in seeds
        ],
        SEEDS_SCHEMA,
    )
    store = SnapshotStore(str(tmp_path / "store"))
    eng = CrawlEngine(spark, store, corpus_df, links_df, CrawlConfig(**cfg_kw))
    sim_links = {k: sorted(v) for k, v in links.items()}
    sim = ReferenceSimulator(dict(corpus), sim_links, SimConfig(**{
        k: v for k, v in cfg_kw.items()
        if k not in ("use_bloom", "bloom_shards", "bloom_fpr", "compact_every",
                     "validate_images", "ingest_dir", "politeness_salt",
                     "politeness_hot_threshold", "bloom_mode",
                     "bloom_broadcast_max_bytes", "bloom_shard_max_bytes",
                     "bloom_seed_expected_per_shard")
    }))
    return eng, store, sim, seeds_df


def _run_both(eng, sim, seeds_df, seeds, n_rounds=20):
    eng.seed(seeds_df)
    sim.seed(seeds)
    for _ in range(n_rounds):
        if not eng.run_round():
            break
    for _ in range(n_rounds):
        if not sim.run_round():
            break


def _logs(spark, store, sim):
    eng_log = [
        r.asDict()
        for r in store.read_appends(spark, "order_log")
        .orderBy("seq")
        .select("seq", "round", "pop_seq", "url", "type", "tier", "host", "outcome")
        .collect()
    ]
    eng_seen = {r.url for r in store.read_appends(spark, "seen").collect()}
    return eng_log, sim.order_log, eng_seen, sim.seen


H = "http://h1.test"


def test_revisit_always_vs_match(spark, tmp_path):
    """freshness 'always': a seen image rediscovered by a later traversal is
    re-processed exactly once more (history bounds it); under 'match' it is
    never revisited. Cycle edges (b → a) are blocked by history (U2)."""
    X = f"{H}/img/x"
    links = {
        f"{H}/a": [("images", X, "image"), ("pages", f"{H}/b", "page")],
        f"{H}/b": [("pages", f"{H}/c", "page"), ("pages", f"{H}/a", "page")],
        f"{H}/c": [("images", X, "image")],
    }
    corpus = {X: "imgX"}
    for fresh, expected_x_pops in (("always", 2), ("match", 1)):
        seeds = [{"url": f"{H}/a", "type": "page", "policy_freshness": fresh}]
        eng, store, sim, seeds_df = _build(
            spark, tmp_path / fresh, corpus, links, seeds,
            {"round_capacity": 2, "inject_failures": False},
        )
        _run_both(eng, sim, seeds_df, seeds)
        eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
        assert eng_log == sim_log
        assert eng_seen == sim_seen
        x_pops = [r for r in eng_log if r["url"] == X]
        assert len(x_pops) == expected_x_pops, (fresh, eng_log)
        assert all(r["outcome"] == "Processed" for r in x_pops)
        # the cycle edge never re-fetches 'a' (history hasSeen)
        assert len([r for r in eng_log if r["url"] == f"{H}/a"]) == 1


def test_storage_only_policy_skips(spark, tmp_path):
    """storageOnly + empty store → fetch_source 'skip' → outcome Skipped,
    no docs, no traversal (F6 wired into the engine)."""
    links = {f"{H}/a": [("images", f"{H}/img/x", "image")]}
    corpus = {f"{H}/img/x": "imgX"}
    seeds = [
        {"url": f"{H}/a", "type": "page", "policy_fetch": "storageOnly"},
        {"url": f"{H}/img/x", "type": "image", "policy_fetch": "storageOnly"},
    ]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        {"round_capacity": 4, "inject_failures": False},
    )
    _run_both(eng, sim, seeds_df, seeds)
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    assert {r["outcome"] for r in eng_log} == {"Skipped"}
    assert store.read_appends(spark, "docs").count() == 0


def test_compute_cost_budgets(spark, tmp_path):
    """A2: politeness consumes compute cost (image=3, page=1) against the
    bucket level; per-host per-round spend never exceeds the capacity."""
    links = {
        f"{H}/p{i}": [("images", f"{H}/img/{i}", "image"),
                      ("pages", f"{H}/p{i+1}", "page")]
        for i in range(6)
    }
    corpus = {f"{H}/img/{i}": f"img{i}" for i in range(6)}
    seeds = [{"url": f"{H}/p0", "type": "page"}]
    costs = {"image": 3, "page": 1}
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        # hot threshold 1 forces EVERY host through the adaptive salted
        # pre-cut — pins the two-phase top-k exactly equal to the oracle
        {"round_capacity": 8, "bucket_capacity": 4, "bucket_fill": 2,
         "compute_costs": costs, "inject_failures": False,
         "politeness_hot_threshold": 1},
    )
    _run_both(eng, sim, seeds_df, seeds)
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    spend = {}
    for r in eng_log:
        k = (r["round"], r["host"])
        spend[k] = spend.get(k, 0) + costs.get(r["type"], 1)
    assert spend and all(v <= 4 for v in spend.values()), spend


def test_measured_compute_costs(spark, tmp_path):
    """A2 measured mode (computeLimiter.js:44-77): politeness preallocates
    the static cost, the bucket spend charges observed elapsed minus the
    running-min baseline, and the baseline (a manifest scalar) refreshes
    per round from the round's observations. Engine == simulator on the
    order log AND on the learned baseline."""
    links = {
        f"{H}/p{i}": [("images", f"{H}/img/{i}", "image"),
                      ("pages", f"{H}/p{i+1}", "page")]
        for i in range(5)
    }
    corpus = {f"{H}/img/{i}": f"img{i}" for i in range(5)}
    seeds = [{"url": f"{H}/p0", "type": "page"}]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        {"round_capacity": 6, "bucket_capacity": 8, "bucket_fill": 4,
         "compute_costs": {"image": 2, "page": 1}, "measured_costs": True,
         "inject_failures": False},
    )
    _run_both(eng, sim, seeds_df, seeds)
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    m = store.read_manifest()
    assert sim.cost_baseline is not None
    assert m["cost_baseline"] == sim.cost_baseline


def test_trait_budgets_cap_pops(spark, tmp_path):
    """J6: token trait caps — at most 1 'image' pop per round regardless of
    the host bucket."""
    links = {f"{H}/a": [("images", f"{H}/img/{i}", "image") for i in range(5)]}
    corpus = {f"{H}/img/{i}": f"img{i}" for i in range(5)}
    seeds = [{"url": f"{H}/a", "type": "page"}]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        {"round_capacity": 8, "bucket_capacity": 8, "bucket_fill": 8,
         "trait_budgets": {"image": 1}, "inject_failures": False},
    )
    _run_both(eng, sim, seeds_df, seeds)
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    per_round = {}
    for r in eng_log:
        if r["type"] == "image":
            per_round[r["round"]] = per_round.get(r["round"], 0) + 1
    assert per_round and all(v == 1 for v in per_round.values()), per_round


def _find_transient_url(host, n=200):
    from ghcrawler_spark.simulator import is_permanent_fail, is_transient_fail

    for i in range(n):
        u = f"http://{host}/img/t{i}"
        if is_transient_fail(u, 0) and not is_permanent_fail(u):
            return u
    raise AssertionError("no transient url found")


def test_bench_on_throttle(spark, tmp_path):
    """J6 benching: a transient (throttle-class) failure benches the host for
    bench_rounds — no pops from it while benched; engine == simulator."""
    bad = _find_transient_url("h1.test")
    links = {
        f"{H}/a": [("images", bad, "image")]
        + [("images", f"{H}/img/{i}", "image") for i in range(3)],
        "http://h2.test/b": [("images", f"http://h2.test/img/{i}", "image") for i in range(3)],
    }
    corpus = {bad: "imgBad", **{f"{H}/img/{i}": f"img{i}" for i in range(3)},
              **{f"http://h2.test/img/{i}": f"h2img{i}" for i in range(3)}}
    seeds = [{"url": f"{H}/a", "type": "page"},
             {"url": "http://h2.test/b", "type": "page"}]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        {"round_capacity": 6, "bucket_capacity": 6, "bucket_fill": 3,
         "bench_on_throttle": True, "bench_rounds": 2},
    )
    _run_both(eng, sim, seeds_df, seeds)
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    # find the throttle round(s); the host must be silent for the bench window
    throttle_rounds = [
        r["round"] for r in eng_log
        if r["url"] == bad and r["outcome"] == "Requeued"
    ]
    assert throttle_rounds, "fixture must hit the transient failure"
    for tr in throttle_rounds:
        silent = {r["round"] for r in eng_log
                  if r["host"] == "h1.test" and tr < r["round"] <= tr + 2}
        assert not silent, (tr, silent)


def test_events_ingest_payload_and_priority(spark, tmp_path):
    """§2.9 event ingestion: staged events enter the 'events' tier (weight
    10 → pop before everything), payload-carried rows process without a
    fetch, malformed events deadletter, and freshness 'always' lets an event
    revisit a seen url; engine == simulator throughout."""
    import os

    links = {f"{H}/a": [("pages", f"{H}/p{i}", "page") for i in range(4)]}
    corpus = {f"{H}/img/x": "imgX"}
    seeds = [{"url": f"{H}/a", "type": "page"}]
    ingest = str(tmp_path / "staging")
    os.makedirs(ingest)
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        {"round_capacity": 2, "bucket_capacity": 8, "bucket_fill": 8,
         "inject_failures": False, "ingest_dir": ingest},
    )
    eng.seed(seeds_df)
    sim.seed(seeds)
    for _ in range(2):
        eng.run_round()
        sim.run_round()

    events = [
        # revisit of the already-crawled seed page (freshness always)
        {"url": f"{H}/a", "type": "page", "event_ms": 1, "payload_id": None},
        # payload-carried image: processed without a corpus fetch
        {"url": f"{H}/img/pay", "type": "image", "event_ms": 2,
         "payload_id": "evt-img-1"},
        # malformed → deadletter
        {"url": "not-a-url", "type": "image", "event_ms": 3, "payload_id": None},
    ]
    spark.createDataFrame(
        [(e["url"], e["type"], e["event_ms"], e["payload_id"]) for e in events],
        "url string, type string, event_ms long, payload_id string",
    ).coalesce(1).write.mode("append").parquet(ingest)
    sim.inject_events(events)

    for _ in range(20):
        if not eng.run_round():
            break
    for _ in range(20):
        if not sim.run_round():
            break
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    # payload row processed without being in the corpus
    pay = [r for r in eng_log if r["url"] == f"{H}/img/pay"]
    assert [r["outcome"] for r in pay] == ["Processed"]
    docs = {r["image_id"] for r in store.read_appends(spark, "docs").collect()}
    assert "evt-img-1" in docs
    # events tier outranks queued normal work in its first round
    ev_round = pay[0]["round"]
    in_round = [r for r in eng_log if r["round"] == ev_round]
    assert in_round[0]["tier"] == "events"
    # the revisit happened: seed page popped twice total
    assert len([r for r in eng_log if r["url"] == f"{H}/a"]) == 2
    # malformed event deadlettered
    dls = {(r["url"], r["reason"]) for r in eng.current_deadletter().collect()}
    assert ("not-a-url", "malformed") in dls
    assert {(d["url"], d["reason"]) for d in sim.deadletter} == dls


def test_ingest_gc_bounds_manifest_and_staging(spark, tmp_path):
    """Absorbed staging files older than the frontier base pointer are
    deleted and their manifest bookkeeping pruned (bounded-metadata hygiene,
    tracker-TTL analog): across 3 compaction cycles the 'ingested' map stays
    within the compaction window and the staging dir holds only un-GC'd
    files; the events scenario remains engine == simulator."""
    import os

    links = {}
    corpus = {f"{H}/img/{i}": f"img{i}" for i in range(8)}
    seeds = []
    ingest = str(tmp_path / "staging")
    os.makedirs(ingest)
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        {"round_capacity": 4, "inject_failures": False, "compact_every": 2,
         "ingest_dir": ingest},
    )
    eng.seed(spark.createDataFrame([], "url string, type string, tier string"))
    sim.seed([])
    for i in range(6):
        ev = [{"url": f"{H}/img/{i}", "type": "image", "event_ms": i,
               "payload_id": None}]
        spark.createDataFrame(
            [(e["url"], e["type"], e["event_ms"], e["payload_id"]) for e in ev],
            "url string, type string, event_ms long, payload_id string",
        ).coalesce(1).write.mode("append").parquet(ingest)
        sim.inject_events(ev)
        assert eng.run_round()
        assert sim.run_round()

    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    m = store.read_manifest()
    ing = m["ingested"]
    base = m["bases"]["frontier"]
    # only files absorbed after the base pointer (or this round) survive
    assert ing and all(r > base or r == m["round"] for r in ing.values()), (ing, base)
    assert len(ing) <= 2 + 1  # compaction window, not crawl length
    on_disk = {
        f for f in os.listdir(ingest)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    }
    assert on_disk == set(ing), "GC'd files must leave the staging dir"


def test_malformed_seeds_deadletter(spark, tmp_path):
    """F3: malformed seeds route to the deadletter with reason 'malformed'
    instead of being silently dropped (lib/crawler.js:563-576)."""
    links = {}
    corpus = {f"{H}/img/x": "imgX"}
    seeds = [
        {"url": f"{H}/img/x", "type": "image"},
        {"url": "ftp://bad.test/x", "type": "image"},
        {"url": None, "type": "image"},
        {"url": f"{H}/img/y", "type": None},
    ]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        {"round_capacity": 4, "inject_failures": False},
    )
    _run_both(eng, sim, seeds_df, seeds)
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    eng_dl = {(r["url"], r["reason"]) for r in eng.current_deadletter().collect()}
    sim_dl = {(d["url"], d["reason"]) for d in sim.deadletter}
    assert eng_dl == sim_dl
    assert eng_dl == {("ftp://bad.test/x", "malformed"), ("", "malformed"),
                      (f"{H}/img/y", "malformed")}
