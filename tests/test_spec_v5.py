"""ROUND SPEC v5 pins (round 5): bounced metric, excludeNotFound, Bailed
elevated retry, and the deletion-tombstone flow — engine == simulator on the
order log, seen set, metrics (incl. the new `bounced` column), deadletter
reasons, and tombstone visibility."""

import os

from pyspark.sql import functions as F

from ghcrawler_spark.simulator import is_permanent_fail, is_transient_fail

from tests.test_spec_v2 import H, _build, _logs, _run_both

EV_SCHEMA = (
    "url string, type string, event_ms long, payload_id string, action string"
)


def _find_permanent_url(host, n=500):
    for i in range(n):
        u = f"http://{host}/img/b{i}"
        if is_permanent_fail(u) and not is_transient_fail(u, 0):
            return u
    raise AssertionError("no permanent-fail url found")


def _stage(spark, ingest, events):
    spark.createDataFrame(
        [
            (e.get("url"), e["type"], e.get("event_ms", 0),
             e.get("payload_id"), e.get("action"))
            for e in events
        ],
        EV_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(ingest)


def test_bounced_metric_pins(spark, tmp_path):
    """`bounced` (redisRequestTracker.js:27): a child candidate that passes
    the seen-set dedup but is already in flight counts as a tracker bounce —
    engine metrics == simulator metrics, column for column, and the fixture
    provably produces a bounce (C discovered by B while C waits in the
    frontier under a 1-pop/round politeness budget)."""
    links = {
        f"{H}/a": [("pages", f"{H}/b", "page"), ("pages", f"{H}/c", "page")],
        f"{H}/b": [("pages", f"{H}/c", "page")],
    }
    seeds = [{"url": f"{H}/a", "type": "page"}]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, {}, links, seeds,
        {"round_capacity": 8, "bucket_capacity": 1, "bucket_fill": 1,
         "inject_failures": False},
    )
    _run_both(eng, sim, seeds_df, seeds)
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    eng_metrics = {
        r["round"]: r.asDict()
        for r in store.read_appends(spark, "metrics").collect()
        if r["round"] > 0
    }
    sim_metrics = {m["round"]: m for m in sim.metrics}
    assert set(eng_metrics) == set(sim_metrics)
    for rnd, sm in sim_metrics.items():
        for k in ("selected", "children", "requeued", "deadlettered",
                  "frontier_after", "ingested", "attenuated", "deferred",
                  "bounced"):
            assert eng_metrics[rnd][k] == sm[k], (rnd, k, eng_metrics, sm)
    assert sum(m["bounced"] for m in sim.metrics) == 1, sim.metrics
    # the bounced url was NOT double-enqueued: popped exactly once
    assert len([r for r in eng_log if r["url"] == f"{H}/c"]) == 1


def test_exclude_not_found_deadletters(spark, tmp_path):
    """excludeNotFound (crawler.js:528-533): Missing rows deadletter
    immediately with reason 'excludeNotFound' (still logged Missing, still
    completing into seen); metrics count them as deadlettered."""
    gone = f"{H}/img/gone"
    links = {f"{H}/a": [("images", gone, "image")]}
    seeds = [{"url": f"{H}/a", "type": "page"}]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, {}, links, seeds,
        {"round_capacity": 8, "bucket_capacity": 8, "bucket_fill": 8,
         "inject_failures": False, "exclude_not_found": True},
    )
    _run_both(eng, sim, seeds_df, seeds)
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    assert [r["outcome"] for r in eng_log if r["url"] == gone] == ["Missing"]
    assert gone in eng_seen
    dls = {(r["url"], r["reason"]) for r in eng.current_deadletter().collect()}
    assert (gone, "excludeNotFound") in dls
    assert {(d["url"], d["reason"]) for d in sim.deadletter} == dls
    em = {r["round"]: r for r in store.read_appends(spark, "metrics").collect()}
    sm = {m["round"]: m for m in sim.metrics}
    for rnd in sm:
        assert em[rnd]["deadlettered"] == sm[rnd]["deadlettered"]
    assert any(m["deadlettered"] > 0 for m in sim.metrics)


def test_bailed_elevated_retry(spark, tmp_path):
    """Bailed (githubFetcher.js:67-72): with bailed_retry a permanent-class
    failure gets exactly ONE retry then deadletters as 'Bailed' — two pops
    total, not the max_attempts loop; the url still completes into seen."""
    bad = _find_permanent_url("h1.test")
    links = {f"{H}/a": [("images", bad, "image")]}
    corpus = {bad: "imgBad"}
    seeds = [{"url": f"{H}/a", "type": "page"}]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        {"round_capacity": 8, "bucket_capacity": 8, "bucket_fill": 8,
         "bailed_retry": True},
    )
    _run_both(eng, sim, seeds_df, seeds)
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    pops = [r["outcome"] for r in eng_log if r["url"] == bad]
    assert pops == ["Requeued", "Bailed"]
    assert bad in eng_seen
    dls = {(r["url"], r["reason"]) for r in eng.current_deadletter().collect()}
    assert (bad, "Bailed") in dls
    assert {(d["url"], d["reason"]) for d in sim.deadletter} == dls

    # control: without the flag the same url burns the full attempt loop
    eng2, store2, sim2, seeds_df2 = _build(
        spark, tmp_path / "ctl", corpus, links, seeds,
        {"round_capacity": 8, "bucket_capacity": 8, "bucket_fill": 8},
    )
    _run_both(eng2, sim2, seeds_df2, seeds)
    log2, slog2, _, _ = _logs(spark, store2, sim2)
    assert log2 == slog2
    assert len([r for r in log2 if r["url"] == bad]) > 2


def test_tombstone_deletion_event_flow(spark, tmp_path):
    """Deletion tombstones end-to-end (crawler.js:375,433-434): a deletion
    event tombstones the stored doc; a revisit of the deleted url
    short-circuits ('Deleted' from storage, 'Missing' at origin — the
    entity is gone); the deleted page's subtree is never re-queued; a later
    payload event resurrects the url. Engine == simulator throughout."""
    img = f"{H}/img/i1"
    page = f"{H}/p"
    links = {page: [("images", img, "image")]}
    corpus = {img: "img1"}
    seeds = [{"url": page, "type": "page"}]
    ingest = str(tmp_path / "staging")
    os.makedirs(ingest)
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        {"round_capacity": 4, "bucket_capacity": 8, "bucket_fill": 8,
         "inject_failures": False, "tombstones": True, "ingest_dir": ingest},
    )
    eng.seed(seeds_df)
    sim.seed(seeds)
    for _ in range(3):  # page traversed, image processed, drain
        eng.run_round()
        sim.run_round()

    # deletion for the stored image + a revisit event for it
    ev1 = [
        {"url": img, "type": "image", "event_ms": 1, "action": "deleted"},
        {"url": img, "type": "image", "event_ms": 2},
    ]
    _stage(spark, ingest, ev1)
    sim.inject_events(ev1)
    eng.run_round()
    sim.run_round()

    # deletion for the (never-stored) page + a revisit event: origin finds
    # it gone → Missing, and the subtree (img) is NOT re-queued
    ev2 = [
        {"url": page, "type": "page", "event_ms": 3, "action": "deleted"},
        {"url": page, "type": "page", "event_ms": 4},
    ]
    _stage(spark, ingest, ev2)
    sim.inject_events(ev2)
    eng.run_round()
    sim.run_round()

    # payload event resurrects the image; a final revisit then processes
    ev3 = [{"url": img, "type": "image", "event_ms": 5,
            "payload_id": "img1-v2"}]
    _stage(spark, ingest, ev3)
    sim.inject_events(ev3)
    eng.run_round()
    sim.run_round()
    ev4 = [{"url": img, "type": "image", "event_ms": 6}]
    _stage(spark, ingest, ev4)
    sim.inject_events(ev4)
    for _ in range(6):
        if not eng.run_round():
            break
    for _ in range(6):
        if not sim.run_round():
            break

    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    img_outcomes = [r["outcome"] for r in eng_log if r["url"] == img]
    assert img_outcomes == ["Processed", "Deleted", "Processed", "Processed"]
    page_outcomes = [r["outcome"] for r in eng_log if r["url"] == page]
    assert page_outcomes == ["Traversed", "Missing"]
    # the deleted page's revisit queued NO children (img popped only via
    # its own events — 4 times, never from a second traversal)
    assert len(img_outcomes) == 4
    # tombstones table + manifest counter round-trip
    tombs = {
        (r["url"], r["round"])
        for r in store.read_appends(spark, "tombstones").collect()
    }
    assert {u for u, _ in tombs} == {img, page}
    assert store.read_manifest()["tombstones_total"] == 2
    assert sim.tombstones.keys() == {img, page}


def test_tombstone_cachekey_addressed_and_resume(spark, tmp_path):
    """cacheKey-addressed deletes (githubProcessor.js:599,610,668,724): a
    deletion with no url resolves through the docs log by payload_id; an
    unknown key is a no-op; url-less key-less directives deadletter as
    'malformed'. A killed engine resumes the tombstone state exactly."""
    img = f"{H}/img/i1"
    page = f"{H}/p"
    links = {page: [("images", img, "image")]}
    corpus = {img: "imgK"}
    seeds = [{"url": page, "type": "page"}]
    ingest = str(tmp_path / "staging")
    os.makedirs(ingest)
    cfg = {"round_capacity": 4, "bucket_capacity": 8, "bucket_fill": 8,
           "inject_failures": False, "tombstones": True, "ingest_dir": ingest}
    eng, store, sim, seeds_df = _build(spark, tmp_path, corpus, links, seeds, cfg)
    eng.seed(seeds_df)
    sim.seed(seeds)
    for _ in range(3):
        eng.run_round()
        sim.run_round()

    evs = [
        {"url": None, "type": "image", "event_ms": 1, "action": "deleted",
         "payload_id": "imgK"},          # resolves to img via the docs log
        {"url": None, "type": "image", "event_ms": 2, "action": "deleted",
         "payload_id": "no-such-key"},   # unknown cache key: no-op
        {"url": None, "type": "image", "event_ms": 3, "action": "deleted"},
        # ^ neither url nor key → malformed deadletter
        {"url": "ftp://h1.test/x", "type": "image", "event_ms": 4,
         "action": "deleted", "payload_id": "imgK"},
        # ^ cacheKey addressing applies ONLY when the url is ABSENT: a
        # non-empty INVALID url is malformed even with a payload_id riding
        # along — it must NOT resolve and tombstone the stored doc
    ]
    _stage(spark, ingest, evs)
    sim.inject_events(evs)
    eng.run_round()
    sim.run_round()
    assert sim.tombstones == {img: sim.round}

    # kill + resume, then a revisit event must short-circuit to Deleted
    del eng
    from ghcrawler_spark.plans.round_engine import CrawlConfig, CrawlEngine

    corpus_df = spark.createDataFrame([("imgK", img)], "image_id string, url string")
    links_df = spark.createDataFrame(
        [(page, "images", img, "image")],
        "src_url string, edge string, dst_url string, dst_type string",
    )
    eng2 = CrawlEngine(spark, store, corpus_df, links_df, CrawlConfig(**cfg))
    rv = [{"url": img, "type": "image", "event_ms": 9}]
    _stage(spark, ingest, rv)
    sim.inject_events(rv)
    for _ in range(4):
        if not eng2.run_round():
            break
    for _ in range(4):
        if not sim.run_round():
            break
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    assert [r["outcome"] for r in eng_log if r["url"] == img][-1] == "Deleted"
    dls = {(r["url"], r["reason"]) for r in eng2.current_deadletter().collect()}
    assert ("", "malformed") in dls
    assert {(d["url"], d["reason"]) for d in sim.deadletter} == dls


def test_admin_flush_tier_and_peek_requests(spark, tmp_path):
    """Admin queue surface (lib/crawlerService.js:75-105): flush_tier drops
    exactly one tier's rows; peek_requests is a non-destructive bounded
    read, and peek+remove == pop without processing (the rows vanish from
    the frontier and the manifest size bookkeeping stays exact)."""
    links = {
        f"{H}/a": [("pages", f"{H}/p{i}", "page") for i in range(3)]
        + [("images", f"{H}/img/{i}", "image") for i in range(3)],
    }
    corpus = {f"{H}/img/{i}": f"img{i}" for i in range(3)}
    seeds = [{"url": f"{H}/a", "type": "page"}]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        {"round_capacity": 1, "bucket_capacity": 8, "bucket_fill": 8,
         "inject_failures": False},
    )
    eng.seed(seeds_df)
    eng.run_round()  # traverses the seed: 3 pages → normal, 3 images → soon

    fr = eng.current_frontier()
    n_soon = fr.filter(F.col("tier") == "soon").count()
    n_normal = fr.filter(F.col("tier") == "normal").count()
    assert n_soon == 3 and n_normal == 3

    # non-destructive peek: deterministic, repeatable, bounded
    p1 = eng.peek_requests(count=2)
    p2 = eng.peek_requests(count=2)
    assert [r["enqueue_seq"] for r in p1] == [r["enqueue_seq"] for r in p2]
    assert len(p1) == 2
    assert eng.current_frontier().count() == 6

    # flush exactly the soon tier
    assert eng.flush_tier("soon") == 3
    fr2 = eng.current_frontier()
    assert fr2.filter(F.col("tier") == "soon").count() == 0
    assert fr2.filter(F.col("tier") == "normal").count() == 3
    assert store.read_manifest()["frontier_size"] == 3
    assert eng.flush_tier("soon") == 0  # idempotent on an empty tier

    # peek+remove: the removed rows are gone; the next peek sees the rest
    taken = eng.peek_requests(tier="normal", count=2, remove=True)
    assert len(taken) == 2
    left = eng.peek_requests(tier="normal", count=10)
    assert {r["enqueue_seq"] for r in taken}.isdisjoint(
        {r["enqueue_seq"] for r in left}
    )
    assert len(left) == 1
    assert store.read_manifest()["frontier_size"] == 1

    # the crawl still completes cleanly over the admin-modified store
    for _ in range(10):
        if not eng.run_round():
            break
    assert store.read_manifest()["frontier_size"] == 0
    # only the surviving normal row was ever popped after the admin ops
    popped = [
        r["url"]
        for r in store.read_appends(spark, "order_log").collect()
        if r["round"] > 1
    ]
    assert popped == [left[0]["url"]]


def test_rank_priority_drives_politeness_order(spark, tmp_path):
    """g1 wired into the engine (judge task 8): with rank_priority the
    per-host politeness budget is spent on graph-important urls first —
    the later-enqueued, heavily-linked seed wins the 1-token budget over
    the FIFO candidate; without the flag FIFO wins. Engine == simulator
    (the integer fixed-point rank is bit-exact on both sides)."""
    lo, hi = f"{H}/a_low", f"{H}/z_high"
    # hub pages (never crawled) all point at `hi` → high PageRank; `lo`
    # gets a single in-link. Ranks come from the STATIC graph, not crawled
    # state, so the priority is known before either seed pops.
    links = {f"{H}/x{i}": [("pages", hi, "page")] for i in range(6)}
    links[f"{H}/x0"].append(("pages", lo, "page"))
    seeds = [{"url": lo, "type": "page"}, {"url": hi, "type": "page"}]
    base_cfg = {"round_capacity": 8, "bucket_capacity": 1, "bucket_fill": 1,
                "inject_failures": False}

    eng, store, sim, seeds_df = _build(
        spark, tmp_path, {}, links, seeds, {**base_cfg, "rank_priority": True},
    )
    _run_both(eng, sim, seeds_df, seeds)
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    first_pops = [r["url"] for r in eng_log if r["round"] == 1]
    assert first_pops == [hi], eng_log  # rank beat FIFO under budget 1

    # control: FIFO without the flag
    eng2, store2, sim2, seeds_df2 = _build(
        spark, tmp_path / "ctl", {}, links, seeds, base_cfg,
    )
    _run_both(eng2, sim2, seeds_df2, seeds)
    log2, slog2, _, _ = _logs(spark, store2, sim2)
    assert log2 == slog2
    assert [r["url"] for r in log2 if r["round"] == 1] == [lo]


def test_pagerank_deep_iteration_lineage_bounded(spark):
    """VERDICT r4 nit #2: n_iter=12 completes with a flat plan (per-5-sweep
    localCheckpoint truncation) and still matches the pure-Python integer
    recurrence exactly."""
    from ghcrawler_spark.operators.graph import pagerank_fixed_point
    from ghcrawler_spark.simulator import pagerank_fixed_point_py

    edges = [(f"n{i}", f"n{(i * 3 + 1) % 40}") for i in range(40)] + [
        ("n0", "n7"), ("n1", "n7"), ("n2", "n7")
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_fixed_point(df, n_iter=12).collect()
    }
    want = pagerank_fixed_point_py(edges, n_iter=12)
    assert got == want
    # the checkpoint cadence actually fired (12 > _CHECKPOINT_EVERY)
    from ghcrawler_spark.operators import graph as G

    assert G._CHECKPOINT_EVERY < 12


def test_tombstone_compaction_and_expiry(spark, tmp_path):
    """Tombstones ride the merge-on-read compaction cycle like every other
    state table: past a compaction the lookup reads base ∪ deltas-past-base
    (bounded fan-in), snapshot expiry may drop folded deltas, and a resumed
    engine still honors the deletion."""
    img = f"{H}/img/i1"
    page = f"{H}/p"
    links = {page: [("images", img, "image")]}
    corpus = {img: "imgC"}
    seeds = [{"url": page, "type": "page"}]
    ingest = str(tmp_path / "staging")
    os.makedirs(ingest)
    cfg = {"round_capacity": 4, "bucket_capacity": 8, "bucket_fill": 8,
           "inject_failures": False, "tombstones": True,
           "ingest_dir": ingest, "compact_every": 2}
    eng, store, sim, seeds_df = _build(spark, tmp_path, corpus, links, seeds, cfg)
    eng.seed(seeds_df)
    sim.seed(seeds)
    for _ in range(2):
        eng.run_round()
        sim.run_round()

    dele = [{"url": img, "type": "image", "event_ms": 1, "action": "deleted"}]
    _stage(spark, ingest, dele)
    sim.inject_events(dele)
    # keep rounds turning (events keep an otherwise-drained frontier alive)
    filler = [{"url": f"{H}/f{i}", "type": "page", "event_ms": 10 + i}
              for i in range(4)]
    _stage(spark, ingest, filler[:2])
    sim.inject_events(filler[:2])
    eng.run_round()
    sim.run_round()
    _stage(spark, ingest, filler[2:])
    sim.inject_events(filler[2:])
    for _ in range(3):
        eng.run_round()
        sim.run_round()

    m = store.read_manifest()
    assert m["bases"].get("tombstones") is not None, m["bases"]
    # expiry folds pre-base tombstone deltas into the base
    store.expire_snapshots(m["bases"]["frontier"])

    # resume + revisit: the deletion is still respected from the compacted
    # base (Deleted — the event policy rehydrates from storage)
    del eng
    eng2, _, _, _ = _build(spark, tmp_path, corpus, links, seeds, cfg)
    rv = [{"url": img, "type": "image", "event_ms": 99}]
    _stage(spark, ingest, rv)
    sim.inject_events(rv)
    for _ in range(4):
        if not eng2.run_round():
            break
    for _ in range(4):
        if not sim.run_round():
            break
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    assert [r["outcome"] for r in eng_log if r["url"] == img] == [
        "Processed", "Deleted"
    ]


# -- live reconfiguration (routes/config.js PATCH /config) --------------------


def _patch_fixture(spark, tmp_path, cfg_kw):
    """Seed -> 6 pages -> 6 images, images 4..6 absent from the corpus (so
    excludeNotFound has Missing rows to route)."""
    links = {
        f"{H}/a": [("pages", f"{H}/p{i}", "page") for i in range(1, 7)],
        **{
            f"{H}/p{i}": [("images", f"{H}/img/{i}", "image")]
            for i in range(1, 7)
        },
    }
    corpus = {f"{H}/img/{i}": f"img{i}" for i in range(1, 4)}
    seeds = [{"url": f"{H}/a", "type": "page"}]
    return _build(spark, tmp_path, corpus, links, seeds, cfg_kw)


def test_config_patch_engine_matches_simulator(spark, tmp_path):
    """Live reconfiguration (routes/config.js:12-18 PATCH /config →
    crawlerService.options[key]._config.apply): an option patch between
    rounds applies from the next round on BOTH engine and simulator —
    identical order log, seen set, and per-round metrics across the change,
    and the patch provably bites (post-patch rounds pop at most the new
    capacity; a Missing url deadletters as excludeNotFound)."""
    eng, store, sim, seeds_df = _patch_fixture(
        spark, tmp_path,
        {"round_capacity": 3, "bucket_capacity": 8, "bucket_fill": 8,
         "inject_failures": False},
    )
    eng.seed(seeds_df)
    sim.seed(seeds := [{"url": f"{H}/a", "type": "page"}])
    for _ in range(2):
        eng.run_round()
        sim.run_round()
    patch = {"round_capacity": 2, "bucket_capacity": 4, "bucket_fill": 2,
             "exclude_not_found": True}
    live = eng.update_config(**patch)
    assert live["round_capacity"] == 2 and live["exclude_not_found"] is True
    sim.update_config(**patch)
    for _ in range(30):
        if not eng.run_round():
            break
    for _ in range(30):
        if not sim.run_round():
            break
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    # the admin commit occupies round 3; crawl rounds resume at 4
    post = [r for r in eng_log if r["round"] >= 4]
    assert post, eng_log
    per_round: dict = {}
    for r in post:
        per_round[r["round"]] = per_round.get(r["round"], 0) + 1
    assert max(per_round.values()) <= 2
    dls = {(r["url"], r["reason"]) for r in eng.current_deadletter().collect()}
    assert (f"{H}/img/4", "excludeNotFound") in dls
    assert {(d["url"], d["reason"]) for d in sim.deadletter} == dls
    em = {r["round"]: r.asDict()
          for r in store.read_appends(spark, "metrics").collect()}
    sm = {m["round"]: m for m in sim.metrics}
    assert set(em) == set(sm)
    for rnd, m in sm.items():
        for k in ("selected", "children", "requeued", "deadlettered",
                  "frontier_after", "attenuated", "deferred", "bounced"):
            assert em[rnd][k] == m[k], (rnd, k)


def test_config_patch_survives_resume(spark, tmp_path):
    """The patch journal: a killed run resumed with the ORIGINAL config
    replays journaled patches (manifest `config_patches`), so resume
    continues with the operator's live values instead of silently undoing
    them — the resumed crawl matches the uninterrupted simulator."""
    from ghcrawler_spark.plans.round_engine import CrawlConfig, CrawlEngine

    orig_kw = {"round_capacity": 3, "bucket_capacity": 8, "bucket_fill": 8,
               "inject_failures": False}
    eng, store, sim, seeds_df = _patch_fixture(spark, tmp_path, dict(orig_kw))
    links_df = eng.links  # pre-partitioned input is fine to re-wrap
    corpus_df = eng.corpus
    eng.seed(seeds_df)
    sim.seed([{"url": f"{H}/a", "type": "page"}])
    for _ in range(2):
        eng.run_round()
        sim.run_round()
    patch = {"round_capacity": 2, "exclude_not_found": True}
    eng.update_config(**patch)
    sim.update_config(**patch)
    eng.run_round()
    sim.run_round()
    del eng  # "kill"

    # resume with the ORIGINAL config: the journal must reapply the patch
    eng2 = CrawlEngine(spark, store, corpus_df, links_df,
                       CrawlConfig(**orig_kw))
    assert eng2.cfg.round_capacity == 2
    assert eng2.cfg.exclude_not_found is True
    assert eng2.describe_config()["round_capacity"] == 2
    for _ in range(30):
        if not eng2.run_round():
            break
    for _ in range(30):
        if not sim.run_round():
            break
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen


def test_config_patch_rejects_structural(spark, tmp_path):
    """Structural options (seen-set kind, bloom geometry, robots, rank
    tables) are fixed at engine construction — PATCHing one raises instead
    of corrupting persisted state, mirroring the reference's
    rebuild-the-service path for provider changes."""
    import pytest

    eng, _store, _sim, seeds_df = _patch_fixture(
        spark, tmp_path, {"round_capacity": 3, "inject_failures": False}
    )
    eng.seed(seeds_df)
    with pytest.raises(ValueError, match="not reconfigurable"):
        eng.update_config(seen_filter="cuckoo")
    with pytest.raises(ValueError, match="not reconfigurable"):
        eng.update_config(bloom_shards=64)
    # a rejected patch changes nothing and journals nothing
    assert eng.cfg.seen_filter == "bloom"
    assert "config_patches" not in _store.read_manifest()


def test_queue_requests_mid_crawl(spark, tmp_path):
    """Admin enqueue (routes/requests.js:23-28 POST /requests/:queue →
    crawlerService.queue): new requests enter a NAMED tier mid-crawl
    through seed()'s intake funnel — malformed rows deadletter, robots-
    denied rows land in excluded, urls already in flight bounce — and the
    continued crawl stays engine == simulator on order log and seen set."""
    links = {
        f"{H}/a": [("pages", f"{H}/b", "page"), ("pages", f"{H}/c", "page")],
    }
    new_img = f"{H}/img/new1"
    corpus = {new_img: "imgN"}
    seeds = [{"url": f"{H}/a", "type": "page"}]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, corpus, links, seeds,
        {"round_capacity": 2, "bucket_capacity": 8, "bucket_fill": 8,
         "inject_failures": False,
         "robots_deny": {"h1.test": ["/blocked"]}},
    )
    eng.seed(seeds_df)
    sim.seed(seeds)
    eng.run_round()
    sim.run_round()  # pops a; children b, c now in flight

    batch = [
        {"url": new_img, "type": "image", "tier": "soon"},
        {"url": f"{H}/blocked/x", "type": "page"},   # robots → excluded
        {"url": None, "type": "image"},              # F3 → deadletter
        {"url": f"{H}/b", "type": "page"},           # in flight → bounce
    ]
    req_df = spark.createDataFrame(
        [(b["url"], b["type"], b.get("tier")) for b in batch],
        "url string, type string, tier string",
    )
    eng_counts = eng.queue_requests(req_df, tier="normal")
    sim_counts = sim.queue_requests(batch, tier="normal")
    assert eng_counts == sim_counts
    assert eng_counts == {"queued": 1, "malformed": 1, "denied": 1,
                          "bounced": 1}

    for _ in range(20):
        if not eng.run_round():
            break
    for _ in range(20):
        if not sim.run_round():
            break
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    # the queued image rode the 'soon' tier and processed from the corpus
    pops = [r for r in eng_log if r["url"] == new_img]
    assert [(r["tier"], r["outcome"]) for r in pops] == [("soon", "Processed")]
    # b was NOT double-enqueued by the bounced push
    assert len([r for r in eng_log if r["url"] == f"{H}/b"]) == 1
    # funnel side tables match, including the admin commit's round stamp
    dls = {(r["url"], r["reason"], r["round"])
           for r in eng.current_deadletter().collect()}
    assert {(d["url"], d["reason"], d["round"]) for d in sim.deadletter} == dls
    assert ("", "malformed", 2) in dls
    excl = {(r["url"], r["round"])
            for r in store.read_appends(spark, "excluded").collect()}
    assert {(e["url"], e["round"]) for e in sim.excluded} == excl
    assert (f"{H}/blocked/x", 2) in excl


def test_admin_status_queue_info_delete_deadletters(spark, tmp_path):
    """Remaining ops routes: GET /status (routes/status.js — live manifest
    stats), GET /queues/:name/info (routes/queues.js:19-29 — tier depth +
    weight), DELETE /deadletters/:urn without ?requeue
    (routes/deadletters.js:30-37 — permanent discard, the non-requeue half
    of the deadletter API)."""
    import pytest

    links = {
        f"{H}/a": [("images", f"{H}/img/4", "image"),
                   ("images", f"{H}/img/5", "image")],
    }
    seeds = [{"url": f"{H}/a", "type": "page"}]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, {}, links, seeds,
        {"round_capacity": 8, "bucket_capacity": 8, "bucket_fill": 8,
         "inject_failures": False, "exclude_not_found": True},
    )
    eng.seed(seeds_df)
    eng.run_round()  # pops a; both images (missing from the corpus) queue

    info = eng.queue_info("soon")
    assert info == {"name": "soon", "count": 2, "weight": 2}
    with pytest.raises(KeyError):
        eng.queue_info("nope")

    while eng.run_round():
        pass
    st = eng.status()
    assert st["frontier_size"] == 0
    assert st["total_popped"] == 3  # a + 2 images
    assert st["docs_total"] == 0  # both images Missing
    assert st["round"] == store.read_manifest()["round"]

    dls = sorted(r["url"] for r in eng.current_deadletter().collect())
    assert dls == [f"{H}/img/4", f"{H}/img/5"]
    assert eng.delete_deadletters(url_filter="img/4$") == 1
    assert [r["url"] for r in eng.current_deadletter().collect()] == [
        f"{H}/img/5"
    ]
    assert eng.delete_deadletters() == 1
    assert eng.current_deadletter().count() == 0
    assert eng.delete_deadletters() == 0  # idempotent when empty
    # the crawl state is untouched by the discards
    assert eng.status()["frontier_size"] == 0


def test_duplicate_url_batches_dedupe(spark, tmp_path):
    """Tracked-push tag semantics (redisRequestTracker.js:21-27
    track-then-push): a url repeated WITHIN one seed or admin batch
    enqueues ONCE — the tag set by the first push bounces later copies —
    keeping the frontier url-unique and enqueue_seq deterministic. Both
    twins keep the same winner (first by the resolved attribute tuple) and
    the continued crawl stays engine == simulator."""
    links = {f"{H}/a": [("pages", f"{H}/b", "page")]}
    seeds = [
        {"url": f"{H}/s", "type": "page", "tier": "soon"},
        {"url": f"{H}/s", "type": "page", "tier": "normal"},  # 'normal'<'soon'
        {"url": f"{H}/a", "type": "page"},
    ]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, {}, links, seeds,
        {"round_capacity": 8, "inject_failures": False},
    )
    eng.seed(seeds_df)
    sim.seed(seeds)
    eng_fr = {
        r.url: (r.tier, r.enqueue_seq)
        for r in eng.current_frontier().collect()
    }
    sim_fr = {r.url: (r.tier, r.enqueue_seq) for r in sim.frontier}
    assert eng_fr == sim_fr
    assert len(eng_fr) == 2
    assert eng_fr[f"{H}/s"][0] == "normal"  # the resolved-tuple winner
    assert store.read_manifest()["frontier_size"] == 2

    batch = [
        {"url": f"{H}/q", "type": "page", "tier": "later"},
        {"url": f"{H}/q", "type": "page", "tier": "normal"},  # intra-batch dup
        {"url": f"{H}/a", "type": "page"},                    # in flight
    ]
    req_df = spark.createDataFrame(
        [(b["url"], b["type"], b.get("tier")) for b in batch],
        "url string, type string, tier string",
    )
    eng_counts = eng.queue_requests(req_df, tier="normal")
    sim_counts = sim.queue_requests(batch, tier="normal")
    assert eng_counts == sim_counts
    assert eng_counts == {
        "queued": 1, "malformed": 0, "denied": 0, "bounced": 2,
    }
    fr2 = {r.url: r.tier for r in eng.current_frontier().collect()}
    assert fr2[f"{H}/q"] == "later"  # 'later' < 'normal'
    assert sorted(fr2) == sorted({r.url for r in sim.frontier})

    for _ in range(20):
        if not eng.run_round():
            break
    for _ in range(20):
        if not sim.run_round():
            break
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen
    assert len([r for r in eng_log if r["url"] == f"{H}/s"]) == 1
    assert len([r for r in eng_log if r["url"] == f"{H}/q"]) == 1


def test_requeue_dedupes_and_bounces_inflight(spark, tmp_path):
    """Requeue is a tracked push too (crawlerService.js:119-130): duplicate
    deadletter rows for one url revive a SINGLE frontier row; a url still
    live in the frontier bounces instead of duplicating; and matching
    deadletter rows clear even when every candidate bounced (the reference
    deletes the deadletter doc before pushing)."""
    bad = "ftp://h1.test/d"
    seeds = [
        {"url": f"{H}/a", "type": "page"},   # stays live in the frontier
        {"url": f"{H}/a", "type": None},     # malformed → deadletter url H/a
        {"url": bad, "type": "page"},        # malformed (scheme) → deadletter
        {"url": bad, "type": "page"},        # duplicate deadletter row
    ]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, {}, {}, seeds,
        {"round_capacity": 8, "inject_failures": False},
    )
    eng.seed(seeds_df)
    assert eng.current_frontier().count() == 1
    assert eng.current_deadletter().count() == 3

    # every candidate bounces → nothing revives, but the rows still clear
    n = eng.requeue_deadletters(url_filter=f"^{H}/a$")
    assert n == 0
    assert eng.current_deadletter().count() == 2
    assert eng.current_frontier().count() == 1  # no duplicate of the live row

    # duplicate deadletter rows for `bad` revive exactly one frontier row
    n = eng.requeue_deadletters()
    assert n == 1
    assert eng.current_deadletter().count() == 0
    fr = eng.current_frontier().collect()
    assert sorted(r.url for r in fr) == sorted([f"{H}/a", bad])
    revived = [r for r in fr if r.url == bad][0]
    assert revived.attempt == 0


def test_falsy_intake_attributes_align(spark, tmp_path):
    """js-falsy intake semantics: '' and None request attributes fall
    through to spec/default resolution on BOTH twins (the reference treats
    '' like absent), so a duplicate-url batch whose copies differ only in
    falsy attributes picks the SAME winner; and a None-tier seed defaults
    to 'normal' instead of enqueueing a NULL tier no rotation weight would
    ever select (a permanently stuck row)."""
    seeds = [
        {"url": f"{H}/a", "type": "page", "tier": None},  # → 'normal'
        {"url": f"{H}/b", "type": "page", "tier": "later",
         "policy_fetch": ""},  # '' → default 'originStorage'
        {"url": f"{H}/b", "type": "page", "tier": None,
         "policy_fetch": "storageOnly"},
        # ^ dup url: resolved tiers 'later' < 'normal', so the 'later' copy
        # wins on both engines and its '' fetch resolves to the default
    ]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, {}, {}, seeds,
        {"round_capacity": 8, "inject_failures": False},
    )
    eng.seed(seeds_df)
    sim.seed(seeds)
    eng_fr = {
        r.url: (r.tier, r.policy_fetch, r.enqueue_seq)
        for r in eng.current_frontier().collect()
    }
    sim_fr = {
        r.url: (r.tier, r.policy_fetch, r.enqueue_seq) for r in sim.frontier
    }
    assert eng_fr == sim_fr
    assert eng_fr[f"{H}/a"][0] == "normal"
    assert eng_fr[f"{H}/b"][:2] == ("later", "originStorage")

    for _ in range(10):
        if not eng.run_round():
            break
    for _ in range(10):
        if not sim.run_round():
            break
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen


def test_unknown_intake_attributes_fall_to_defaults(spark, tmp_path):
    """Domain validation at intake: unknown tier / policy_fetch /
    policy_freshness values fall through to the default resolution on BOTH
    twins (unknown policy NAMES resolve to the default policy in the
    reference's traversalPolicy.getPolicy) — instead of an unknown tier
    getting a NULL rotation weight (stuck row), an unknown fetch policy
    taking fetch_source's otherwise-arm while the python twin branches
    differently, or a non-numeric freshness nulling out should_process."""
    seeds = [
        {"url": f"{H}/a", "type": "page", "tier": "urgent"},     # → 'normal'
        {"url": f"{H}/b", "type": "page", "tier": "soon",
         "policy_fetch": "bogus", "policy_freshness": "weekly"},
        # ^ → originStorage / match; numeric-string freshness stays valid
        {"url": f"{H}/c", "type": "page", "policy_freshness": "7"},
    ]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, {}, {}, seeds,
        {"round_capacity": 8, "inject_failures": False},
    )
    eng.seed(seeds_df)
    sim.seed(seeds)
    eng_fr = {
        r.url: (r.tier, r.policy_fetch, r.policy_freshness)
        for r in eng.current_frontier().collect()
    }
    sim_fr = {
        r.url: (r.tier, r.policy_fetch, r.policy_freshness)
        for r in sim.frontier
    }
    assert eng_fr == sim_fr
    assert eng_fr[f"{H}/a"][0] == "normal"
    assert eng_fr[f"{H}/b"] == ("soon", "originStorage", "match")
    assert eng_fr[f"{H}/c"][2] == "7"

    for _ in range(10):
        if not eng.run_round():
            break
    for _ in range(10):
        if not sim.run_round():
            break
    eng_log, sim_log, eng_seen, sim_seen = _logs(spark, store, sim)
    assert eng_log == sim_log
    assert eng_seen == sim_seen


def test_malformed_out_of_domain_tier_deadletters_raw_value(spark, tmp_path):
    """ADVICE r5: tier domain validation must not rewrite the deadletter's
    forensics — a malformed request with an out-of-domain tier records the
    RAW value the caller sent (simulator: s.get('tier') or batch default),
    not '' / the validated default, through BOTH intake funnels."""
    seeds = [
        {"url": f"{H}/a", "type": "page"},
        {"url": None, "type": "page", "tier": "weird"},  # malformed + bad tier
    ]
    eng, store, sim, seeds_df = _build(
        spark, tmp_path, {}, {}, seeds,
        {"round_capacity": 2, "bucket_capacity": 8, "bucket_fill": 8,
         "inject_failures": False},
    )
    # seeds_df via _build coerces missing tier to 'normal'; build a frame
    # that carries the raw values verbatim instead
    raw_df = spark.createDataFrame(
        [(s.get("url"), s.get("type"), s.get("tier")) for s in seeds],
        "url string, type string, tier string",
    )
    eng.seed(raw_df)
    sim.seed(seeds)
    dls = {(r["url"], r["tier"], r["reason"])
           for r in eng.current_deadletter().collect()}
    assert dls == {(d["url"], d["tier"], d["reason"]) for d in sim.deadletter}
    assert ("", "weird", "malformed") in dls

    # admin funnel: falsy tier falls back to the batch default, out-of-domain
    # stays raw — engine == simulator either way
    batch = [
        {"url": None, "type": "image", "tier": "bogus"},
        {"url": "not-a-url", "type": "page"},
    ]
    req_df = spark.createDataFrame(
        [(b.get("url"), b.get("type"), b.get("tier")) for b in batch],
        "url string, type string, tier string",
    )
    eng_counts = eng.queue_requests(req_df, tier="later")
    sim_counts = sim.queue_requests(batch, tier="later")
    assert eng_counts == sim_counts
    dls = {(r["url"], r["tier"], r["reason"])
           for r in eng.current_deadletter().collect()}
    assert dls == {(d["url"], d["tier"], d["reason"]) for d in sim.deadletter}
    assert ("", "bogus", "malformed") in dls
    assert ("not-a-url", "later", "malformed") in dls
