"""Standalone engine-throughput trial: the same 1M-URL / 250k-capacity toy
bench as bench.py's engine_rounds_1m, runnable in isolation to separate
engine regressions from host-era noise (pair with tools/host_canary.py).

Usage: python tools/bench_engine_only.py [n_urls n_hosts capacity rounds]
Prints one JSON line with wall seconds, pops, urls/sec, and per-round walls.

SPARK_GRAFT_NO_WARM=1 skips the untimed warm-up round (a tiny 20k-URL
engine run that pays the round plan's one-time JIT/classload cost before
the timed region — same steady-state methodology as bench.py's query lane;
without it the first timed round measures ~10s of interpreter warm-up).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_engine(spark, n_urls: int, n_hosts: int, capacity: int, n_rounds: int):
    """Seed a synthetic n_urls/n_hosts frontier and run n_rounds full engine
    rounds in a throwaway store; returns (wall_sec, per_round_sec, popped)."""
    from pyspark.sql import functions as F

    from ghcrawler_spark.plans.round_engine import CrawlConfig, CrawlEngine
    from ghcrawler_spark.sources.snapshot import SnapshotStore

    universe = spark.range(0, n_urls).select(
        F.concat(
            F.lit("http://b"),
            (F.pmod(F.xxhash64("id"), n_hosts)).cast("string"),
            F.lit(".test/p"),
            F.col("id").cast("string"),
        ).alias("url"),
        F.lit("page").alias("type"),
        F.when(F.pmod("id", 5) == 0, "soon")
        .when(F.pmod("id", 5) < 3, "normal")
        .otherwise("later")
        .alias("tier"),
        F.lit("originStorage").alias("policy_fetch"),
        F.lit("match").alias("policy_freshness"),
        F.lit("/").alias("map_path"),
    )
    links = spark.range(0, n_urls).select(
        F.concat(
            F.lit("http://b"),
            (F.pmod(F.xxhash64("id"), n_hosts)).cast("string"),
            F.lit(".test/p"),
            F.col("id").cast("string"),
        ).alias("src_url"),
        F.lit("pages").alias("edge"),
        F.concat(
            F.lit("http://b"),
            (F.pmod(F.xxhash64(F.col("id") + 1), n_hosts)).cast("string"),
            F.lit(".test/p"),
            ((F.col("id") + 1) % n_urls).cast("string"),
        ).alias("dst_url"),
        F.lit("page").alias("dst_type"),
    )
    empty_corpus = spark.createDataFrame(
        [], "image_id string, bytes binary, ref_bytes binary, w int, h int, "
            "fmt string, caption string, phash long, url string"
    )
    root = tempfile.mkdtemp(prefix="bench_engine_only_")
    try:
        eng = CrawlEngine(
            spark,
            SnapshotStore(root),
            empty_corpus,
            links,
            CrawlConfig(
                round_capacity=capacity,
                bucket_capacity=128,
                bucket_fill=64,
                inject_failures=False,
                # mirror bench.py's engine lane: round-scoped shuffle
                # partitions sized to the round volume (SPARK_GRAFT_ENGINE_SP
                # overrides; 0 = leave the session value)
                shuffle_partitions=(
                    int(os.environ.get("SPARK_GRAFT_ENGINE_SP", "8")) or None
                ),
            ),
        )
        eng.seed(universe)
        per_round = []
        t0 = time.perf_counter()
        for _ in range(n_rounds):
            r0 = time.perf_counter()
            eng.run_round()
            per_round.append(round(time.perf_counter() - r0, 2))
        wall = time.perf_counter() - t0
        popped = SnapshotStore(root).read_manifest()["total_popped"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return wall, per_round, popped


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    capacity = int(sys.argv[3]) if len(sys.argv) > 3 else 250_000
    n_rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from ghcrawler_spark.session import build_session

    spark = build_session(
        "engine-only-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.environ.get("SPARK_GRAFT_NO_WARM"):
        _run_engine(spark, 20_000, 200, 10_000, 1)

    wall, per_round, popped = _run_engine(
        spark, n_urls, n_hosts, capacity, n_rounds
    )
    print(
        json.dumps(
            {
                "engine_wall_sec": round(wall, 3),
                "per_round_sec": per_round,
                "popped": popped,
                "urls_per_sec": round(popped / wall, 1),
                "n_urls": n_urls,
                "capacity": capacity,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
