"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" (per-query sec),
"sf", ...}.

Each query is fully materialized through the noop sink (no driver collect —
measures the distributed plan, not toPandas serialization).

For N-vs-4N scaling evidence run tools/bench_scaling.py (same queries, two
parallelism levels, efficiency report → BENCH.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_crawl_round",
    "w1_weighted_rotation",
    "w3_host_topk",
    "j1_seen_antijoin",
    "j2_rehydrate_join",
    "a1_rate_window",
    "f8_url_canonicalize",
    "d1_dedup_exact",
    "d3_minhash_lsh",
    "d4_simhash_signatures",
    "d5_embedding_neardup",
    "n1_ann_bruteforce",
    "n2_ann_bucketed",
    "t1_text_analysis",
    "t2_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from ghcrawler_spark.plans import analytics
    from ghcrawler_spark.session import build_session

    spark = build_session(
        "ghcrawler-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = analytics.queries()
    # warm the JVM + parquet footers once so per-query times measure the plans
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    per_query: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.perf_counter() - t0, 3)

    # headline throughput: frontier rows selected+ordered per second
    n_frontier = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    fr_per_sec = round(n_frontier / max(per_query["flagship_crawl_round"], 1e-9), 1)

    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else -1.0
    out = {
        "metric": "headline_suite_wall_seconds",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "frontier_rows": n_frontier,
        "frontier_rows_per_sec": fr_per_sec,
        "cpus": int(cpus),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
