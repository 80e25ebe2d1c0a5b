"""Host-era canary: a fixed pure-JVM hash-aggregate job whose wall time
gauges how fast this shared host currently is (the box has multi-hour
contention eras where identical JVM jobs run 1.5-6x slower; see BENCH.md
"host noise"). Run before trusting any perf bar measurement.

Prints one JSON line {"canary_sec": best-of-3, "runs": [...], "cpus": N}.
Reference points on this box: quiet era ~4-6s, contended era 15s+.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from ghcrawler_spark.session import build_session

    spark = build_session(
        "host-canary", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    def one_run() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 40_000_000, 1, int(cpus))
            .select(F.sha2(F.col("id").cast("string"), 256).alias("h"))
            .select(F.max("h"))
            .collect()
        )
        return time.perf_counter() - t0

    one_run()  # JIT warm-up, untimed
    runs = [round(one_run(), 2) for _ in range(3)]
    print(json.dumps({"canary_sec": min(runs), "runs": runs, "cpus": int(cpus)}))
    spark.stop()


if __name__ == "__main__":
    main()
