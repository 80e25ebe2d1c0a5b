"""pagerank_fixed_point vs a pure-Python replay of the identical integer
recurrence — exact equality (the same property the DuckDB oracle checks,
pinned here independently of SQL)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ghcrawler_spark.operators.graph import pagerank_fixed_point
from ghcrawler_spark.plans import analytics as A

SF_DIR = "/root/testdata/sf0.001"
SCALE = 10**12
DAMP = 85
ITERS = 3
HOSTS = 40


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_pagerank(edges: set[tuple[str, str]]) -> dict[str, int]:
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = Counter(s for s, _ in edges)
    rank = {v: SCALE // n for v in nodes}
    base = ((100 - DAMP) * ((SCALE // n) * n)) // (100 * n)
    for _ in range(ITERS):
        share = {
            v: (rank[v] * DAMP) // (100 * outdeg[v]) for v in nodes if outdeg[v]
        }
        dang = sum((rank[v] * DAMP) // 100 for v in nodes if not outdeg[v])
        inflow: Counter[str] = Counter()
        for s, d in edges:
            inflow[d] += share[s]
        rank = {v: base + dang // n + inflow.get(v, 0) for v in nodes}
    return rank


def _event_edges() -> set[tuple[str, str]]:
    tbl = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id", "user_id"])
    edges = set()
    for eid, uid in zip(
        tbl.column("event_id").to_pylist(), tbl.column("user_id").to_pylist()
    ):
        src = f"h{uid % HOSTS}"
        dst = f"h{_h60(f'edge:{eid}') % HOSTS}"
        if src != dst:
            edges.add((src, dst))
    return edges


def test_g1_matches_python_replay(spark):
    got = {
        r["host"]: r["rank_micro"]
        for r in A.g1_host_rank(spark, SF_DIR).collect()
    }
    want = _python_pagerank(_event_edges())
    assert got == want
    # sanity on the recurrence itself: every rank positive, mass roughly
    # conserved (floors only ever lose micro-units)
    assert all(v > 0 for v in got.values())
    assert sum(got.values()) <= SCALE


def test_pagerank_handles_dangling_nodes(spark):
    # b and c have no out-edges: their damped mass must be redistributed,
    # not dropped — replay the recurrence by hand for one iteration
    edges = spark.createDataFrame([("a", "b"), ("a", "c")], ["src", "dst"])
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_fixed_point(edges, n_iter=1).collect()
    }
    n = 3
    r0 = SCALE // n
    base = ((100 - DAMP) * (r0 * n)) // (100 * n)
    share_a = (r0 * DAMP) // (100 * 2)
    dang = 2 * ((r0 * DAMP) // 100)  # b and c are dangling
    want = {
        "a": base + dang // n,
        "b": base + dang // n + share_a,
        "c": base + dang // n + share_a,
    }
    assert got == want


def test_pagerank_rejects_bad_damping(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank_fixed_point(edges, damping_pct=0)


def test_pagerank_persisted_discipline(spark):
    # pipeline callers own materialization: the operator must hand back its
    # persisted frames instead of leaking them
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    persisted: list = []
    out = pagerank_fixed_point(edges, n_iter=2, persisted=persisted)
    assert out.count() == 2
    assert len(persisted) == 1
    for df in persisted:
        df.unpersist()
