"""Frontier selection operators — the DataFrame replacements for ghcrawler's
queue mechanics (SURVEY.md §2.1/§2.5).

The reference pops one request at a time from a weighted-random rotation over
FIFO queues (providers/queuing/queueSet.js:46-65) and benches hosts/tokens via
limiter state (providers/fetcher/tokenFactory.js:41-93). Here a crawl round
selects a whole batch declaratively:

- ``weighted_rotation_order``: deterministic replacement for the
  Math.random-started rotation — fair weighted interleaving by integer
  virtual time (rank_in_tier * (SCALE / weight)). Reproducible, so the
  simulator oracle and the N-vs-4N scaling runs commit identical orders.
- ``tier_quota_select``: per-round quota per tier ∝ weight (queueSet weights
  {soon:2, normal:3, later:2}, lib/crawlerFactory.js:86).
- ``host_topk``: per-host politeness cap — the canonical top-k-per-group
  window (reference analog: per-token benching + rate limiting).
- ``backoff_gate``: retry/defer visibility (requeueDelay × attempt,
  lib/crawler.js:150-154; defer wake-time, amqp10Queue.js:238-251).

All windows partition by a key that the frontier table is already hashed on,
so at scale the sort is partition-local after one shuffle; AQE splits any
hot-host partition the salt missed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Integer virtual-time scale. 2520 = lcm(1..10): every reference weight
# (events:10 immediate:3 soon:2 normal:3 later:2) divides it exactly, so the
# schedule stays in integer arithmetic (bit-exact in any engine).
WEIGHT_SCALE = 2520

DEFAULT_WEIGHTS = {"immediate": 3, "soon": 2, "normal": 3, "later": 2}


def _rank_in_tier(tier_col: str, order_cols: list[str]) -> Column:
    w = Window.partitionBy(tier_col).orderBy(*[F.col(c) for c in order_cols])
    return F.row_number().over(w)


def weighted_rotation_order(
    df: DataFrame,
    tier_col: str,
    order_cols: list[str],
    weights: dict[str, int],
) -> DataFrame:
    """Assign each row a global deterministic pop position.

    vt = rank_in_tier * (WEIGHT_SCALE / weight[tier]); ties broken by tier
    name then FIFO order. A tier with weight w gets w slots per WEIGHT_SCALE
    of virtual time — the deterministic equivalent of queueSet.js's
    weight-expanded random rotation.
    """
    stride = F.create_map(
        *[x for t, w in weights.items() for x in (F.lit(t), F.lit(WEIGHT_SCALE // w))]
    )
    ranked = df.withColumn("rank_in_tier", _rank_in_tier(tier_col, order_cols))
    vt = F.col("rank_in_tier") * F.element_at(stride, F.col(tier_col))
    out = ranked.withColumn("virtual_time", vt.cast("long"))
    pop_w = Window.orderBy("virtual_time", tier_col, "rank_in_tier")
    return out.withColumn("pop_seq", F.row_number().over(pop_w))


def tier_quota_select(
    df: DataFrame,
    tier_col: str,
    order_cols: list[str],
    quotas: dict[str, int],
) -> DataFrame:
    """Keep the first ``quotas[tier]`` rows per tier in FIFO order."""
    quota_map = F.create_map(
        *[x for t, q in quotas.items() for x in (F.lit(t), F.lit(q))]
    )
    ranked = df.withColumn("rank_in_tier", _rank_in_tier(tier_col, order_cols))
    return ranked.filter(
        F.col("rank_in_tier") <= F.element_at(quota_map, F.col(tier_col))
    )


def host_topk(
    df: DataFrame,
    host_col: str,
    order_cols: list[str],
    k: int | None = None,
    budget_col: str | None = None,
    rank_name: str = "host_rank",
) -> DataFrame:
    """Per-host politeness cap: at most k (or per-row budget) rows per host.

    At scale this is the shuffle that matters: one hash exchange on the host
    key, then a partition-local window sort. Hot hosts are bounded by k, so
    the window never materializes more than it keeps per group beyond the
    sort buffer; AQE skew-split covers pathological hosts.
    """
    w = Window.partitionBy(host_col).orderBy(*[F.col(c) for c in order_cols])
    ranked = df.withColumn(rank_name, F.row_number().over(w))
    if budget_col is not None:
        return ranked.filter(F.col(rank_name) <= F.col(budget_col))
    if k is None:
        raise ValueError("need k or budget_col")
    return ranked.filter(F.col(rank_name) <= F.lit(k))


def backoff_gate(
    df: DataFrame,
    now: Column,
    attempt_col: str = "attempt",
    not_before_col: str = "not_before",
    requeue_delay_s: int = 5,
    max_attempts: int = 5,
) -> DataFrame:
    """Visibility + retry gating (lib/crawler.js:150-154,308-311).

    Rows past max_attempts are tagged ``deadletter``; rows whose backoff
    window (not_before, or attempt*requeue_delay) hasn't elapsed are hidden.
    """
    effective_gate = F.coalesce(
        F.col(not_before_col),
        F.timestamp_seconds(
            F.unix_timestamp(now) + F.col(attempt_col) * requeue_delay_s
        ),
    )
    return df.withColumn(
        "gate_status",
        F.when(F.col(attempt_col) > max_attempts, F.lit("deadletter"))
        .when(effective_gate > now, F.lit("deferred"))
        .otherwise(F.lit("eligible")),
    )


def attenuate(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Intra-batch duplicate-push collapse (AttenuatedQueue analog,
    providers/queuing/attenuatedQueue.js:24-52): keep the FIRST row per key
    in deterministic order. Strictly more deterministic than the reference's
    TTL window — the window IS the batch.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_atten_rn", F.row_number().over(w))
        .filter(F.col("_atten_rn") == 1)
        .drop("_atten_rn")
    )
