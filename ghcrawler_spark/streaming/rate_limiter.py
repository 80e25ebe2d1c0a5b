"""Streaming per-host token-bucket rate limiter — the reference's limiter
semantics (providers/limiting/limiter.js via crawlerFactory's computeLimit,
and the per-(queue,host) throttle windows in lib/crawler.js:441-459) as a
custom STATEFUL Structured-Streaming operator.

The batch engine already enforces politeness per round (J7) and benches
token costs (J6); this is the continuous shape: a stream of fetch requests
keyed by host, where each host carries (tokens, last_refill_ms) state across
micro-batches via ``applyInPandasWithState``. Each event refills the bucket
at ``rate_per_sec`` up to ``burst``, then either spends a token (allowed) or
is marked throttled — the streaming twin of the engine's `Throttled` outcome
(ROUND SPEC v4): routed-to-later rather than dropped.

Design notes for scale:
- State is one tiny struct per host (two scalars), Arrow-batched per group —
  the canonical applyInPandasWithState shape; 10^7 hosts is ~160 MB of state
  across the cluster, far under the state-store budget.
- Decisions inside a batch are ordered by event time (deterministic replay:
  the pytest oracle replays the same schedule in pure Python).
- State TTL (`GroupStateTimeout.ProcessingTimeTimeout`) is deliberately NOT
  used: an idle host's bucket refills to `burst` anyway, so dropping state
  for hosts idle past burst/rate seconds is semantics-free; we instead
  timestamp the state and let a full bucket be reconstructed from absence
  (state.exists == False ⇒ full bucket), which keeps the store bounded by
  RECENTLY-throttled hosts only.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("event_ms", LongType()),
        StructField("allowed", BooleanType()),
        StructField("tokens_after", DoubleType()),
    ]
)

# carry_meta variant: an opaque passthrough column (callers pack whatever
# row attributes they need — e.g. the event front-end packs
# (type, payload_id, verified) as JSON) rides through the stateful op
META_OUTPUT_SCHEMA = StructType(
    list(OUTPUT_SCHEMA.fields) + [StructField("meta", StringType())]
)

STATE_SCHEMA = StructType(
    [
        StructField("tokens", DoubleType()),
        StructField("last_ms", LongType()),
    ]
)


def _bucket_replay(
    rows: pd.DataFrame,
    tokens: float,
    last_ms: int | None,
    rate_per_sec: float,
    burst: float,
) -> tuple[pd.DataFrame, float, int | None]:
    """Deterministic token-bucket replay over event-time-ordered rows.

    Shared by the streaming operator and the test oracle so the pinned
    semantics are the function itself; the streaming test then proves the
    STATE PLUMBING (carry-over across micro-batches) matches a single
    continuous replay."""
    rows = rows.sort_values(["event_ms", "url"], kind="mergesort")
    out_allowed: list[bool] = []
    out_tokens: list[float] = []
    for ms in rows["event_ms"].astype("int64"):
        if last_ms is None:
            last_ms = int(ms)
        # clamp elapsed at zero: rows are event-time ordered WITHIN a batch,
        # but a later micro-batch may deliver an event older than the stored
        # last_ms — a negative refill would silently drive tokens below 0
        # and over-throttle the host. Late rows refill nothing and last_ms
        # never moves backwards (monotone state).
        elapsed_ms = max(0, int(ms) - last_ms)
        tokens = max(
            0.0, min(burst, tokens + elapsed_ms / 1000.0 * rate_per_sec)
        )
        last_ms = max(last_ms, int(ms))
        if tokens >= 1.0:
            tokens -= 1.0
            out_allowed.append(True)
        else:
            out_allowed.append(False)
        out_tokens.append(round(tokens, 9))
    rows = rows.assign(allowed=out_allowed, tokens_after=out_tokens)
    return rows, tokens, last_ms


def host_token_bucket(
    requests: DataFrame,
    rate_per_sec: float = 2.0,
    burst: float = 4.0,
    carry_meta: bool = False,
) -> DataFrame:
    """Apply the stateful limiter to a streaming frame of
    (host string, url string, event_ms long) fetch requests.

    Returns (host, url, event_ms, allowed, tokens_after) in append mode —
    plus the opaque ``meta`` passthrough column when ``carry_meta`` is set
    (the input frame must then carry ``meta`` too). Callers route
    allowed=False rows to the `later` tier exactly like the engine's
    Throttled requeue (lib/crawler.js:441-459 → requeue on the same queue
    with attempt++)."""
    out_cols = ["host", "url", "event_ms", "allowed", "tokens_after"] + (
        ["meta"] if carry_meta else []
    )

    def fn(
        key: tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tokens, last_ms = state.get
        else:
            tokens, last_ms = float(burst), None
        host = key[0]
        for pdf in pdf_iter:
            pdf, tokens, last_ms = _bucket_replay(
                pdf, tokens, last_ms, rate_per_sec, burst
            )
            yield pdf.assign(host=host)[out_cols]
        if last_ms is None:
            # no rows processed: leave the state ABSENT (absent ⇒ full
            # bucket) instead of writing a 0-ms sentinel the next batch
            # would misread as an epoch-old refill anchor
            return
        state.update((float(tokens), int(last_ms)))

    return (
        requests.groupBy("host")
        .applyInPandasWithState(
            fn,
            outputStructType=META_OUTPUT_SCHEMA if carry_meta else OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def replay_oracle(
    rows: list[tuple[str, str, int]],
    rate_per_sec: float = 2.0,
    burst: float = 4.0,
) -> dict[tuple[str, str, int], tuple[bool, float]]:
    """Pure-Python continuous replay (no batch boundaries) for tests."""
    out: dict[tuple[str, str, int], tuple[bool, float]] = {}
    by_host: dict[str, list[tuple[str, str, int]]] = {}
    for r in rows:
        by_host.setdefault(r[0], []).append(r)
    for host, rs in by_host.items():
        pdf = pd.DataFrame(rs, columns=["host", "url", "event_ms"])
        pdf, _, _ = _bucket_replay(pdf, float(burst), None, rate_per_sec, burst)
        for r in pdf.itertuples():
            out[(r.host, r.url, int(r.event_ms))] = (
                bool(r.allowed),
                float(r.tokens_after),
            )
    return out
