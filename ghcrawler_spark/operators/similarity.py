"""Similarity search over embedding columns (array<float>).

- ``ann_bruteforce``: exact cosine top-k per query — the correctness
  baseline. Query side is broadcast (queries are small); the corpus scan
  streams through one whole-stage-codegen'd projection, then a top-k window
  per query. At 100 TB this is a single corpus pass per query batch.
- ``ann_bucketed``: the scale path — sign-bit bucketing (coordinate
  hyperplanes, functions/vectors.sign_bucket) restricts comparisons to the
  query's bucket: an equi-join on a 4-bit key prunes ~15/16 of the corpus
  before any arithmetic. Recall is partial by construction (LSH); the
  correctness gate compares it against a DuckDB oracle implementing the
  *same* bucketing, so determinism — not recall — is what's pinned.
- ``ann_multiprobe``: the real ANN index shape — 8-bit sign buckets (256
  partitions, each probe scans ~N/256) with Hamming-1 MULTI-PROBE on the
  query side (9 probes/query), recovering the recall the single-bucket
  variant loses to sign flips near hyperplanes. Same determinism contract.
- ``embedding_near_dup_pairs``: all corpus pairs with cosine ≥ τ (exact,
  a<b). The bucketed variant prunes with the same sign-bucket equality.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ghcrawler_spark.functions.vectors import (
    BUCKET_DIMS_8,
    COSINE_ROUND,
    dot,
    multiprobe_buckets,
    norm,
    sign_bucket,
)

# ---------------------------------------------------------------------------
# Vectorized pair scoring (guide §4.2): the quadratic pair generators below
# (near-dup sweep, k-NN join, SemDeDup prune) used to evaluate the
# dot/norm Column folds PER PAIR — Catalyst higher-order functions are
# interpreted per element, so a bucket of B vectors costs ~B²·dim
# interpreted ops (measured ~100x wall growth for 10x rows at sf1.0).
# The kernels here compute the same per-bucket pair scores in numpy with
# BIT-IDENTICAL float semantics, then emit only a conservatively
# pre-filtered candidate set; the FINAL round/threshold/window still runs
# in the JVM on the exact raw doubles, so query results are unchanged.
#
# Bit-exactness: the JVM fold is
#     aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)
# i.e. a strict left-to-right sum of doubles. `_fold_dot_block` performs the
# identical IEEE-754 operations in the identical order (one fused
# vector-of-pairs step per dimension index), so the resulting double — and
# the norm fold in `_fold_norms`, and the final dot/(na*nb) divide — are
# bit-equal to what the previous JVM expression produced for every pair.
# ---------------------------------------------------------------------------

# slack around the 4-dp rounding displacement (<5.1e-5) — candidates whose
# raw score is within this margin of a threshold/cutoff are always emitted,
# so the JVM-side exact round+filter can never lose a qualifying pair
_ROUND_MARGIN = 2e-4
# hash-blocks per bucket: each bucket's pair matrix is split into
# B(B+1)/2 independent cells so the quadratic work spreads over the
# cluster instead of one task per bucket (guide §2.5: deterministic
# synthetic key, never rand())
_PAIR_BLOCKS = 4
# bound on elements per temporary pair-score matrix (~32 MB of doubles)
_PAIR_CHUNK_ELEMS = 1 << 22


def _stack_f64(series: pd.Series) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list<float> column — float32 →
    float64 widening is exact, matching the JVM's cast-before-multiply."""
    return np.stack(
        [np.asarray(x, dtype=np.float32) for x in series.to_numpy()]
    ).astype(np.float64)


def _fold_norms(V: np.ndarray) -> np.ndarray:
    """sqrt of the left-to-right fold of squares — bit-equal to norm()."""
    acc = np.zeros(V.shape[0])
    for i in range(V.shape[1]):
        acc += V[:, i] * V[:, i]
    return np.sqrt(acc)


def _fold_dot_block(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """(nA, nB) pairwise dot matrix via the same left-to-right fold the JVM
    expression uses (NOT matmul — BLAS reassociates the sum)."""
    acc = np.zeros((A.shape[0], B.shape[0]))
    for i in range(A.shape[1]):
        acc += A[:, i, None] * B[None, :, i]
    return acc


def _pair_cell_frame(base: DataFrame, blocks: int = _PAIR_BLOCKS) -> DataFrame:
    """Replicate each row into its pair-cells: row with hash-block b joins
    cell (min(b,c), max(b,c)) for every block c, so each unordered block
    pair lands in exactly one cell and every within-bucket pair is produced
    exactly once across cells. Deterministic key (xxhash64), retry-safe."""
    return (
        base.withColumn(
            "_blk", F.pmod(F.xxhash64(F.col("id")), F.lit(blocks)).cast("int")
        )
        .withColumn("_oth", F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))))
        .withColumn("_ci", F.least("_blk", "_oth"))
        .withColumn("_cj", F.greatest("_blk", "_oth"))
        .drop("_oth")
    )


def _cell_matrices(pdf: pd.DataFrame):
    """Split one pair-cell's rows into the (A, B) sides. Returns
    (ids_a, Va, na, ids_b, Vb, nb, same) or None when no pair exists."""
    if len(pdf) < 2:
        return None
    ci = int(pdf["_ci"].iloc[0])
    cj = int(pdf["_cj"].iloc[0])
    if ci == cj:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        V = _stack_f64(pdf["v"])
        nrm = _fold_norms(V)
        return ids, V, nrm, ids, V, nrm, True
    a_mask = pdf["_blk"].to_numpy() == ci
    pa, pb = pdf[a_mask], pdf[~a_mask]
    if len(pa) == 0 or len(pb) == 0:
        return None
    ids_a = pa["id"].to_numpy(dtype=np.int64)
    ids_b = pb["id"].to_numpy(dtype=np.int64)
    Va, Vb = _stack_f64(pa["v"]), _stack_f64(pb["v"])
    return ids_a, Va, _fold_norms(Va), ids_b, Vb, _fold_norms(Vb), False


def _make_assign_scores_fn(cent_sorted: list):
    """mapInPandas kernel: raw cosine of every row against every centroid
    (ordered by cid asc), via the fold-exact matrix ops — the JVM argmax
    fold over (round(score), cid) structs then assigns the cluster."""

    def fn(batches):
        C = np.stack(
            [np.asarray(v, dtype=np.float32) for _, v in cent_sorted]
        ).astype(np.float64)
        cn = _fold_norms(C)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _stack_f64(pdf["_v"])
            vn = _fold_norms(V)
            with np.errstate(divide="ignore", invalid="ignore"):
                S = _fold_dot_block(V, C)
                S /= vn[:, None] * cn[None, :]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "_v": pdf["_v"].to_numpy(),
                    "_scores": list(S),
                }
            )

    return fn


def _make_threshold_pair_fn(threshold: float):
    """applyInPandas kernel: emit (id_a < id_b, raw) for every pair whose
    raw cosine could still round to >= threshold (margin-conservative; NaN
    kept so the JVM filter decides exactly like the old plan did)."""
    cut = threshold - _ROUND_MARGIN

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "raw": pd.Series(dtype="float64")})
        mats = _cell_matrices(pdf)
        if mats is None:
            return empty
        ids_a, Va, na, ids_b, Vb, nb, same = mats
        out_a, out_b, out_raw = [], [], []
        step = max(1, _PAIR_CHUNK_ELEMS // max(1, len(ids_b)))
        for s in range(0, len(ids_a), step):
            e = min(s + step, len(ids_a))
            with np.errstate(divide="ignore", invalid="ignore"):
                S = _fold_dot_block(Va[s:e], Vb)
                S /= na[s:e, None] * nb[None, :]
            keep = (S >= cut) | np.isnan(S)
            # pair orientation is id order; within one block only i<j
            lo = ids_a[s:e, None] < ids_b[None, :]
            keep &= lo | ((~lo) & (ids_a[s:e, None] != ids_b[None, :]))
            if same:
                keep &= lo
            ii, jj = np.nonzero(keep)
            if len(ii):
                ai, bj = ids_a[s + ii], ids_b[jj]
                out_a.append(np.minimum(ai, bj))
                out_b.append(np.maximum(ai, bj))
                out_raw.append(S[ii, jj])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "raw": np.concatenate(out_raw),
            }
        )

    return fn


def _topk_emit(ids_q, S, ids_c, k, self_mask=None):
    """Per-query candidate emission for one direction of a pair cell: keep
    every candidate whose raw score is within _ROUND_MARGIN of the cell's
    k-th best (NaN kept — the JVM window owns NaN ordering semantics)."""
    rank = np.where(np.isnan(S), np.inf, S)
    if self_mask is not None:
        rank = np.where(self_mask, -np.inf, rank)
    nc = rank.shape[1]
    if nc > k:
        kth = -np.partition(-rank, k - 1, axis=1)[:, k - 1]
        cutoff = kth - _ROUND_MARGIN
    else:
        cutoff = np.full(rank.shape[0], -np.inf)
    keep = rank >= cutoff[:, None]
    if self_mask is not None:
        keep &= ~self_mask
    ii, jj = np.nonzero(keep)
    return ids_q[ii], ids_c[jj], S[ii, jj]


def _make_topk_pair_fn(k: int):
    """applyInPandas kernel for the k-NN join: per query id in the cell,
    emit its plausible top-k candidates (margin keeps every pair the exact
    rounded ordering could select); the JVM window does the exact ranking."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"qid": pd.Series(dtype="int64"),
                              "vec_id": pd.Series(dtype="int64"),
                              "raw": pd.Series(dtype="float64")})
        mats = _cell_matrices(pdf)
        if mats is None:
            return empty
        ids_a, Va, na, ids_b, Vb, nb, same = mats
        out_q, out_c, out_raw = [], [], []
        step = max(1, _PAIR_CHUNK_ELEMS // max(1, len(ids_b)))
        for s in range(0, len(ids_a), step):
            e = min(s + step, len(ids_a))
            with np.errstate(divide="ignore", invalid="ignore"):
                S = _fold_dot_block(Va[s:e], Vb)
                S /= na[s:e, None] * nb[None, :]
            self_mask = (
                (ids_a[s:e, None] == ids_b[None, :]) if same else None
            )
            q, c, r = _topk_emit(ids_a[s:e], S, ids_b, k, self_mask)
            out_q.append(q); out_c.append(c); out_raw.append(r)
            if not same:
                # reverse direction: block-j rows querying block-i rows
                q, c, r = _topk_emit(ids_b, S[:, :].T, ids_a[s:e], k)
                out_q.append(q); out_c.append(c); out_raw.append(r)
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "qid": np.concatenate(out_q),
                "vec_id": np.concatenate(out_c),
                "raw": np.concatenate(out_raw),
            }
        )

    return fn


def ann_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query. Output: (qid, vec_id, score, rnk)."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_vn"),
    )
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(query_vec_col).alias("_q"),
        norm(F.col(query_vec_col)).alias("_qn"),
    )
    scored = c.join(F.broadcast(q)).withColumn(
        "score",
        F.round(dot(F.col("_v"), F.col("_q")) / (F.col("_vn") * F.col("_qn")), COSINE_ROUND),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", "score", "rnk")
    )


def ann_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    k: int = 5,
) -> DataFrame:
    """Sign-bucket LSH top-k: compare only within the query's bucket."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_vn"),
        sign_bucket(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(query_vec_col).alias("_q"),
        norm(F.col(query_vec_col)).alias("_qn"),
        sign_bucket(F.col(query_vec_col)).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "score",
        F.round(dot(F.col("_v"), F.col("_q")) / (F.col("_vn") * F.col("_qn")), COSINE_ROUND),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", "score", "rnk")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bucketed: bool = False,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine ≥ threshold.

    ``bucketed=True`` adds the sign-bucket equality predicate — at scale the
    cross-join becomes a per-bucket join (each bucket ~N/16), the standard
    blocking trick for embedding near-dup sweeps.

    Pair scoring runs in the vectorized numpy kernel (bit-identical fold
    order — see module header): each bucket is split into hash-block pair
    cells, every cell streams through applyInPandas emitting only
    margin-conservative candidates, and the exact round+threshold runs in
    the JVM — so the output is identical to the old per-pair Column fold,
    at BLAS-adjacent speed instead of interpreted-HOF-per-pair speed.
    """
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
    )
    if bucketed:
        base = base.withColumn("bucket", sign_bucket(F.col("v")))
        keys = ["bucket", "_ci", "_cj"]
        blocks = _PAIR_BLOCKS
    else:
        # all-pairs sweep: no bucket key — more cells so the single "bucket"
        # still spreads over the cluster
        keys = ["_ci", "_cj"]
        blocks = 2 * _PAIR_BLOCKS
    cells = _pair_cell_frame(base, blocks)
    cand = cells.groupBy(*keys).applyInPandas(
        _make_threshold_pair_fn(threshold),
        "id_a long, id_b long, raw double",
    )
    return (
        cand.withColumn("score", F.round(F.col("raw"), COSINE_ROUND))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def knn_join(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Corpus-vs-corpus k-NN join: every vector's top-k neighbors among the
    vectors sharing its sign bucket (self excluded).

    The retrieval-side sibling of embedding_near_dup_pairs: near-dup wants
    ALL pairs over a threshold, k-NN join wants the BEST k per vector
    (similar-document mining, hard-negative sampling). Blocking by sign
    bucket turns the quadratic self-join into per-bucket joins (~N/16 rows
    each); the ranking window partitions by the query vector, so no global
    sort exists anywhere. Output: (qid, vec_id, score, rnk).

    Pair scoring runs in the vectorized numpy kernel (bit-identical fold
    order — module header): per pair cell, each query keeps only candidates
    within _ROUND_MARGIN of its cell-local k-th best raw score (a superset
    of the exact rounded top-k by construction); the exact round + ranking
    window then run in the JVM over this small candidate set."""
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_bucket(F.col(vec_col)).alias("bucket"),
    )
    cells = _pair_cell_frame(base)
    cand = cells.groupBy("bucket", "_ci", "_cj").applyInPandas(
        _make_topk_pair_fn(k), "qid long, vec_id long, raw double"
    )
    scored = cand.select(
        "qid", "vec_id", F.round(F.col("raw"), COSINE_ROUND).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", "score", "rnk")
    )


def centroid_array(centroids: list) -> Column:
    """A LITERAL array<struct<cid,cv>> of (cid, [float,...]) centroids —
    nlist entries embedded straight into the plan so assignment needs no
    join (and therefore no shuffle) at any corpus size.

    Built as ONE SQL expression string parsed JVM-side: the per-element
    Column API (F.lit per float) costs a py4j round-trip per literal —
    nlist×dim of them put SECONDS of driver latency into plan construction
    before a single task runs. Python float repr round-trips exactly, and
    CAST(<repr> AS FLOAT) lands on the identical float32, so values are
    bit-equal to the old form (and to the DuckDB oracle's).

    Each struct also carries ``cvn`` — the centroid's norm precomputed
    driver-side with the exact same left-to-right double fold the norm()
    Column performs (Python floats ARE IEEE doubles, math.sqrt is correctly
    rounded like Math.sqrt), so per-row folds no longer re-derive every
    centroid norm per vector (guide §2.3: don't compute what you can hoist).
    """
    def _f32(x) -> str:
        x = float(x)
        # repr(nan)/repr(inf) are not SQL literals (they'd parse as column
        # refs); Spark casts the STRINGS 'NaN'/'Infinity' to float fine, so
        # degenerate centroids (e.g. from a zero-norm embedding) still build
        if x != x:
            return "CAST('NaN' AS FLOAT)"
        if x == float("inf"):
            return "CAST('Infinity' AS FLOAT)"
        if x == float("-inf"):
            return "CAST('-Infinity' AS FLOAT)"
        return f"CAST({x!r} AS FLOAT)"

    def _f64(x: float) -> str:
        if x != x:
            return "CAST('NaN' AS DOUBLE)"
        if x == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if x == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return f"CAST({x!r} AS DOUBLE)"

    parts = []
    for cid, vec in centroids:
        arr = ", ".join(_f32(x) for x in vec)
        parts.append(
            f"named_struct('cid', {int(cid)}, 'cv', array({arr}), "
            f"'cvn', {_f64(_py_norm(vec))})"
        )
    return F.expr("array(" + ", ".join(parts) + ")")


def _py_norm(vec) -> float:
    """Driver-side twin of the norm() fold: float32-quantize each element
    (centroid literals are CAST(... AS FLOAT)), then the identical
    left-to-right double square-sum + sqrt."""
    acc = 0.0
    for x in vec:
        d = float(np.float32(x))
        acc += d * d
    return math.sqrt(acc)


def nearest_centroid(
    cent_arr: Column, vec: Column, vec_norm: Column | None = None
) -> Column:
    """Map-only nearest-centroid assignment: fold over the literal centroid
    array keeping the best (rounded-cosine desc, cid asc) — the
    deterministic tie-break both Spark and the SQL oracle share.

    Pass ``vec_norm`` as a PROJECTED column to evaluate the vector's norm
    fold once per row instead of once per centroid (higher-order lambdas
    are re-evaluated per element and never CSE'd); centroid norms come
    precomputed from the ``cvn`` literal (centroid_array). Both hoists are
    bit-exact — the same fold yields the same double wherever it runs.

    Degenerate input (zero-norm embedding or centroid) scores NaN via the
    double division; NaN loses every fold comparison, so such a vector
    keeps the fold seed. Validate/drop zero-norm vectors upstream if they
    can occur."""
    vn = vec_norm if vec_norm is not None else norm(vec)
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.round(
                dot(vec, c["cv"]) / (vn * c["cvn"]),
                COSINE_ROUND,
            ).alias("s"),
            c["cid"].alias("cid"),
        ),
    )
    return F.aggregate(
        scored,
        F.struct(F.lit(-2.0).alias("s"), F.lit(-1).alias("cid")),
        lambda acc, x: F.when(
            (x["s"] > acc["s"]) | ((x["s"] == acc["s"]) & (x["cid"] < acc["cid"])),
            x,
        ).otherwise(acc),
    )["cid"]


def semantic_dedup(
    corpus: DataFrame,
    centroids: list,
    eps: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    cluster the embedding space, then prune near-duplicates WITHIN each
    cluster only — the clustering is what turns the O(N²) all-pairs cosine
    into per-cluster joins, exactly the trick the paper uses at LAION scale.

    Spark shape: nearest-centroid assignment is the same map-only literal-
    array fold as IVF (no shuffle); the within-cluster pair generation is a
    single equi-join on ``cid`` (each vector shuffles ONCE, partitioned by
    cluster); a vector is dropped when a LOWER-id vector in its cluster has
    rounded cosine ≥ ``eps`` (the paper keeps one representative per
    epsilon-ball; lowest id is the deterministic choice both engines agree
    on). Returns every input id with (cid, kept).

    At 10^10 rows the quadratic term is bounded by the largest cluster —
    real deployments size nlist so clusters hold ~10^4-10^5 vectors, and the
    equi-join's per-cluster work stays in one task's memory.

    Execution shape (round 6): the nearest-centroid scores are computed in
    a shuffle-free mapInPandas pass (one fold-exact numpy matrix op per
    Arrow batch instead of nlist interpreted dot folds per row); the JVM
    picks the argmax over the (rounded score, cid) structs with the same
    tie-break fold as before. The within-cluster prune runs through the
    vectorized threshold kernel per (cid, pair-cell) group, and the exact
    round + eps filter stays in the JVM — results are bit-identical to the
    old per-pair Column-fold plan."""
    cent_sorted = sorted(
        ((int(c), [float(x) for x in v]) for c, v in centroids),
        key=lambda t: t[0],
    )
    cid_arr = F.expr(
        "array(" + ", ".join(str(c) for c, _ in cent_sorted) + ")"
    )
    scored_df = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    ).mapInPandas(
        _make_assign_scores_fn(cent_sorted),
        "vec_id long, _v array<float>, _scores array<double>",
    )
    best = F.aggregate(
        F.zip_with(
            cid_arr,
            F.col("_scores"),
            lambda c, s: F.struct(
                F.round(s, COSINE_ROUND).alias("s"), c.alias("cid")
            ),
        ),
        F.struct(F.lit(-2.0).alias("s"), F.lit(-1).alias("cid")),
        lambda acc, x: F.when(
            (x["s"] > acc["s"]) | ((x["s"] == acc["s"]) & (x["cid"] < acc["cid"])),
            x,
        ).otherwise(acc),
    )["cid"]
    a = scored_df.select("vec_id", "_v", best.alias("cid"))
    # cut the lineage: `a` feeds both the pair prune and the final join —
    # one eager materialization keeps the assignment pass single-shot.
    a = a.localCheckpoint(eager=True)
    cells = _pair_cell_frame(
        a.select(F.col("vec_id").alias("id"), F.col("_v").alias("v"), "cid")
    )
    cand = cells.groupBy("cid", "_ci", "_cj").applyInPandas(
        _make_threshold_pair_fn(eps), "id_a long, id_b long, raw double"
    )
    dropped = (
        cand.filter(F.round(F.col("raw"), COSINE_ROUND) >= eps)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        a.join(dropped.withColumn("_drop", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
        )
    )


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-flat ANN: assign every corpus vector to its nearest CENTROID
    (the inverted-file partition key), then scan only the query's ``nprobe``
    nearest lists. ``centroids`` is a plain list of (cid, [float, ...]) —
    nlist entries, collected driver-side by the caller (nlist rows, the same
    scalar-scale collect the engine allows for manifests; real deployments
    refine them with Lloyd iterations of the very assignment expression used
    here — sampled centroids ARE k-means iteration 0).

    Scale shape: assignment is a MAP-ONLY fold over a literal centroid array
    (no join, no row blow-up, no shuffle — at 10^10 rows the corpus is
    assigned in one codegen'd pass); the probe is an equi-join on ``cid``
    against ``nprobe`` broadcast probe rows per query, so each query touches
    ~nprobe/nlist of the corpus. Assignment ties (4dp-rounded cosine) break
    on the smaller cid, keeping Spark and the SQL oracle deterministic.
    """
    cent_arr = centroid_array(centroids)

    # norm folds hoisted into their own projection (once per row, not once
    # per centroid — lambda bodies are re-evaluated per element); centroid
    # norms come from the precomputed cvn literal. Bit-exact either way.
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_vn"),
    ).select(
        "vec_id",
        "_v",
        "_vn",
        nearest_centroid(cent_arr, F.col("_v"), F.col("_vn")).alias("cid"),
    )
    probes = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(query_vec_col).alias("_q"),
        norm(F.col(query_vec_col)).alias("_qn"),
    ).select(
        "qid",
        "_q",
        "_qn",
        F.explode(
            F.slice(
                F.array_sort(
                    F.transform(
                        cent_arr,
                        lambda cc: F.struct(
                            (-F.round(
                                dot(F.col("_q"), cc["cv"])
                                / (F.col("_qn") * cc["cvn"]),
                                COSINE_ROUND,
                            )).alias("negs"),
                            cc["cid"].alias("cid"),
                        ),
                    )
                ),
                1,
                nprobe,
            )["cid"]
        ).alias("cid"),
    )
    scored = c.join(F.broadcast(probes), "cid").withColumn(
        "score",
        F.round(dot(F.col("_v"), F.col("_q")) / (F.col("_vn") * F.col("_qn")), COSINE_ROUND),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", "score", "rnk")
    )


def ann_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    k: int = 5,
    dims: tuple = BUCKET_DIMS_8,
) -> DataFrame:
    """Multi-probe LSH top-k: 2^|dims| sign buckets; each query probes its
    own bucket plus every Hamming-1 neighbor (one flipped sign bit). At scale
    this is an equi-join of the corpus (partitioned once by bucket) against
    an exploded probe list — |probes|·N/2^|dims| candidate rows per query
    instead of N, with recall far above the single-bucket join."""
    n_bits = len(dims)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_vn"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(query_vec_col).alias("_q"),
        norm(F.col(query_vec_col)).alias("_qn"),
        F.explode(
            multiprobe_buckets(sign_bucket(F.col(query_vec_col), dims), n_bits)
        ).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "score",
        F.round(dot(F.col("_v"), F.col("_q")) / (F.col("_vn") * F.col("_qn")), COSINE_ROUND),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", "score", "rnk")
    )
