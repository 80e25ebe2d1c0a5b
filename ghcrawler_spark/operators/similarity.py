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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ghcrawler_spark.functions.vectors import (
    BUCKET_DIMS_8,
    COSINE_ROUND,
    dot,
    multiprobe_buckets,
    norm,
    sign_bucket,
)


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
    """
    # Precompute each row's norm ONCE before the pair join: the per-pair work
    # drops to a single dot fold (~3x). Exact-parity-safe: a norm fold over
    # the same array yields the identical double wherever it's evaluated.
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),
    )
    if bucketed:
        base = base.withColumn("bucket", sign_bucket(F.col("v")))
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if bucketed:
        cond = cond & (F.col("a.bucket") == F.col("b.bucket"))
    return (
        a.join(b, cond)
        .withColumn(
            "score",
            F.round(
                dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
                COSINE_ROUND,
            ),
        )
        .filter(F.col("score") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("score").alias("score"),
        )
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
    sort exists anywhere. Output: (qid, vec_id, score, rnk)."""
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),
        sign_bucket(F.col(vec_col)).alias("bucket"),
    )
    a = base.alias("a")
    b = base.alias("b")
    scored = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") != F.col("b.id")))
        .select(
            F.col("a.id").alias("qid"),
            F.col("b.id").alias("vec_id"),
            F.round(
                dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
                COSINE_ROUND,
            ).alias("score"),
        )
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
    bit-equal to the old form (and to the DuckDB oracle's)."""
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

    parts = []
    for cid, vec in centroids:
        arr = ", ".join(_f32(x) for x in vec)
        parts.append(
            f"named_struct('cid', {int(cid)}, 'cv', array({arr}))"
        )
    return F.expr("array(" + ", ".join(parts) + ")")


def nearest_centroid(cent_arr: Column, vec: Column) -> Column:
    """Map-only nearest-centroid assignment: fold over the literal centroid
    array keeping the best (rounded-cosine desc, cid asc) — the
    deterministic tie-break both Spark and the SQL oracle share.

    Degenerate input fails LOUDLY: a zero-norm embedding (or centroid)
    divides by zero, which under Spark's default ANSI mode raises
    DIVIDE_BY_ZERO instead of silently mis-clustering the vector (the
    DuckDB oracle would score it NaN and park it in the lowest cid — a
    divergence this operator refuses to paper over). Validate/drop
    zero-norm vectors upstream if they can occur."""
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.round(
                dot(vec, c["cv"]) / (norm(vec) * norm(c["cv"])),
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
    equi-join's per-cluster work stays in one task's memory."""
    cent_arr = centroid_array(centroids)
    a = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        nearest_centroid(cent_arr, F.col(vec_col)).alias("cid"),
    )
    # cut the lineage: the nlist×dim literal centroid array is a ~10^3-node
    # expression tree and `a` appears three times below — without the cut
    # Catalyst re-analyzes the tree per occurrence (seconds of DRIVER time
    # dwarfing the sub-second execution), and the fold itself would
    # recompute per branch. One eager materialization fixes both.
    a = a.localCheckpoint(eager=True)
    lhs = a.select(
        F.col("vec_id").alias("_id_hi"), F.col("_v").alias("_v_hi"), "cid"
    )
    rhs = a.select(
        F.col("vec_id").alias("_id_lo"), F.col("_v").alias("_v_lo"), "cid"
    )
    dropped = (
        lhs.join(rhs, "cid")
        .filter(F.col("_id_lo") < F.col("_id_hi"))
        .filter(
            F.round(
                dot(F.col("_v_hi"), F.col("_v_lo"))
                / (norm(F.col("_v_hi")) * norm(F.col("_v_lo"))),
                COSINE_ROUND,
            )
            >= eps
        )
        .select(F.col("_id_hi").alias("vec_id"))
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
    _nearest = lambda vc: nearest_centroid(cent_arr, vc)  # noqa: E731

    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_vn"),
        _nearest(F.col(vec_col)).alias("cid"),
    )
    probes = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(query_vec_col).alias("_q"),
        norm(F.col(query_vec_col)).alias("_qn"),
        F.explode(
            F.slice(
                F.array_sort(
                    F.transform(
                        cent_arr,
                        lambda cc: F.struct(
                            (-F.round(
                                dot(F.col(query_vec_col), cc["cv"])
                                / (norm(F.col(query_vec_col)) * norm(cc["cv"])),
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
