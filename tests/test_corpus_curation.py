"""Corpus-curation lane (t4/t5/t6, d8/d9): semantic pins on crafted inputs.

DuckDB hash-parity at sf0.01 is covered by the driver gate / check_parity;
these tests pin the SEMANTICS (what redaction, repetition, chunk sharing and
mixing mean) on small hand-checked documents, which the oracle compare alone
would not catch if both twins drifted together.
"""

from pyspark.sql import functions as F

from ghcrawler_spark.functions import text as T
from ghcrawler_spark.plans import analytics as A


def test_pii_scrub_redacts_all_classes(spark):
    df = spark.createDataFrame(
        [
            ("mail bob.smith@corp.example.org end", 1, 0, 0),
            ("at 192.168.0.1 and 10.0.0.255 now", 0, 2, 0),
            ("call 555-0123 or 555-9999", 0, 0, 2),
            ("clean text only", 0, 0, 0),
            # ip embedded in a longer dotted run still matches the quad
            ("ver 1.2.3.4.5", 0, 1, 0),
        ],
        ["t", "ne", "ni", "np"],
    )
    out = df.select(
        "ne", "ni", "np",
        T.pii_count("t", T.PII_PATTERNS[0][1]).alias("e"),
        T.pii_count("t", T.PII_PATTERNS[1][1]).alias("i"),
        T.pii_count("t", T.PII_PATTERNS[2][1]).alias("p"),
        T.pii_scrub("t").alias("s"),
    ).collect()
    for r in out:
        assert (r.e, r.i, r.p) == (r.ne, r.ni, r.np), r
        assert "@" not in r.s or "<EMAIL>" in r.s
        for _, pat, _repl in T.PII_PATTERNS:
            import re

            assert not re.search(pat, r.s), (pat, r.s)


def test_gopher_metrics_on_crafted_docs(spark):
    # doc a: 'x' 4/8 tokens -> top_tok 0.5; 'x x' appears 3 times among 7
    # 2-grams, distinct 2-grams = {x x, x y, y x, y z, z x} = 5 -> dup 2/7
    rows = spark.createDataFrame(
        [(0, "x x x y x z x y"), (1, "a b c d e f g h")], ["doc_id", "text"]
    )
    toks = rows.select("doc_id", T.tokens("text").alias("t"))
    g = toks.select(
        "doc_id", "t", T.shingles_from_tokens(F.col("t"), 2).alias("g2")
    )
    out = {
        r.doc_id: r
        for r in g.select(
            "doc_id",
            (T.max_multiplicity(F.col("t")) / F.size("t")).alias("tt"),
            (
                F.lit(1.0)
                - F.size(F.array_distinct("g2")) / F.size("g2").cast("double")
            ).alias("d2"),
        ).collect()
    }
    assert abs(out[0].tt - 5 / 8) < 1e-9
    assert abs(out[0].d2 - 2 / 7) < 1e-9
    assert out[1].tt == 1 / 8 and out[1].d2 == 0.0


def test_chunk_dedup_flags_shared_chunks(spark, tmp_path):
    # 12-token docs -> one full 10-token chunk each (stride windows drop the
    # 2-token tail); docs 0 and 1 share their first 10 tokens exactly.
    shared = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (0, shared + " tail0 tail1", "en", "src0", 0),
            (1, shared + " other2 other3", "en", "src1", 0),
            (2, " ".join(f"u{i}" for i in range(12)), "en", "src2", 0),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.doc_id: r
        for r in A.d8_chunk_dedup(spark, str(tmp_path)).collect()
    }
    assert out[0].n_chunks == 1 and out[0].n_shared == 1
    assert out[1].n_shared == 1 and out[2].n_shared == 0
    assert out[0].shared_frac == 1.0


def test_decontaminate_hits_only_benchmark_overlap(spark, tmp_path):
    # doc 0 (doc_id % 50 == 0) is the benchmark; doc 51 copies 4 of its
    # tokens contiguously (one k=4 shingle), doc 52 shares none.
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta", "en", "src0", 0),
            (51, "pre beta gamma delta epsilon post", "en", "src1", 0),
            (52, "one two three four five six", "en", "src2", 0),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = A.d9_decontaminate(spark, str(tmp_path)).collect()
    # benchmark windows: {alpha beta gamma delta, beta gamma delta epsilon,
    # gamma delta epsilon zeta}; doc 51 windows: {pre beta gamma delta,
    # beta gamma delta epsilon, gamma delta epsilon post} -> 1 overlap
    assert {(r.doc_id, r.n_hits) for r in out} == {(51, 1)}


def test_decontaminate_overlap_count_exact(spark, tmp_path):
    # pin the exact distinct-overlap count with a fully worked example
    docs = spark.createDataFrame(
        [
            (0, "a b c d e", "en", "src0", 0),
            (1, "a b c d e", "en", "src1", 0),  # exact copy: windows {abcd, bcde}
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = A.d9_decontaminate(spark, str(tmp_path)).collect()
    assert {(r.doc_id, r.n_hits) for r in out} == {(1, 2)}


def test_domain_mix_rate_and_determinism(spark, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(4000),
            "text": ["t"] * 4000,
            "lang": ["en"] * 4000,
            "source": [f"src{i % 4}" for i in range(4000)],
            "n_chars": [1] * 4000,
        }
    )
    spark.createDataFrame(pdf).write.parquet(f"{tmp_path}/documents.parquet")
    a = A.t6_domain_mix(spark, str(tmp_path)).toPandas()
    b = A.t6_domain_mix(spark, str(tmp_path)).toPandas()
    # deterministic across runs (unlike df.sample)
    assert sorted(a.doc_id) == sorted(b.doc_id)
    got = a.groupby("source").size()
    # src0 -> 2500bp=25%, src1 -> 50%, src2 -> 75%, src3 -> 100% of 1000 each
    assert got["src3"] == 1000
    for src, bp in (("src0", 0.25), ("src1", 0.50), ("src2", 0.75)):
        assert abs(got[src] / 1000 - bp) < 0.05, (src, got[src])
    # inverse-propensity weights rebalance: weighted mass per source equal-ish
    w = a.groupby("source").mix_weight.sum()
    for src in ("src0", "src1", "src2"):
        assert abs(w[src] - 1000) / 1000 < 0.06, (src, w[src])


def test_incremental_dedup_matches_base_only(spark):
    from ghcrawler_spark.operators import dedup as D

    rows = [
        # base corpus
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "one two three four five six seven eight"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),  # near doc 0
        # delta batch
        (9, "alpha beta gamma delta epsilon zeta eta theta"),   # dup of 0 (and 2)
        (19, "totally fresh content nothing shared here at all"),
        (29, "one two three four five six seven eight"),         # dup of 1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    base = docs.filter("doc_id % 10 != 9")
    delta = docs.filter("doc_id % 10 = 9")
    out = {
        r.new_id: (r.dup_of, r.jaccard)
        for r in D.minhash_lsh_incremental(
            base, delta, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    # exact copies rank jaccard=1.0 first, ties broken by lowest base id
    assert out[9][0] == 0 and out[9][1] == 1.0
    assert out[29] == (1, 1.0)
    assert 19 not in out  # fresh doc -> keep-list


def test_knn_join_matches_numpy_within_buckets(spark):
    import numpy as np

    from ghcrawler_spark.functions.vectors import BUCKET_DIMS
    from ghcrawler_spark.operators.similarity import knn_join

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 64)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.qid, r.rnk): (r.vec_id, r.score)
        for r in knn_join(df, k=3).collect()
    }
    # numpy replay: same bucket = same sign pattern on the 1-indexed
    # BUCKET_DIMS dims (sign_bucket uses strict > 0)
    def bucket(v):
        return tuple(v[d - 1] > 0 for d in BUCKET_DIMS)

    v64 = vecs.astype("float64")
    for q in range(40):
        cands = [
            j for j in range(40)
            if j != q and bucket(vecs[j]) == bucket(vecs[q])
        ]
        scored = sorted(
            (
                (
                    -round(
                        float(
                            v64[q] @ v64[j]
                            / (np.linalg.norm(v64[q]) * np.linalg.norm(v64[j]))
                        ),
                        4,
                    ),
                    j,
                )
                for j in cands
            )
        )
        for rnk, (negs, j) in enumerate(scored[:3], start=1):
            assert got[(q, rnk)][0] == j, (q, rnk)


def test_gopher_exploded_twin_equals_array_fold(spark, tmp_path):
    """The long-document explode+groupBy path must produce exactly the
    array-fold metrics (t5) — same ratios, same rounding."""
    import pandas as pd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fold = (
        A.t5_gopher_repetition(spark, "/root/testdata/sf0.001")
        .drop("keep")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exploded = (
        T.repetition_metrics_exploded(docs, "doc_id", "text", k=2)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fold, exploded[fold.columns], check_dtype=False)
