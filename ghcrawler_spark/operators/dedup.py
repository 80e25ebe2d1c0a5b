"""Deduplication operators for training-data pipelines.

Five flavors over a (id, text) document table, all expressed as DataFrame
plans with zero Python UDFs (md5-derived hashes keep the DuckDB oracle
exact):

- exact:           hash-groupBy on the full text
- n-gram Jaccard:  shingle self-join, exact set overlap ≥ τ
- MinHash + LSH:   k minhashes → b bands → band-bucket join → verify Jaccard
- SimHash:         per-bit majority over token hashes → banded Hamming ≤ d
- embedding cosine near-dup: see operators/similarity.py

Scale notes: the naive all-pairs Jaccard join explodes on common shingles;
MinHash-LSH replaces it with a band-key equi-join whose output is only the
candidate set (collision probability (1-(1-j^r)^b)). SimHash's byte-band
pigeonhole does the same for Hamming distance. Both candidate joins shuffle
on short fixed-width keys and verify only survivors — the same
filter-then-confirm shape as the Bloom seen-set probe (SURVEY.md J1).

Dedup analog in the reference: the request tracker + attenuation collapse
duplicate URLs (providers/queuing/redisRequestTracker.js:17-53,
attenuatedQueue.js:24-52); here the same idea applied to document CONTENT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ghcrawler_spark.functions.text import tokens
from ghcrawler_spark.hashing import minhash_base, minhash_member, stable_long_hash

MINHASH_FUNCS = 12
MINHASH_BANDS = 4  # 4 bands x 3 rows
SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # byte bands


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: one row per distinct text hash → (text_hash, keep_id,
    dup_count). keep_id = smallest id (deterministic winner)."""
    return (
        df.select(stable_long_hash(text_col).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _doc_shingles_raw(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) pairs WITH duplicates (callers dedup on whatever key
    they shuffle on).

    The token array is materialized in its own projection BEFORE the shingle
    window expression: higher-order functions are not common-subexpression-
    eliminated, so inlining tokens() into the per-position slice lambda
    re-splits the whole text once per shingle position — O(len²) per doc
    (measured 5-7s for 5k docs at sf0.1; ~0.5s with the split hoisted)."""
    toks = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("_toks"))
    windowed = F.transform(
        F.sequence(F.lit(1), F.size("_toks") - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, k)),
    )
    sh = F.when(F.size("_toks") >= k, windowed).otherwise(
        F.array(F.concat_ws(" ", F.col("_toks")))
    )
    return toks.select("doc", F.explode(sh).alias("shingle"))


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) distinct pairs."""
    return _doc_shingles_raw(df, id_col, text_col, k).distinct()


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, threshold: float = 0.8
) -> DataFrame:
    """All pairs with token-k-gram Jaccard ≥ threshold.

    |A∩B| from the shingle self-join; |A∪B| = |A|+|B|-|A∩B|. Exact (the
    oracle for the approximate flavors). Output: (id_a, id_b, jaccard).
    """
    sh = _doc_shingles(df, id_col, text_col, k)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = MINHASH_FUNCS,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc, mh_0..mh_{n-1}) — universal-hash MinHash family.

    ONE md5-derived base hash per shingle (hoisted into its own projection so
    Catalyst doesn't re-evaluate it per family member), then ``num_hashes``
    affine transforms mod 2^31-1 — pure codegen'd integer math, k× cheaper
    than k independent digests and still DuckDB-exact. Pass ``shingles``
    (a (doc, shingle) frame, e.g. cached) to skip re-shingling."""
    sh = (
        shingles if shingles is not None else _doc_shingles(df, id_col, text_col, k)
    ).withColumn("_h", minhash_base(F.col("shingle")))
    aggs = [
        F.min(minhash_member(F.col("_h"), i)).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc").agg(*aggs)


def _array_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int, num_hashes: int
) -> DataFrame:
    """(doc, hs, n_sh, mh_0..mh_{n-1}) — the shuffle-free array-signature
    frame shared by batch and incremental MinHash-LSH.

    Map-only: token array HOISTED into its own projection (higher-order
    functions are not CSE'd — inlining tokens() into the slice lambda
    re-splits the text once per shingle position, O(len²) per doc); the
    distinct 31-bit minhash_base hash array `hs` stands in for the shingle
    strings (the d3/d10 oracles hash their shingles with the SAME family,
    so verify-stage parity is exact by construction — not merely
    collision-improbable) and
    is likewise hoisted before the family transforms — the k array_min
    members each re-walk the array, so referencing the raw expression would
    re-shingle + re-hash the doc once PER MEMBER."""
    toks = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("_toks"))
    sh_strs = F.when(
        F.size("_toks") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", F.col("_toks"))))
    arr = toks.select(
        "doc",
        F.array_distinct(F.transform(sh_strs, lambda s: minhash_base(s))).alias(
            "hs"
        ),
    )
    return arr.select(
        "doc",
        "hs",
        F.size("hs").alias("n_sh"),
        *[
            F.array_min(
                F.transform(F.col("hs"), lambda h: minhash_member(h, i))
            ).alias(f"mh_{i}")
            for i in range(num_hashes)
        ],
    )


def _band_frame(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc, band, bkey) — LSH band keys from a signature frame."""
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        members = [F.col(f"mh_{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *members)).alias("bkey"),
            )
        )
    return sigs.select(
        F.col("doc"), F.explode(F.array(*band_cols)).alias("bd")
    ).select("doc", F.col("bd.band").alias("band"), F.col("bd.bkey").alias("bkey"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = MINHASH_FUNCS,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.5,
    persisted: list | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact Jaccard ≥ threshold.

    Banding: num_hashes/bands rows per band; band key = md5 of the
    concatenated row minhashes. Candidates = pairs sharing ≥1 band key.
    Output: (id_a, id_b, jaccard) — only LSH candidates that verify.

    Cache discipline: pass ``persisted`` (a list) to receive the interim
    cached frame and unpersist it yourself after materializing the result;
    with ``persisted=None`` the result is eagerly materialized (it is tiny —
    verified near-dup pairs) and the cache is released before returning.

    Plan shape (SHUFFLE-FREE signatures): the per-doc shingle set is built
    as an ARRAY column with higher-order functions — tokens → windowed
    shingles → md5-derived base hash → array_distinct — and the k family
    members are array_min over affine transforms of that one array. That is
    a map-only projection over the corpus scan: no explode, no distinct
    exchange, no groupBy — the classic explode+groupBy MinHash pays two
    full-corpus shuffles for the same numbers. Only the (tiny) banded
    signature rows ever shuffle (the LSH bucket self-join). Verification is
    array_intersect over the two cached shingle-hash arrays of each
    CANDIDATE pair — candidates reach the arrays through broadcast joins
    (cand is bounded by LSH selectivity), so the corpus is never exchanged:
    the whole query's shuffle volume is O(docs × bands) band keys.
    """
    rows = num_hashes // bands
    if threshold <= 0:
        raise ValueError("minhash_lsh_pairs needs threshold > 0")
    sigs = _array_signatures(df, id_col, text_col, k, num_hashes).persist()
    banded = _band_frame(sigs, num_hashes, bands)
    # Candidate pairs via ONE groupBy on the band key instead of a
    # banded-self-join: the join shape exchanges the banded rows TWICE (once
    # per side) and hash-probes; the bucket-grouped shape exchanges them
    # once, then emits each bucket's doc pairs with two generators.
    # posexplode + slice keeps per-row memory O(bucket size), not
    # O(bucket²): a bucket of B docs streams B rows each carrying one
    # B-element array (same quadratic OUTPUT as the join — LSH banding
    # bounds B by design; a mega-bucket means the band is uninformative and
    # hurts either shape equally). Measured 2.1s → 0.8s warm at sf0.1.
    buckets = (
        banded.groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_list("doc")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    cand = (
        buckets.select("ds", F.posexplode("ds").alias("i", "id_a"))
        .select(
            "id_a",
            F.explode(F.slice("ds", F.col("i") + 2, F.size("ds"))).alias("id_b"),
        )
        .distinct()
    )
    # Verify ONLY the LSH candidates, never an all-pairs shingle self-join.
    # Broadcast carries BARE ID PAIRS only (16-byte rows): each half is a
    # map-side broadcast join against the cached sigs (the corpus frame
    # never exchanges), and the two candidate-bounded halves meet in one
    # equi-join on id_b — the shingle arrays travel executor-to-executor
    # ∝ candidate count, never through a driver broadcast (whose bytes would
    # otherwise be O(candidates × shingles-per-doc), unbounded by any gate).
    cand = cand.persist()  # two broadcast builds read it; computed once
    if persisted is not None:
        persisted.append(cand)
    a_half = sigs.select(
        F.col("doc").alias("id_a"),
        F.col("hs").alias("hs_a"),
        F.col("n_sh").alias("n_a"),
    ).join(F.broadcast(cand), "id_a")
    b_half = sigs.select(
        F.col("doc").alias("id_b"),
        F.col("hs").alias("hs_b"),
        F.col("n_sh").alias("n_b"),
    ).join(F.broadcast(cand.select("id_b")), "id_b", "left_semi")
    pairs = a_half.hint("shuffle_hash").join(b_half, "id_b")
    out = (
        pairs.withColumn("n_inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if persisted is not None:
        # caller discipline (engine pattern): caller materializes the result
        # and unpersists everything in the list
        persisted.append(sigs)
        return out
    # one-shot callers: materialize the (tiny) verified-pairs result into a
    # localCheckpoint, then RELEASE the cache — no executor storage outlives
    # the call beyond the few output rows.
    #
    # The materialization runs with AQE disabled and a small fixed shuffle
    # width: every shuffle in this plan is KB-scale (band keys + candidate
    # ids), so AQE's one-scheduled-job-per-query-stage costs more wall time
    # than its runtime re-planning can ever recover here (measured ~0.6s of
    # pure job-scheduling latency at sf0.1 — the plan itself is unchanged).
    # Session conf is restored before returning; at real corpus scale the
    # caller-managed `persisted` path leaves AQE on (skew/coalesce matter
    # when the band-bucket shuffle is TBs).
    #
    # CONCURRENCY NOTE: these overrides are session-global for the duration
    # of the materialization — a query racing on the SAME SparkSession from
    # another thread would observe them mid-flight. The one-shot path is for
    # single-threaded callers (bench/oracle queries); concurrent pipelines
    # must use the `persisted` path, which never touches session conf.
    spark = df.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions", "32")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    sigs.unpersist()
    cand.unpersist()
    return out


def minhash_lsh_incremental(
    base: DataFrame,
    delta: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = MINHASH_FUNCS,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.5,
    materialize: bool = True,
    persisted: list | None = None,
) -> DataFrame:
    """Incremental-ingest dedup: new `delta` documents checked against the
    existing `base` corpus — the daily-increment shape of a training-data
    pipeline, where re-running all-corpus LSH per batch would be O(corpus)
    instead of O(batch).

    Returns (new_id, dup_of, jaccard): each delta document's BEST matching
    base document at exact Jaccard ≥ threshold (rank by jaccard desc then
    dup_of asc — deterministic). Delta docs with no match are absent (they
    are the keep-list).

    Scale shape: the base corpus side NEVER exchanges — delta band keys are
    broadcast into the base band stream (in production the base band table
    is the persisted index, so the per-batch cost is one scan of the band
    index, not of the corpus text), candidate pairs are broadcast back
    against the two signature frames, and only candidate rows carry arrays.
    The window ranks within one delta doc's matches (bounded by LSH
    selectivity), never globally."""
    sig_d = _array_signatures(delta, id_col, text_col, k, num_hashes).persist()
    if persisted is not None:
        persisted.append(sig_d)
    sig_b = _array_signatures(base, id_col, text_col, k, num_hashes)
    bands_d = _band_frame(sig_d, num_hashes, bands).select(
        F.col("doc").alias("new_id"), "band", "bkey"
    )
    bands_b = _band_frame(sig_b, num_hashes, bands)
    cand = (
        bands_b.join(F.broadcast(bands_d), ["band", "bkey"])
        .select(F.col("doc").alias("dup_of"), "new_id")
        .distinct()
        .persist()  # two broadcast builds below read it; computed once
    )
    if persisted is not None:
        persisted.append(cand)
    # same verify shape as minhash_lsh_pairs: broadcast only the BARE id
    # pairs; both halves are map-side joins against the signature frames
    # (the base corpus never exchanges as a whole — only its candidate rows,
    # bounded by LSH collisions, carry arrays into the final equi-join)
    d_half = sig_d.select(
        F.col("doc").alias("new_id"),
        F.col("hs").alias("hs_n"),
        F.col("n_sh").alias("n_n"),
    ).join(F.broadcast(cand), "new_id")
    # verify-side base signatures are RE-DERIVED over candidate docs only
    # (semi-join the raw text first, shingle after): the full-corpus
    # signature pass happens exactly once (the band-index scan above) —
    # shingling 10^10 base docs twice per batch would double the dominant
    # cost; shingling the LSH-collision-bounded candidate set is O(batch)
    b_half = _array_signatures(
        base.join(
            F.broadcast(
                cand.select(F.col("dup_of").alias(id_col)).distinct()
            ),
            id_col,
            "left_semi",
        ),
        id_col,
        text_col,
        k,
        num_hashes,
    ).select(
        F.col("doc").alias("dup_of"),
        F.col("hs").alias("hs_b"),
        F.col("n_sh").alias("n_b"),
    )
    pairs = d_half.hint("shuffle_hash").join(b_half, "dup_of")
    verified = (
        pairs.withColumn("n_inter", F.size(F.array_intersect("hs_n", "hs_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_n") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("new_id").orderBy(
        F.col("jaccard").desc(), F.col("dup_of").asc()
    )
    out = (
        verified.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("new_id", "dup_of", "jaccard")
    )
    if not materialize:
        # lazy variant (plan audits, pipeline composition) — the caller owns
        # the sig_d/cand cache lifetimes THROUGH the `persisted` list: pass
        # one and unpersist its frames after consuming the result, exactly
        # like minhash_lsh_pairs' persisted path (without a handle a lazy
        # caller that executes the frame could never release the two caches)
        return out
    # same one-shot materialization discipline as minhash_lsh_pairs: every
    # shuffle in this plan is KB-scale (band keys + candidate ids), so AQE's
    # one-scheduled-job-per-query-stage latency outweighs its re-planning;
    # session conf restored before returning (single-threaded callers only —
    # concurrent pipelines use the `persisted` path, which never touches
    # session conf).
    spark = base.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions", "32")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    sig_d.unpersist()
    cand.unpersist()
    return out


def _free_frame(df: DataFrame) -> None:
    """Release a superseded iteration frame: cache-manager entry if cached,
    plus the internal RDD blocks when the frame is a localCheckpoint.
    Wholly best-effort — cleanup during teardown (dead context, lost py4j
    connection) must never fail the run; block GC reclaims eventually."""
    try:
        df.unpersist()
        df._jdf.queryExecution().toRdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "doc",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Cluster near-dup pairs into components: (id, cluster_id) where
    cluster_id = the smallest id reachable through dup edges (singletons map
    to themselves). This is the step after pair generation in every dedup
    pipeline — keep one representative per CLUSTER, not per pair.

    Iterative min-label propagation: label(x) ← min(label(x),
    min(label(neighbor))); converges in O(component diameter) rounds. Each
    round is one shuffle join + groupBy — the standard large-scale CC
    pattern (a full large-star/small-star is only needed for huge diameters,
    which near-dup graphs don't have). Frames are persisted per round and
    the loop stops at fixed point.
    """
    edges = (
        pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
        .unionByName(pairs.select(F.col(b_col).alias("s"), F.col(a_col).alias("d")))
        .distinct()
        .persist()
    )
    labels = ids.select(
        F.col(id_col).alias("id"), F.col(id_col).cast("long").alias("cluster_id")
    ).persist()
    for _ in range(max_iterations):
        # localCheckpoint (not persist): iterative plans nest one level per
        # round — without truncation the lineage grows past analyzable size
        # (and OOMs the driver) after ~10 rounds
        propagated = (
            labels.join(edges, labels.id == edges.s)
            .select(F.col("d").alias("id"), "cluster_id")
            .unionByName(labels)
            .groupBy("id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            propagated.join(labels.withColumnRenamed("cluster_id", "_old"), "id")
            .filter(F.col("cluster_id") != F.col("_old"))
            .limit(1)
            .count()
        )
        # the superseded label frame's blocks are dead once `changed` is
        # computed — free them instead of leaking one frame per iteration
        # (localCheckpoint frames are not in the cache manager, so also
        # unpersist the underlying checkpointed RDD)
        _free_frame(labels)
        labels = propagated
        if changed == 0:
            break
    edges.unpersist()
    # NOTE: the returned frame is the final localCheckpoint — its blocks stay
    # live until the caller drops the DataFrame (it IS the result).
    return labels.select(F.col("id").alias(id_col), "cluster_id")


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc, simhash): per-bit majority vote over distinct-token hashes.

    bit_i(doc) = 1 iff sum over tokens of (+1 if token_hash has bit i else -1) > 0,
    i.e. iff 2·|{hashes with bit i set}| > |distinct tokens|.

    Map-only (round 6): the old shape exploded (doc × bit × token) rows —
    ~bits× the corpus through two aggregation exchanges — to compute what
    is a per-document bounded fold. Here the distinct-token-hash ARRAY is
    hoisted into its own projection (array_distinct + one md5 transform per
    doc), and the signature is a sum of ``bits`` set-bit counts over that
    attribute: zero Exchange, same integers as the explode shape (votes
    s = 2·cnt_set − u, s > 0 ⟺ 2·cnt_set > u), so the oracle — which keeps
    the explode spec form — is unaffected. Docs with no tokens drop out,
    exactly as they dropped out of the explode."""
    ths = (
        df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("_t"))
        .filter(F.size("_t") > 0)
        .select(
            "doc",
            F.transform(
                F.array_distinct("_t"), lambda x: stable_long_hash(x)
            ).alias("_th"),
        )
    )
    u = F.size("_th")

    def _bit_set(mask: int):
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    bit_terms = [
        F.when(
            F.size(F.filter("_th", _bit_set(1 << bit))) * 2 > u,
            F.lit(1 << bit).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for bit in range(bits)
    ]
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return ths.select("doc", total.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the signature into ``bands`` byte-slices; any
    pair within distance < bands must agree exactly on ≥1 slice, so the
    candidate join is an equi-join on (band, byte) — no O(n²) cross join.
    Output: (id_a, id_b, hamming).
    """
    sh = simhash(df, id_col, text_col, bits)
    return hash_hamming_pairs(sh, "doc", "simhash", bits, bands, max_hamming)


def hash_hamming_pairs(
    sig: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int,
    bands: int,
    max_hamming: int,
) -> DataFrame:
    """Pairs with Hamming(hash) ≤ max_hamming over any integer signature
    column — the banded-pigeonhole core shared by SimHash (text) and pHash
    (image) near-dup. Split the ``bits``-bit hash into ``bands`` disjoint
    slices; any pair within distance < bands agrees exactly on ≥1 slice, so
    candidates come from an equi-join on (band, slice) — fixed-width shuffle
    keys, never an all-pairs join — and verify is one bit_count(xor) per
    candidate. Output: (id_a, id_b, hamming:int)."""
    width = bits // bands
    mask = (1 << width) - 1
    banded = sig.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).cast("long").alias("_h"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "slice",
        F.expr(f"(_h >> (band * {width})) & {mask}"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._h").alias("_ha"),
            F.col("b._h").alias("_hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


PHASH_BITS = 60  # stable_long_hash width; a production pHash is 64-bit
PHASH_BANDS = 6  # 10-bit slices → any pair with hamming <= 5 shares a band
PHASH_MAX_HAMMING = 5


def phash_neardup(
    ph: DataFrame,
    id_col: str = "id",
    phash_col: str = "phash",
    bits: int = PHASH_BITS,
    bands: int = PHASH_BANDS,
    max_hamming: int = PHASH_MAX_HAMMING,
) -> DataFrame:
    """Image near-dup on the corpus's perceptual-hash column: (id_a, id_b,
    hamming) pairs with Hamming(phash) ≤ max_hamming.

    The input is any (id, phash:int64) frame — the BASELINE.json input_hint
    corpus carries exactly this column (functions/images.phash64 computes it
    from decoded pixels at fetch time). Near-identical images differ in a
    few phash bits, so the SimHash banding machinery applies unchanged:
    at 100 TB the join shuffles only (band, slice, id, phash) rows — 8-byte
    hash per image, no pixel data — and verify is a single codegen'd
    bit_count. Reference analog: the tracker dedups URLs by exact key
    (redisRequestTracker.js:17-53); the image axis generalizes exact
    identity to perceptual near-identity."""
    return hash_hamming_pairs(ph, id_col, phash_col, bits, bands, max_hamming)
