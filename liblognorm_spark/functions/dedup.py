"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB: every variant is bucket-first — candidates are generated
by an equi-join/groupBy on a bucket key (hash-partitionable, map-side
combinable) and only verified pairwise INSIDE buckets, never via a global
cross join.  Hash functions are md5-derived so results are deterministic
and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# ------------------------------------------------------------ exact


def exact_dedup(df, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the lowest id per identical text (hash-groupBy; partial
    aggregation map-side, one shuffle on the md5 key)."""
    h = F.md5(F.col(text_col))
    return (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dupes"))
        .drop("_h")
    )


def exact_dup_groups(df, text_col: str = "text", id_col: str = "doc_id"):
    """Groups with >1 member: (keep_id, n_dupes)."""
    return exact_dedup(df, text_col, id_col).filter(F.col("n_dupes") > 1)


# ------------------------------------------------------------ shingles & minhash

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
SHINGLE_K = 3  # word shingles


def _word_shingles(col, k: int = SHINGLE_K):
    """k-word shingles as an array column, built with JVM-side higher-order
    functions (no Python)."""
    words = F.split(F.trim(col), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.array_join(words, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))
    )


def _h64(col, seed: int):
    """Deterministic seeded 64-bit hash (xxhash64 is JVM-native and far
    cheaper than md5+conv; minhash needs determinism, not cross-engine
    portability)."""
    return F.xxhash64(F.lit(seed), col)


def minhash_signatures(df, text_col: str = "text", id_col: str = "doc_id", n: int = N_MINHASH):
    """doc -> array<long> of n minhashes over word shingles.

    Shape matters at scale: explode shingles once, compute the n seeded
    hashes per shingle row, then groupBy(doc).min per hash — partial
    aggregation combines map-side, and the shingle-construction expression
    is evaluated exactly once (building n array_min(transform(...)) trees
    over the raw expression would inline the shingle builder n times)."""
    sh = df.select(
        F.col(id_col), F.explode(_word_shingles(F.col(text_col))).alias("shingle")
    )
    hashed = sh.select(
        id_col, *[_h64(F.col("shingle"), i).alias(f"h{i}") for i in range(n)]
    )
    agg = hashed.groupBy(id_col).agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(n)])
    return agg.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(n)]).alias("minhash")
    )


def minhash_lsh_pairs(df, text_col: str = "text", id_col: str = "doc_id",
                      n: int = N_MINHASH, bands: int = N_BANDS):
    """Candidate near-dup pairs via banded LSH: same band signature in any
    band -> candidate.  Returns distinct (id_a < id_b) pairs with their
    estimated jaccard (= matching minhash fraction)."""
    rows = n // bands
    sigs = minhash_signatures(df, text_col, id_col, n)
    band_cols = [
        F.md5(F.concat_ws(",", *[F.element_at("minhash", b * rows + r + 1) for r in range(rows)])).alias(
            "band_key"
        )
        for b in range(bands)
    ]
    exploded = sigs.select(
        id_col, "minhash", F.explode(F.array(*[F.struct(F.lit(b).alias("band"), band_cols[b]) for b in range(bands)])).alias("bk")
    ).select(id_col, "minhash", "bk.band", "bk.band_key")
    # persist: the self-join would otherwise recompute the signature
    # aggregation once per side (no ReusedExchange under AQE)
    exploded = exploded.persist()
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(b, ["band", "band_key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.minhash").alias("mh_a"),
            F.col("b.minhash").alias("mh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])  # pair may collide in >1 band
    )
    match_frac = (
        F.aggregate(
            F.zip_with("mh_a", "mh_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        * 1000
        / F.lit(N_MINHASH)
    ).cast("long")
    return pairs.select("id_a", "id_b", match_frac.alias("est_jaccard_millis"))


# ------------------------------------------------------------ simhash

SIMHASH_BITS = 32


def simhash(df, text_col: str = "text", id_col: str = "doc_id", bits: int = SIMHASH_BITS):
    """Per-doc SimHash: majority vote per bit over word hashes.

    Implemented JVM-side: explode words -> per-bit +-1 contributions via
    shiftright/bitwise-and -> groupBy doc -> sign aggregation."""
    words = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    base = df.select(F.col(id_col), words)
    wh = base.withColumn("wh", _h64(F.col("w"), 999))
    agg_exprs = [
        F.sum(
            F.when(F.shiftright(F.col("wh"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    per_doc = wh.groupBy(id_col).agg(*agg_exprs)
    sim = None
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**b)
        sim = bit if sim is None else sim + bit
    return per_doc.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_near_dups(df, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3):
    """Near-dup pairs by simhash hamming distance, candidate-bucketed on
    16-bit halves (any pair within distance<=3 shares a half exactly when
    differences concentrate; standard 2-block pigeonhole for 32 bits)."""
    s = simhash(df, text_col, id_col)
    lo = (F.col("simhash").bitwiseAND(F.lit((1 << 16) - 1))).alias("h_lo")
    hi = (F.shiftright("simhash", 16)).alias("h_hi")
    keyed = s.select(id_col, "simhash", lo, hi).persist()  # reused 4x below
    cands = None
    for key in ("h_lo", "h_hi"):
        a, b = keyed.alias("a"), keyed.alias("b")
        p = (
            a.join(b, F.col(f"a.{key}") == F.col(f"b.{key}"))
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.simhash").alias("sa"),
                F.col("b.simhash").alias("sb"),
            )
        )
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.distinct()
    xor = F.col("sa").bitwiseXOR(F.col("sb"))
    hamming = F.bit_count(xor)
    return cands.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# ------------------------------------------------------------ n-gram jaccard


def ngram_jaccard_pairs(df, text_col: str = "text", id_col: str = "doc_id",
                        threshold_millis: int = 500):
    """Exact word-shingle Jaccard over LSH candidates (verify stage for
    minhash_lsh_pairs): jaccard = |A∩B| / |A∪B| in millis."""
    sh = df.select(
        F.col(id_col), F.array_distinct(_word_shingles(F.col(text_col))).alias("sh")
    )
    cand = minhash_lsh_pairs(df, text_col, id_col).select("id_a", "id_b")
    j = (
        cand.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union == 0, F.lit(0)).otherwise((inter * 1000 / union).cast("long"))
    return j.select("id_a", "id_b", jac.alias("jaccard_millis")).where(
        F.col("jaccard_millis") >= threshold_millis
    )


# ------------------------------------------------------------ embedding near-dup


def embedding_near_dups(emb_df, vec_col: str = "embedding", id_col: str = "vec_id",
                        min_cos_millis: int = 990):
    """Embedding-cosine near-dup: bucket by the sign pattern of 8
    deterministic pseudo-random hyperplanes (md5-seeded), verify cosine
    inside buckets only."""
    from liblognorm_spark.functions.similarity import cosine_expr, hyperplane_bucket

    keyed = emb_df.select(
        F.col(id_col), F.col(vec_col), hyperplane_bucket(F.col(vec_col), nplanes=8).alias("bkt")
    ).persist()  # self-join reuses the bucketing
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(b, "bkt")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cos"),
        )
    )
    return pairs.select(
        "id_a", "id_b", (F.col("cos") * 1000).cast("long").alias("cos_millis")
    ).where(F.col("cos_millis") >= min_cos_millis)
