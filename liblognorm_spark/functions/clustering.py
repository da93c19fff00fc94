"""Embedding clustering + cluster-based semantic dedup (SemDeDup).

SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the embedding
space, then deduplicate ONLY within clusters — the cluster assignment is
the candidate generator that keeps the pairwise cosine work from going
quadratic in the corpus.  The reference pipeline has no clustering
operator; this is part of the training-data tier this engine adds on top
of the log-parsing surface.

Spark-first shape, designed for 100 TB:

- Centroids are driver-side literals folded into the plan (k x dim
  constants — the classic Spark ML k-means shape).  Assignment is a pure
  PROJECTION over the scan: no join, no shuffle, whole-stage codegen.
- Each Lloyd iteration is ONE shuffle: groupBy(cluster) over k keys with
  map-side partial aggregation (each task emits k rows of 64 sums), then
  a k-row collect to rebuild the literals.  Lineage does not grow with
  iterations because each round starts from a fresh projection.
- Centroid sums are computed over INTEGER-scaled elements
  (floor(x * 2^24 + 0.5) as long).  Integer addition is associative and
  commutative, so the sums — and therefore the centroids, the
  assignments, and every downstream cosine — are bit-identical no matter
  how Spark partitions the data, and an exact DuckDB twin exists (float
  summation order would otherwise differ between engines and between
  runs).  Scaled magnitudes stay exact in a long for ~2^38 rows/cluster
  and the sum stays exactly representable as a double for ~2^28
  rows/cluster at unit-scale embeddings; production would shard the sum
  (like sampling.pack_into_bins) before hitting that.
- The within-cluster pair join is an equi-join on the cluster id.
  SemDeDup's contract is that k is chosen large enough that clusters are
  small (the paper uses 50k clusters for 100M+ docs); cluster_sizes()
  is the no-silent-caps diagnostic for choosing k.

Every value that leaves these operators is integral (ids, cluster ids,
counts, micro-scaled cosines), so the DuckDB oracles compare exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from liblognorm_spark.functions.similarity import cosine_expr

#: fixed-point scale for order-independent centroid sums
CENTROID_SCALE = 1 << 24


def _scaled_elems(vec):
    """Integer-scaled embedding elements: floor(x * 2^24 + 0.5) as long.
    floor(+0.5) instead of round() because the two engines' round()
    half-rule conventions differ; floor is defined identically."""
    return F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * F.lit(float(CENTROID_SCALE)) + F.lit(0.5)).cast("long"),
    )


def _lit_vec(values):
    return F.array(*[F.lit(float(v)) for v in values])


def _cos_to_literal(vec, cent):
    """cosine(vec, literal centroid) with the centroid's norm folded in
    as a driver-computed constant — half the per-row work and half the
    codegen expression size of cosine_expr(vec, lit(cent)).  Bit-parity
    with the oracle's in-SQL norm is exact: Python's sum() folds left
    from 0 like list_reduce (0.0 + x == x) and math.sqrt is IEEE."""
    import math

    from liblognorm_spark.functions.similarity import dot_expr, norm_expr

    cn = math.sqrt(sum(v * v for v in cent))
    d = dot_expr(vec, _lit_vec(cent))
    nv = norm_expr(vec)
    if cn == 0.0:
        return F.lit(0.0)
    return F.when(nv == 0, F.lit(0.0)).otherwise(d / (nv * F.lit(cn)))


def assign_expr(vec, centroids):
    """Cluster id (0-based) of `vec` against literal `centroids`:
    argmax cosine, ties to the lowest cluster index (array_position
    returns the FIRST occurrence of the max — DuckDB's list_position
    behaves identically)."""
    cosines = F.array(*[_cos_to_literal(vec, c) for c in centroids])
    return (F.array_position(cosines, F.array_max(cosines)) - 1).cast("int")


def kmeans_fit(emb_df, k: int = 8, iters: int = 2,
               vec_col: str = "embedding", id_col: str = "vec_id"):
    """Lloyd's k-means over an embedding column; returns the centroid
    list (k lists of doubles).  Deterministic end-to-end: init is the k
    rows with the smallest ids, updates use the integer-scaled sums
    described in the module docstring, and an empty cluster keeps its
    previous centroid.  Each iteration costs one projection + one
    k-key shuffle + a k-row collect."""
    df = emb_df.where(F.col(vec_col).isNotNull())
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [[float(v) for v in row[0]] for row in init]
    if not cents:
        raise ValueError(
            f"kmeans_fit: no non-null {vec_col!r} rows to initialize from")
    dim = len(cents[0])

    for _ in range(iters):
        scaled = df.select(
            assign_expr(F.col(vec_col), cents).alias("cluster"),
            _scaled_elems(F.col(vec_col)).alias("sv"),
        )
        sums = scaled.groupBy("cluster").agg(
            F.count("*").alias("cnt"),
            *[F.sum(F.element_at("sv", d + 1)).alias(f"s{d}") for d in range(dim)],
        ).collect()
        nxt = [list(c) for c in cents]  # empty cluster -> previous centroid
        for row in sums:
            if row["cluster"] is None:  # degenerate vec (NULL elements):
                continue                # all cosines NULL -> no cluster
            nxt[row["cluster"]] = [
                float(row[f"s{d}"]) / float(CENTROID_SCALE * row["cnt"])
                for d in range(dim)
            ]
        cents = nxt
    return cents


def kmeans_assign(emb_df, k: int = 8, iters: int = 2,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  centroids=None):
    """(id, cluster) for every embedding — the final assignment
    projection after :func:`kmeans_fit` (pass ``centroids`` to skip the
    fit).  Pure projection over the scan: no join, no shuffle."""
    if centroids is None:
        centroids = kmeans_fit(emb_df, k, iters, vec_col, id_col)
    return emb_df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        assign_expr(F.col(vec_col), centroids).alias("cluster"),
    )


def cluster_sizes(emb_df, k: int = 8, iters: int = 2,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  centroids=None):
    """Per-cluster population — the diagnostic for choosing k before
    semdedup's within-cluster join (the analogue of
    dedup.lsh_bucket_stats: no silent caps, measure the skew)."""
    return (
        kmeans_assign(emb_df, k, iters, vec_col, id_col, centroids)
        .groupBy("cluster").agg(F.count("*").alias("n_vecs"))
    )


def semdedup(emb_df, k: int = 8, iters: int = 2, threshold: float = 0.9,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids=None):
    """SemDeDup: drop vector ``b`` when its cluster contains a vector
    ``a`` with a smaller id and cosine(a, b) >= threshold (so the
    smallest id of each semantic group survives).  Returns one row per
    DROPPED vector: (id, cluster, rep_id, n_sims) where rep_id is the
    smallest qualifying partner and n_sims the number of them.

    Scale shape: candidate pairs come from an equi-join on the cluster
    id (hash-partitionable; never a global cross join) and cosines are
    evaluated only inside clusters.  The join input is persisted once
    and shared by both sides (registered with the dedup cache registry —
    call dedup.unpersist_dedup_caches() after consuming)."""
    from liblognorm_spark.functions.dedup import _persist, _spread

    if centroids is None:
        centroids = kmeans_fit(emb_df, k, iters, vec_col, id_col)
    assigned = _persist(
        _spread(emb_df.where(F.col(vec_col).isNotNull())).select(
            F.col(id_col),
            F.col(vec_col),
            assign_expr(F.col(vec_col), centroids).alias("cluster"),
        )
    )
    a = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    pairs = (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cosine_expr(F.col("va"), F.col("vb")) >= F.lit(float(threshold)))
    )
    return (
        pairs.groupBy("id_b", "cluster")
        .agg(F.min("id_a").alias("rep_id"), F.count("*").alias("n_sims"))
        .select(
            F.col("id_b").alias(id_col),
            F.col("cluster"),
            F.col("rep_id"),
            F.col("n_sims"),
        )
    )
