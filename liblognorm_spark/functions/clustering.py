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
  is the no-silent-caps diagnostic for choosing k, and — new in round 6
  — :func:`semdedup` drops clusters above ``max_cluster_size`` outright
  (the dedup._cap_buckets discipline) so one degenerate centroid can
  never turn the equi-join quadratic at corpus scale.
- Literal-heavy expressions (k x dim centroid constants, the per-plane
  dot folds) are built as ONE SQL string handed to ``F.expr`` instead of
  thousands of per-element ``F.lit``/py4j round-trips: the round-6
  measurement showed ~1-1.5 s of pure driver-side Python per Lloyd
  iteration in expression CONSTRUCTION alone (guide §1.2 — fix the
  per-task work, where the "task" here is the driver).  The SQL parses
  to the exact same fold (zip_with + aggregate, left fold from 0.0), so
  every value is unchanged.

Every value that leaves these operators is integral (ids, cluster ids,
counts, micro-scaled cosines), so the DuckDB oracles compare exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from liblognorm_spark.functions.similarity import _sql_f

#: fixed-point scale for order-independent centroid sums
CENTROID_SCALE = 1 << 24

#: semdedup's hot-cluster guard (see semdedup docstring): clusters larger
#: than this are dropped from pair generation — 32768^2/2 ≈ 5e8 pairs is
#: the most one bad centroid may cost.  Far above any driver-fixture
#: cluster (the whole sf0.1 table is 2000 vectors), so fixture results
#: are identical with the guard on.
DEFAULT_MAX_CLUSTER = 32768


def _lit_vec(values):
    return F.array(*[F.lit(float(v)) for v in values])


def _norm_sql(vec_sql: str, dim: int) -> str:
    """Unrolled codegen norm — see similarity._norm_const_sql."""
    from liblognorm_spark.functions.similarity import _norm_const_sql

    return _norm_const_sql(vec_sql, dim)


def _cos_arr_sql(vec_sql: str, centroids, norm_sql: str | None = None) -> str:
    """array(cos(vec, c0), ..., cos(vec, ck-1)) as ONE SQL string, each
    centroid's norm folded in as a driver-computed constant (same values
    as the round-5 _cos_to_literal: Python's sum() folds left from 0 like
    the SQL aggregate, math.sqrt is IEEE).  ``norm_sql`` names an
    already-computed per-row norm column so the row norm is evaluated
    once instead of once per centroid."""
    from liblognorm_spark.functions.similarity import _dot_fold_sql

    dim = len(centroids[0])
    nv = norm_sql if norm_sql is not None else _norm_sql(vec_sql, dim)
    # centroid dots keep the FOLD form: the centroid literals change
    # every Lloyd iteration, so an unrolled k x dim tree is re-analyzed/
    # re-compiled on every plan — measured +3.5 s per semdedup call at
    # fixture scale in an interleaved A/B (fold 2.5 s vs unrolled 6.0 s),
    # and a k=64 array costs ~40 s of compile per plan.  The unrolled
    # codegen win is kept where the generated source is STABLE (the
    # literal-free pair dots below and the per-element sums), which is
    # also where the per-row volume lives at corpus scale.
    dot = _dot_fold_sql
    parts = []
    for cent in centroids:
        cn = math.sqrt(sum(float(v) * float(v) for v in cent))
        if cn == 0.0:
            parts.append("cast(0.0 as double)")
            continue
        parts.append(
            f"(CASE WHEN {nv} = cast(0.0 as double) THEN cast(0.0 as double) "
            f"ELSE {dot(vec_sql, cent)} / ({nv} * {_sql_f(cn)}) END)"
        )
    return "array(" + ", ".join(parts) + ")"


_ASSIGN_FROM_COS = "cast(array_position({c}, array_max({c})) - 1 as int)"


def _cos_to_literal(vec, cent):
    """cosine(vec, literal centroid) with the centroid's norm folded in
    as a driver-computed constant — half the per-row work and half the
    codegen expression size of cosine_expr(vec, lit(cent)).  Bit-parity
    with the oracle's in-SQL norm is exact: Python's sum() folds left
    from 0 like list_reduce (0.0 + x == x) and math.sqrt is IEEE."""
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
    behaves identically).

    Column-API form, kept for callers holding an arbitrary Column; the
    operators below build the same expression as one SQL string
    (F.expr) because per-element F.lit construction costs ~3 ms of py4j
    per literal — seconds per Lloyd iteration at k x dim = 512."""
    cosines = F.array(*[_cos_to_literal(vec, c) for c in centroids])
    return (F.array_position(cosines, F.array_max(cosines)) - 1).cast("int")


def _q(col: str) -> str:
    return f"`{col}`"


def _with_cluster(df, vec_col: str, centroids, out=None):
    """df + ``cluster`` column via the SQL-string assignment.  Staged
    projections: the row norm is a column (computed once, read by all k
    cosines), then the cosine array is a column (read twice by
    array_position/array_max) — the single-expression form re-evaluated
    both."""
    keep = df.columns if out is None else out
    dim = len(centroids[0])
    cos = _cos_arr_sql(_q(vec_col), centroids, norm_sql="_lls_nrm")
    return (
        df.withColumn("_lls_nrm", F.expr(_norm_sql(_q(vec_col), dim)))
        .withColumn("_lls_cos", F.expr(cos))
        .select(*keep, F.expr(_ASSIGN_FROM_COS.format(c="_lls_cos")).alias("cluster"))
    )


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
    # one array-of-sums aggregate expression (a single py4j call) with the
    # integer scaling unrolled per element (codegen; the transform-array
    # intermediate was interpreted).  Values are the same longs:
    # cast(floor(cast(v[d] as double) * 2^24 + 0.5) as long), summed.
    scale = f"{float(CENTROID_SCALE)!r}D"
    sums_sql = "array(" + ", ".join(
        f"sum(cast(floor(cast({_q(vec_col)}[{d}] as double) * {scale} + 0.5D) "
        "as long))" for d in range(dim)) + ")"

    for _ in range(iters):
        # norm as a real column first: the k cosines then READ it (k=8
        # inlines 16 norm copies per row; larger k would explode the
        # generated code quadratically)
        scaled = (
            df.select(F.col(vec_col),
                      F.expr(_norm_sql(_q(vec_col), dim)).alias("_nrm"))
            .withColumn("_lls_cos", F.expr(_cos_arr_sql(_q(vec_col), cents,
                                                        norm_sql="_nrm")))
            .select(
                F.expr(_ASSIGN_FROM_COS.format(c="_lls_cos")).alias("cluster"),
                F.col(vec_col),
            )
        )
        sums = scaled.groupBy("cluster").agg(
            F.count("*").alias("cnt"), F.expr(sums_sql).alias("s")
        ).collect()
        nxt = [list(c) for c in cents]  # empty cluster -> previous centroid
        for row in sums:
            if row["cluster"] is None:  # degenerate vec (NULL elements):
                continue                # all cosines NULL -> no cluster
            nxt[row["cluster"]] = [
                float(row["s"][d]) / float(CENTROID_SCALE * row["cnt"])
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
    return _with_cluster(
        emb_df.where(F.col(vec_col).isNotNull()), vec_col, centroids,
        out=[id_col],
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
             centroids=None, max_cluster_size: int | None = DEFAULT_MAX_CLUSTER):
    """SemDeDup: drop vector ``b`` when its cluster contains a vector
    ``a`` with a smaller id and cosine(a, b) >= threshold (so the
    smallest id of each semantic group survives).  Returns one row per
    DROPPED vector: (id, cluster, rep_id, n_sims) where rep_id is the
    smallest qualifying partner and n_sims the number of them.

    Scale shape: candidate pairs come from an equi-join on the cluster
    id (hash-partitionable; never a global cross join) and cosines are
    evaluated only inside clusters.  Per-row vector norms are computed
    ONCE at assignment time and carried as a column, so the per-PAIR
    work is a single dot fold (the norms were previously re-folded for
    both sides of every pair).  The join input is persisted once and
    shared by both sides (registered with the dedup cache registry —
    call dedup.unpersist_dedup_caches() after consuming).

    ``max_cluster_size`` is the hot-cluster guard: clusters with more
    members are dropped from pair generation entirely (both sides, the
    dedup._cap_buckets discipline) BEFORE the self-join, because one
    degenerate centroid holding f·N rows would otherwise cost (f·N)^2
    pairs — the quadratic escape hatch SemDeDup's choose-k-large
    contract assumes away but nothing previously enforced.  Use
    :func:`cluster_sizes` to see what a corpus would drop (no silent
    caps); pass None to disable.  The default is far above any
    driver-fixture cluster, so fixture results are unchanged."""
    from liblognorm_spark.functions.dedup import _cap_buckets, _persist, _spread

    if centroids is None:
        centroids = kmeans_fit(emb_df, k, iters, vec_col, id_col)
    dim = len(centroids[0])
    base = _spread(emb_df.where(F.col(vec_col).isNotNull()))
    # norm column first, then cosines READ it (one norm fold per row,
    # not one per centroid per row), then the assignment reads the
    # cosine array column
    assigned = (
        base.select(F.col(id_col), F.col(vec_col),
                    F.expr(_norm_sql(_q(vec_col), dim)).alias("_nrm"))
        .withColumn("_lls_cos", F.expr(_cos_arr_sql(_q(vec_col), centroids,
                                                    norm_sql="_nrm")))
        .select(id_col, vec_col, "_nrm",
                F.expr(_ASSIGN_FROM_COS.format(c="_lls_cos")).alias("cluster"))
    )
    # persist BEFORE the cap so the cap's hot-cluster aggregate and both
    # join sides read the cached assignment instead of re-evaluating the
    # k x dim cosine folds (the minhash path had exactly this
    # double-compute before round 6)
    assigned = _persist(assigned)
    if max_cluster_size is not None:
        assigned = _cap_buckets(assigned, ["cluster"], max_cluster_size)
    a = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("_nrm").alias("na"),
    )
    b = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("_nrm").alias("nb"),
    )
    from liblognorm_spark.functions.similarity import _dot_pair_sql

    # same value as cosine_expr(va, vb): the norms are the identical
    # IEEE folds, computed once per row instead of once per pair, and
    # the per-pair dot is the unrolled codegen chain (the interpreted
    # zip_with fold dominated the within-cluster join at scale)
    cos = F.when(
        (F.col("na") == 0) | (F.col("nb") == 0), F.lit(0.0)
    ).otherwise(
        F.expr(_dot_pair_sql("`va`", "`vb`", dim)) / (F.col("na") * F.col("nb"))
    )
    pairs = (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cos >= F.lit(float(threshold)))
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
