"""Ground-truth + plan tests for clustering.py (k-means / SemDeDup).

SemDeDup (Abbas et al. 2023) over synthetic planted clusters: the
k-means stage must separate well-separated groups, the dedup stage must
drop exactly the near-identical members (keeping the smallest id), and
the whole thing must be invariant under physical partitioning — the
property the integer-scaled centroid sums exist to guarantee.
"""

import math

import pytest

SF = "/root/testdata/sf0.001"
DIM = 8


def _unit(seed_vals):
    n = math.sqrt(sum(v * v for v in seed_vals))
    return [v / n for v in seed_vals]


def _planted(spark):
    """Three well-separated directions; group members are tiny
    perturbations of their base (pairwise cos ~0.999 within a group,
    ~0 across groups)."""
    bases = {
        0: _unit([1, 0, 0, 0, 1, 0, 0, 0]),
        1: _unit([0, 1, 0, 0, 0, -1, 0, 0]),
        2: _unit([0, 0, 1, 0, 0, 0, 1, 0]),
    }
    rows = []
    for g, base in bases.items():
        for m in range(4):
            vec = [v + 0.01 * m * ((d % 3) - 1) for d, v in enumerate(base)]
            rows.append((g * 10 + m, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separates_planted_groups(spark):
    from liblognorm_spark.functions.clustering import kmeans_assign

    emb = _planted(spark)
    out = {r.vec_id: r.cluster for r in kmeans_assign(emb, k=3, iters=3).collect()}
    # every planted group lands in ONE cluster, groups in distinct clusters
    groups = [{out[g * 10 + m] for m in range(4)} for g in range(3)]
    assert all(len(s) == 1 for s in groups), out
    assert len(set.union(*groups)) == 3, out


def test_semdedup_drops_all_but_smallest_id(spark):
    from liblognorm_spark.functions.clustering import semdedup
    from liblognorm_spark.functions.dedup import unpersist_dedup_caches

    emb = _planted(spark)
    rows = semdedup(emb, k=3, iters=3, threshold=0.99).collect()
    unpersist_dedup_caches()
    dropped = {r.vec_id: r for r in rows}
    # in every group the 3 non-minimal ids drop, rep = the group minimum
    expect_dropped = {g * 10 + m for g in range(3) for m in range(1, 4)}
    assert set(dropped) == expect_dropped, dropped
    for g in range(3):
        for m in range(1, 4):
            assert dropped[g * 10 + m].rep_id == g * 10
    # survivors: exactly the three group minima
    kept = {r[0] for r in emb.select("vec_id").collect()} - set(dropped)
    assert kept == {0, 10, 20}


def test_kmeans_invariant_under_partitioning(spark):
    """Integer-scaled centroid sums make the fit order-independent:
    1-partition and 13-partition inputs give bit-identical centroids and
    assignments."""
    from liblognorm_spark.functions.clustering import kmeans_assign, kmeans_fit

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = kmeans_fit(emb.coalesce(1), k=8, iters=2)
    c2 = kmeans_fit(emb.repartition(13), k=8, iters=2)
    assert c1 == c2
    a1 = {tuple(r) for r in kmeans_assign(emb, k=8, iters=2, centroids=c1).collect()}
    a2 = {tuple(r) for r in
          kmeans_assign(emb.repartition(7), k=8, iters=2, centroids=c2).collect()}
    assert a1 == a2 and len(a1) > 0


def test_empty_cluster_keeps_previous_centroid(spark):
    """An init centroid that captures no points must survive the update
    unchanged (the deterministic empty-cluster rule the oracle mirrors)."""
    from liblognorm_spark.functions.clustering import kmeans_fit

    # ids 0 and 1 IDENTICAL -> init centroids 0 and 1 identical -> every
    # point's argmax ties between them and array_position picks the
    # FIRST max, so cluster 1 provably captures zero points each round
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.9999, 0.0001, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_fit(emb, k=2, iters=1)
    # the empty cluster must keep its init centroid bit-for-bit (the
    # rule the oracle's LEFT JOIN + coalesce mirrors)...
    assert cents[1] == [1.0, 0.0, 0.0, 0.0]
    # ...while the non-empty cluster (which won every point) moved off it
    assert cents[0] != [1.0, 0.0, 0.0, 0.0]
    assert all(all(not math.isnan(v) for v in c) for c in cents)


def test_cluster_sizes_diagnostic(spark):
    from liblognorm_spark.functions.clustering import cluster_sizes

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = cluster_sizes(emb, k=8, iters=2).collect()
    assert sum(r.n_vecs for r in rows) == emb.count()
    assert len(rows) <= 8


def test_kmeans_assign_is_pure_projection(spark):
    """Assignment with literal centroids: no join, no exchange — the
    plan is scan + project (whole-stage codegen)."""
    from liblognorm_spark.functions.clustering import kmeans_assign, kmeans_fit

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = kmeans_fit(emb, k=8, iters=1)
    plan = kmeans_assign(emb, centroids=cents)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan


def test_semdedup_equi_join_no_cartesian(spark):
    """Candidate pairs come from the cluster equi-join — never a
    cartesian product or a single-partition stage."""
    from liblognorm_spark.functions.clustering import kmeans_fit, semdedup
    from liblognorm_spark.functions.dedup import unpersist_dedup_caches

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = kmeans_fit(emb, k=8, iters=1)
    plan = semdedup(emb, centroids=cents)._jdf.queryExecution() \
        .executedPlan().toString()
    unpersist_dedup_caches()
    assert "CartesianProduct" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_semdedup_hot_cluster_guard_bounds_pairs(spark):
    """Round-6 scale guard: a planted mega-cluster (every vector nearly
    parallel -> one cluster swallows the corpus) is DROPPED from pair
    generation when it exceeds max_cluster_size, so the within-cluster
    join can never go quadratic on a degenerate centroid.  The guarded
    run keeps only the small clusters' pairs; the tiny default fixture
    clusters stay under any sane cap, so production results with the
    default guard are unchanged (pinned by the semdedup oracle)."""
    from pyspark.sql import functions as F

    from liblognorm_spark.functions.clustering import semdedup
    from liblognorm_spark.functions.dedup import unpersist_dedup_caches

    # 40 near-identical vectors (the mega-cluster) + one small planted
    # group of 3 (ids 100..102) pointing elsewhere
    rows = []
    base = _unit([1, 1, 0, 0, 0, 0, 0, 0])
    for m in range(40):
        rows.append((m, [v + 1e-4 * m * ((d % 3) - 1) for d, v in enumerate(base)]))
    other = _unit([0, 0, 0, 1, -1, 0, 0, 0])
    for m in range(3):
        rows.append((100 + m, [v + 1e-4 * m * ((d % 2) - 0.5) for d, v in enumerate(other)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # unguarded: the mega-cluster contributes its quadratic pair set
    un = semdedup(emb, k=2, iters=2, threshold=0.99, max_cluster_size=None).collect()
    unpersist_dedup_caches()
    assert {r.vec_id for r in un} >= {m for m in range(1, 40)}

    # guarded at 10: the 40-member cluster is dropped outright; only the
    # small group's dedups remain, and total candidate pairs are bounded
    # by sum over kept clusters of size^2 < cap^2 * n_clusters
    g = semdedup(emb, k=2, iters=2, threshold=0.99, max_cluster_size=10).collect()
    unpersist_dedup_caches()
    got = {r.vec_id for r in g}
    assert not ({m for m in range(40)} & got), got
    assert got == {101, 102}, got

    # oracle-facing default: the guard is far above fixture cluster sizes
    emb_fix = spark.read.parquet(f"{SF}/embeddings.parquet")
    default_rows = semdedup(emb_fix, k=8, iters=2, threshold=0.35).count()
    unpersist_dedup_caches()
    off_rows = semdedup(emb_fix, k=8, iters=2, threshold=0.35,
                        max_cluster_size=None).count()
    unpersist_dedup_caches()
    assert default_rows == off_rows
