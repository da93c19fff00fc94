"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (JVM-side zip_with/aggregate
— no Python in the hot path); the LSH-bucketed variant is the scale path:
at 100 TB the bucket join prunes candidates to O(rows/2^nplanes) per
bucket.  build_ann_index() persists the bucketing as a partition column so
queries prune at SCAN time (partition pruning, no per-query bucket
computation over the corpus).

All arithmetic is double-precision with explicit element casts and
sequential (fold-left) summation, so the DuckDB oracles — which use
list_reduce over ::DOUBLE[] — produce bit-identical values.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def dot_expr(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a, b):
    d = dot_expr(a, b)
    na, nb = norm_expr(a), norm_expr(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))


def _hyperplanes(dim: int, nplanes: int, seed: str = "lls-hp"):
    """Deterministic pseudo-random hyperplanes from md5 — engine-independent
    and stable across runs (no RNG state)."""
    planes = []
    for p in range(nplanes):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
            # map 8 hex chars to [-1, 1)
            vals.append(int(h[:8], 16) / 2**31 - 1.0)
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / n for v in vals])
    return planes


def bucket_from_planes(vec, planes):
    """Sign-pattern bucket id (0..2^len(planes)-1) of `vec` against an
    explicit plane list.  `vec` elements are cast to double so the fold
    matches the DuckDB twin exactly."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(v)) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def hyperplane_bucket(vec, nplanes: int = 8, dim: int = 16):
    """Sign-pattern bucket id of `vec` against the deterministic hyperplane
    set.  `dim` MUST equal the embedding length — the planes are literal
    arrays and zip_with null-pads on mismatch (nulling the dot product)."""
    return bucket_from_planes(vec, _hyperplanes(dim, nplanes))


def query_bucket(query_vec: list[float], nplanes: int) -> int:
    """Driver-side bucket of a literal query vector (same planes/fold as
    bucket_from_planes: sum() folds left from 0, matching F.aggregate)."""
    planes = _hyperplanes(len(query_vec), nplanes)
    b = 0
    for p, plane in enumerate(planes):
        if sum(a * v for a, v in zip(query_vec, plane)) >= 0:
            b |= 1 << p
    return b


def brute_force_topk(emb_df, query_vec: list[float], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k against a literal query vector.  The query is a
    constant folded into the plan (the '1-row broadcast side')."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = emb_df.select(
        F.col(id_col),
        (cosine_expr(F.col(vec_col), q) * 1000000).cast("long").alias("cos_micros"),
    )
    return scored.orderBy(F.col("cos_micros").desc(), F.col(id_col)).limit(k)


def _probe_buckets(qbucket: int, nplanes: int, probe_hamming: int) -> list[int]:
    probes = {qbucket}
    if probe_hamming >= 1:
        for b in range(nplanes):
            probes.add(qbucket ^ (1 << b))
    if probe_hamming >= 2:
        for b1 in range(nplanes):
            for b2 in range(b1 + 1, nplanes):
                probes.add(qbucket ^ (1 << b1) ^ (1 << b2))
    return sorted(probes)


def lsh_topk(emb_df, query_vec: list[float], k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             nplanes: int = 6, probe_hamming: int = 2):
    """Approximate top-k: score only rows whose hyperplane bucket is within
    `probe_hamming` bit flips of the query's bucket (multi-probe LSH).
    Computes buckets at query time — fine for one-off scans; use
    build_ann_index + lsh_topk_indexed for a reusable corpus.

    Recall/candidate tradeoff is corpus-dependent: sign-LSH concentrates
    sharply when true neighbors are close (cos >= ~0.8, the near-dup case);
    on near-orthogonal data (the synthetic fixture) wider probing is needed
    — probe_hamming=2 measures recall@10 = 5/10 scanning ~31% of the
    fixture vs 3/10 at ~8% for hamming 1 (tests/test_dedup_groundtruth)."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, nplanes)
    probes = _probe_buckets(query_bucket(query_vec, nplanes), nplanes, probe_hamming)
    keyed = emb_df.select(
        F.col(id_col), F.col(vec_col),
        bucket_from_planes(F.col(vec_col), planes).alias("bkt"),
    )
    cand = keyed.where(F.col("bkt").isin(*probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def build_ann_index(emb_df, path: str, dim: int,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    nplanes: int = 6):
    """Persist the corpus as a parquet table PARTITIONED BY the hyperplane
    bucket.  At 100 TB this is the ANN story: the bucket assignment is paid
    once at ingest, and every query prunes to (nplanes+1) of 2^nplanes
    partition directories at scan time — no full-corpus scan, no per-query
    bucket computation.  Partition count is 2^nplanes; pick nplanes so each
    bucket is a healthy parquet partition (e.g. 2^10 buckets for 100 TB ->
    ~100 GB per bucket, further split by parquet row groups)."""
    planes = _hyperplanes(dim, nplanes)
    keyed = emb_df.select(
        F.col(id_col), F.col(vec_col),
        bucket_from_planes(F.col(vec_col), planes).alias("bkt"),
    )
    keyed.write.mode("overwrite").partitionBy("bkt").parquet(path)


def lsh_topk_indexed(spark, index_path: str, query_vec: list[float], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     nplanes: int = 6, probe_hamming: int = 2):
    """Top-k over a build_ann_index() table: the bucket filter is a
    partition-column predicate, so the scan reads only the probed bucket
    directories (verify with .explain -> PartitionFilters)."""
    probes = _probe_buckets(query_bucket(query_vec, nplanes), nplanes, probe_hamming)
    idx = spark.read.parquet(index_path)
    cand = idx.where(F.col("bkt").isin(*probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)
