"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (JVM-side zip_with/aggregate
— no Python in the hot path); the LSH-bucketed variant is the scale path:
at 100 TB the bucket join prunes candidates to O(rows/2^nplanes) per
bucket, and buckets are hash-partitioned so the probe is a broadcast join
against the (tiny) query-bucket set.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def dot_expr(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


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


def hyperplane_bucket(vec, nplanes: int = 8, dim: int = 16):
    """Sign-pattern bucket id (0..2^nplanes-1) of `vec` against the
    deterministic hyperplane set."""
    planes = _hyperplanes(dim, nplanes)
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(v)) for v in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


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


def lsh_topk(emb_df, query_vec: list[float], k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             nplanes: int = 6, probe_hamming: int = 1):
    """Approximate top-k: score only rows whose hyperplane bucket is within
    `probe_hamming` bit flips of the query's bucket (multi-probe LSH)."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, nplanes)
    qbucket = 0
    for p, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) >= 0:
            qbucket |= 1 << p
    probes = {qbucket}
    if probe_hamming >= 1:
        for b in range(nplanes):
            probes.add(qbucket ^ (1 << b))
    keyed = emb_df.select(
        F.col(id_col), F.col(vec_col),
        hyperplane_bucket(F.col(vec_col), nplanes=nplanes, dim=dim).alias("bkt"),
    )
    cand = keyed.where(F.col("bkt").isin(*sorted(probes)))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)
