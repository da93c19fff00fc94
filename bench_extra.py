"""Round-6 measurement harness (guide §1): per-query timing with the
build phase (Python query construction, incl. any driver-side collects)
separated from the execute phase, plus optional plan capture and a
pipeline stage breakdown.

This file is SEPARATE from bench.py (which is frozen for measurement):
numbers here are for optimization work and are cited in
OPTIMIZATION_r06.md; the driver's official timing still comes from the
round-start bench.py.

Usage:
  python bench_extra.py                      # all bench queries, best-of-3
  python bench_extra.py --queries bm25,semdedup
  python bench_extra.py --plans plans/r06 --suffix _before
  python bench_extra.py --pipeline           # stage breakdown at 4.8M docs
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

BENCH_QUERIES = [
    "parse_sshd",
    "dedup_exact",
    "minhash_pairs",
    "text_stats",
    "knn_cosine",
    "tpch_q1",
    "events_window",
    "duplicate_spans",
    "semdedup",
    "bm25",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_query(spark, E, name, sf_dir, reps, use_noop=False):
    from liblognorm_spark.functions.dedup import unpersist_dedup_caches

    fn = E.queries()[name]
    builds, execs, totals = [], [], []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"r06 {name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        if use_noop:
            _noop(df)
        else:
            df.count()
        t2 = time.perf_counter()
        builds.append(t1 - t0)
        execs.append(t2 - t1)
        totals.append(t2 - t0)
        unpersist_dedup_caches()
    spark.sparkContext.setJobDescription(None)
    return {
        "build_best": round(min(builds), 3),
        "exec_best": round(min(execs), 3),
        "total_best": round(min(totals), 3),
        "totals": [round(t, 3) for t in totals],
        "builds": [round(t, 3) for t in builds],
    }


def capture_plan(spark, E, name, sf_dir, out_path):
    fn = E.queries()[name]
    df = fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(out_path, "w") as f:
        f.write(plan)
    from liblognorm_spark.functions.dedup import unpersist_dedup_caches

    unpersist_dedup_caches()


def pipeline_breakdown(spark, n_docs, reps):
    """Time parse / parse+enrich+route / full-aggregate separately over the
    same cached input the bench uses (noop sink for the non-aggregate
    stages so the JVM-side consumption is eager but discarded)."""
    import tempfile

    from pyspark import StorageLevel

    from liblognorm_spark.pipeline import pipeline as PL
    from liblognorm_spark.pipeline.pages import pages_df_n

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    path = os.path.join(tempfile.gettempdir(), f"lls_bench_pages_{n_docs}")
    if not os.path.exists(path):
        pages_df_n(spark, n_docs).write.mode("overwrite").parquet(path)
    pages = (
        spark.read.parquet(path).repartition(cpus * 4).persist(StorageLevel.MEMORY_ONLY)
    )
    pages.count()

    out = {}

    def best(label, make, action):
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"r06 pipeline:{label}")
            df = make()
            t0 = time.perf_counter()
            action(df)
            times.append(time.perf_counter() - t0)
        out[label] = {"best": round(min(times), 3), "times": [round(t, 3) for t in times]}

    best("input_noop", lambda: pages, _noop)
    best("parse_noop", lambda: PL.parse_stage(spark, pages), _noop)
    best(
        "route_noop",
        lambda: PL.route_stage(PL.enrich_stage(spark, PL.parse_stage(spark, pages))),
        _noop,
    )
    best("full_collect", lambda: PL.run_pipeline(spark, pages), lambda df: df.collect())
    pages.unpersist()
    return out


def llm_big_bench(spark, big_dir, reps):
    """Scale evidence for the training-data tier (round-5 verdict item:
    the sf0.1 fixtures are so small the numbers measure Spark fixed
    overhead).  Operating points follow each operator's contract at
    scale (SemDeDup: k large enough that clusters stay small), so the
    numbers show the 100-TB shape doing real work, not a quadratic
    corner."""
    from pyspark.sql import functions as F

    from liblognorm_spark.functions.clustering import kmeans_assign, semdedup
    from liblognorm_spark.functions.dedup import (
        duplicate_spans,
        exact_dedup,
        minhash_lsh_pairs,
        unpersist_dedup_caches,
    )
    from liblognorm_spark.functions.search import bm25_topk
    from liblognorm_spark.functions.similarity import lsh_topk_batch_adaptive

    docs = spark.read.parquet(f"{big_dir}/documents.parquet")
    emb = spark.read.parquet(f"{big_dir}/embeddings.parquet")
    n_docs, n_vecs = docs.count(), emb.count()
    emb50 = emb.where(F.col("vec_id") < n_vecs // 4)

    cases = {
        "dedup_exact": lambda: exact_dedup(docs),
        "minhash_pairs": lambda: minhash_lsh_pairs(docs).where(
            F.col("est_jaccard_millis") >= 500),
        "duplicate_spans": lambda: duplicate_spans(docs, k=5, min_docs=2),
        # real vocabulary words (vocab word for rank r is
        # "w" + md5(str(r))[:6] — see tools/gen_llm_fixtures.py), so all
        # three terms actually match documents
        "bm25": lambda: bm25_topk(
            docs,
            ["w" + __import__("hashlib").md5(str(r).encode()).hexdigest()[:6]
             for r in (0, 1, 2)],
            k=15),
        "kmeans_assign_k64": lambda: kmeans_assign(emb, k=64, iters=2),
        "semdedup_k128_quarter": lambda: semdedup(
            emb50, k=128, iters=2, threshold=0.9),
        "ann_batch_adaptive": lambda: lsh_topk_batch_adaptive(
            emb,
            emb.where((F.col("vec_id") % 1000) == 0).select(
                F.col("vec_id").alias("query_id"), "embedding"),
            dim=64, k=10),
    }
    out = {"n_docs": n_docs, "n_vecs": n_vecs}
    for name, make in cases.items():
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"llm_big {name}")
            t0 = time.perf_counter()
            # noop sink, not count(): count() lets Catalyst prune a pure
            # projection down to nothing (guide §1.4), which would "time"
            # kmeans_assign without computing a single cosine
            _noop(make())
            times.append(round(time.perf_counter() - t0, 2))
            unpersist_dedup_caches()
        out[name] = {"best": min(times), "times": times}
        print(json.dumps({name: out[name]}), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(BENCH_QUERIES))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", default=None, help="directory for explain captures")
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--pipeline-docs", type=int, default=4_800_000)
    ap.add_argument("--llm-big", default=None,
                    help="dir from tools/gen_llm_fixtures.py: bench the "
                         "training-data tier at scale")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as E

    from liblognorm_spark.session import get_spark

    spark = get_spark(app="bench_extra", cpus=cpus)
    load0 = round(os.getloadavg()[0], 2)

    results = {"sf_dir": sf_dir, "cpus": cpus, "load_at_start": load0}

    if args.pipeline:
        results["pipeline_breakdown"] = pipeline_breakdown(
            spark, args.pipeline_docs, args.reps
        )
    elif args.llm_big:
        results["llm_big"] = llm_big_bench(spark, args.llm_big, args.reps)
    else:
        # small warmup so the first query does not pay JVM/Arrow init
        E.queries()["parse_sshd"](spark, "/root/testdata/sf0.001").count()
        names = [q for q in args.queries.split(",") if q]
        for name in names:
            if args.plans:
                os.makedirs(args.plans, exist_ok=True)
                capture_plan(
                    spark, E, name, sf_dir,
                    os.path.join(args.plans, f"{name}{args.suffix}.txt"),
                )
            results[name] = time_query(spark, E, name, sf_dir, args.reps, args.noop)
            print(json.dumps({name: results[name]}), flush=True)

    results["load_at_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
