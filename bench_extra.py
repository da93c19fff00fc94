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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(BENCH_QUERIES))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", default=None, help="directory for explain captures")
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--pipeline-docs", type=int, default=4_800_000)
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
