"""Interleaved A/B for minhash_lsh_pairs variants (BASELINE.md protocol).

This host shows multi-x run-to-run Spark noise, so configs are timed
ALTERNATING inside ONE session (A B C D, A B C D, ...) for N rounds and
compared on per-config minima + medians — a difference is believed only
if it exceeds the same-config spread.

Configs:
  agg+cap      aggregate-fold signatures (no explode/shuffle), bucket cap on
  explode+cap  explode+groupBy signatures, bucket cap on
  agg+nocap    aggregate-fold signatures, bucket cap off
  explode+nocap

Run: python tools/ab_minhash.py [rounds] (default 4; sf dir from
$SPARK_GRAFT_SF_DIR, default sf0.1)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from liblognorm_spark.functions.dedup import minhash_lsh_pairs, unpersist_dedup_caches
from liblognorm_spark.session import get_spark


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark(app="ab_minhash", cpus=cpus, shuffle_partitions=max(cpus, 8))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()
    docs.count()

    configs = {
        "agg+cap": dict(method="agg", max_bucket_size=200),
        "explode+cap": dict(method="explode", max_bucket_size=200),
        "agg+nocap": dict(method="agg", max_bucket_size=None),
        "explode+nocap": dict(method="explode", max_bucket_size=None),
    }
    times: dict[str, list[float]] = {k: [] for k in configs}

    def run(kw) -> float:
        t0 = time.perf_counter()
        minhash_lsh_pairs(docs, **kw).count()
        dt = time.perf_counter() - t0
        unpersist_dedup_caches()
        return dt

    for kw in configs.values():  # untimed warmup, one per config
        run(kw)
    for r in range(rounds):
        for name, kw in configs.items():
            dt = run(kw)
            times[name].append(dt)
            print(f"round {r} {name:14s} {dt:7.2f}s", flush=True)

    print("\nconfig          min     median  spread(max/min)")
    for name, ts in times.items():
        print(f"{name:14s} {min(ts):7.2f} {statistics.median(ts):8.2f} "
              f"{max(ts) / min(ts):7.2f}x")


if __name__ == "__main__":
    main()
