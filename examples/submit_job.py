"""Cluster-submission entry point — the north-rule deployment shape:

    tools/build_pyfiles.sh && \
    /opt/spark/bin/spark-submit \
        --master 'local[4]' \
        --py-files dist/liblognorm_spark.zip \
        examples/submit_job.py <n_docs>

The job itself never touches the local source tree: the engine arrives
via --py-files, exactly as it would on a multi-executor cluster (each
executor's Python worker imports from the shipped zip).  It synthesizes
<n_docs> pages, runs the full parse -> enrich -> route -> aggregate
pipeline, and prints one JSON line of per-sink counts.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    spark = (
        SparkSession.builder.appName("liblognorm-spark-submit")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # imports resolve from the --py-files zip on every executor
    from liblognorm_spark.pipeline.pages import pages_df_n
    from liblognorm_spark.pipeline.pipeline import run_pipeline

    pages = pages_df_n(spark, n_docs)
    rows = run_pipeline(spark, pages).collect()
    print(json.dumps({r["sink"]: r["n"] for r in rows}, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
