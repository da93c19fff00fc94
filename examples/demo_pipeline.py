"""Runnable end-to-end demo: rulebase -> parse -> enrich -> route ->
aggregate over the synthesized Common-Crawl-style pages table.

    python examples/demo_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from liblognorm_spark.pipeline.pages import pages_df
from liblognorm_spark.pipeline.pipeline import (
    aggregate_stage, enrich_stage, parse_stage, route_stage, write_sinks,
)
from liblognorm_spark.pipeline.metrics import observe_run, rule_stats, summary_line
from liblognorm_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app="demo", cpus=4)
    pages = pages_df(spark, sf_dir)
    parsed = parse_stage(spark, pages)
    parsed, obs = observe_run(parsed)
    routed = route_stage(enrich_stage(spark, parsed))
    print("\nper-sink counts:")
    aggregate_stage(routed).show()
    print(summary_line(obs))
    print("\nper-rule hits:")
    rule_stats(parsed).show(truncate=False)
    import tempfile

    out = tempfile.mkdtemp(prefix="lls_sinks_")
    write_sinks(routed, out)
    print(f"fan-out written to {out}/sink=<tag>/")


if __name__ == "__main__":
    main()
