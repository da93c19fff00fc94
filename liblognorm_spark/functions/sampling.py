"""Deterministic sampling operators for data-mixing pipelines.

Samplers must be DETERMINISTIC at 100 TB (re-runs, resumes and audits all
need the same subset), so the keep/drop decision is a pure hash of the
row id — never rand().  All expressions are built-in JVM functions; each
operator has an exact DuckDB twin in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DEFAULT_RATE_MILLIS = 100  # strata not listed explicitly keep 10%


def _hash_millis(id_col):
    """Uniform pseudo-random bucket 0..999 from the row id: 15 md5 hex
    chars -> BIGINT -> mod 1000.  DuckDB twin:
    ('0x' || substr(md5('samp|' || id), 1, 15))::BIGINT % 1000."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit("samp"), c)), 1, 15), 16, 10)
        .cast("long") % 1000
    )


def stratified_sample(df, rates_millis: dict[str, int],
                      stratum_col: str = "lang", id_col: str = "doc_id",
                      default_rate_millis: int = DEFAULT_RATE_MILLIS):
    """Per-stratum deterministic sampling (the data-mixing primitive:
    'keep 50% of English, 25% of German, 10% of everything else').

    ``rates_millis`` maps stratum value -> keep-rate in thousandths.  The
    plan is a pure filter over the scan — no shuffle, no Python, and the
    same row set on every run (hash-of-id threshold, not rand())."""
    rate = F.lit(default_rate_millis)
    for k, v in sorted(rates_millis.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    return df.where(_hash_millis(id_col) < rate)
