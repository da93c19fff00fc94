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


def pack_into_bins(df, budget_tokens: int, n_shards: int = 256,
                   token_col=None, text_col: str = "text", id_col: str = "doc_id"):
    """Sequence-packing bin assignment: greedy running-sum packing of
    documents into fixed token budgets (the pre-training step that turns a
    corpus into constant-length training sequences).

    Scale shape: a single global running sum would serialize the corpus
    through one partition, so docs are first sharded by a deterministic
    hash of the id and packed WITHIN shards — one shuffle, then a window
    running-sum per shard; bins are (shard, bin_in_shard) pairs and every
    shard packs independently on its own executor.  Deterministic: shard
    and order are pure functions of the id.

    Returns (id, n_tokens, shard, bin) with bin = the 0-based bin index
    inside the shard: greatest(running_sum_inclusive - 1, 0) DIV budget.
    The clamp keeps a leading run of 0-token docs in bin 0 (an unclamped
    (run-1)/budget would floor to -1 for them under floor-division
    semantics) and is mirrored bit-identically in the DuckDB oracle."""
    from pyspark.sql import Window
    from liblognorm_spark.functions.text import token_count

    tokens = (token_col if token_col is not None else token_count(text_col)).alias("n_tokens")
    shard = (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit("pack"), F.col(id_col))), 1, 15), 16, 10)
        .cast("long") % n_shards
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy(id_col)
    run = F.sum("n_tokens").over(w)
    return (
        df.select(F.col(id_col), tokens, shard)
        .withColumn(
            "bin",
            F.floor(F.greatest(run - 1, F.lit(0)) / F.lit(budget_tokens)).cast("long"),
        )
    )
