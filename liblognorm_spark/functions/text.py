"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs.  Each operator has a DuckDB-SQL
twin in __spark_entry__.py's oracle set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# language marker words for the n-gram/stopword language-ID heuristic;
# deliberately tiny + deterministic so the SQL oracle can mirror it
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["und", "der", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "que", "de"],
}

PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}]"


def token_count(col):
    """Whitespace token count (single-space tokenization, matching the
    synthetic corpus)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), " "))
    )


def char_count(col):
    return F.length(F.col(col) if isinstance(col, str) else col)


def punct_ratio_millis(col):
    """Punctuation chars per 1000 chars, as BIGINT (stable for hashing)."""
    c = F.col(col) if isinstance(col, str) else col
    punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.floor(punct * 1000 / F.length(c))
    ).cast("long")


def mean_token_len_millis(col):
    c = F.col(col) if isinstance(col, str) else col
    nospace = F.length(F.regexp_replace(c, " ", ""))
    return F.when(token_count(c) == 0, F.lit(0)).otherwise(
        F.floor(nospace * 1000 / token_count(c))
    ).cast("long")


def quality_score_millis(col):
    """Deterministic doc-quality score in [0, 1000]:
    + length in a sane band, + low punct density, + sane mean token length.
    A simple, SQL-expressible stand-in for fastText-style quality models."""
    c = F.col(col) if isinstance(col, str) else col
    len_ok = (F.length(c) >= 20) & (F.length(c) <= 10000)
    punct_ok = punct_ratio_millis(c) < 100
    tok = mean_token_len_millis(c)
    tok_ok = (tok >= 2000) & (tok <= 12000)
    return (
        F.when(len_ok, 400).otherwise(0)
        + F.when(punct_ok, 300).otherwise(0)
        + F.when(tok_ok, 300).otherwise(0)
    ).cast("long")


def lang_id(col):
    """Marker-word language ID: per-language hit count over LANG_MARKERS,
    highest count wins (ties broken by fixed language order), 'und' if no
    marker hits.  Padded ' text ' so markers match whole words."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    scores = {
        lang: sum(
            F.when(padded.contains(f" {w} "), 1).otherwise(0) for w in words
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in LANG_MARKERS:  # fixed iteration order = tie-break order
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def fingerprint(col):
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (content-defined identity for exact/near dedup bucketing)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(c, r"\s+", " ")))


def with_text_stats(df, col: str = "text"):
    return (
        df.withColumn("n_tokens", token_count(col))
        .withColumn("n_chars_calc", char_count(col))
        .withColumn("punct_millis", punct_ratio_millis(col))
        .withColumn("quality_millis", quality_score_millis(col))
        .withColumn("lang_pred", lang_id(col))
        .withColumn("fp", fingerprint(col))
    )
