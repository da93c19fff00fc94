"""Deterministic Common-Crawl-style pages table (the north-rule input shape).

Schema per BASELINE.json input_hint: (url string, warc_ts timestamp,
html binary, text string, lang string).  Synthesis is expressed as a SQL
SELECT over the driver-provided ``documents`` table using only
dialect-common constructs (||, CASE, %, md5, substr, lpad) so the exact
same string runs under Spark SQL and DuckDB — the correctness oracles
reconstruct expected parse results directly from ``doc_id``.

Skew is intentional (FIXTURES.md §1): half of all rows land on host 0 to
exercise salting / AQE skew handling.
"""

from __future__ import annotations

# -- shared SQL building blocks (valid in Spark SQL AND DuckDB) --

HOST_ID = "(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE doc_id % 97 END)"
IP = "('10.' || (doc_id % 250) || '.' || ((doc_id * 7) % 250) || '.' || (1 + doc_id % 200))"
PID = "(1000 + doc_id % 9000)"
PORT = "(1024 + doc_id % 60000)"
MAC = (
    "(substr(md5('' || doc_id), 1, 2) || ':' || substr(md5('' || doc_id), 3, 2)"
    " || ':' || substr(md5('' || doc_id), 5, 2) || ':' || substr(md5('' || doc_id), 7, 2)"
    " || ':' || substr(md5('' || doc_id), 9, 2) || ':' || substr(md5('' || doc_id), 11, 2))"
)
DURATION = "((doc_id % 24) || ':' || lpad('' || (doc_id % 60), 2, '0') || ':' || lpad('' || ((doc_id * 3) % 60), 2, '0'))"
KIND = "(doc_id % 8)"
URL = f"('https://h' || {HOST_ID} || '.example.com/p/' || doc_id)"

TEXT = f"""(CASE {KIND}
  WHEN 0 THEN 'sshd[' || {PID} || ']: Invalid user u' || doc_id || ' from ' || {IP}
  WHEN 1 THEN 'Oct 29 09:47:08 h' || {HOST_ID} || ' ftpd: FTP session closed'
  WHEN 2 THEN 'Oct 29 09:47:08 h' || {HOST_ID} || ' identd: Bad line received from identity server at ' || {IP} || ': ' || {PORT}
  WHEN 3 THEN 'iptables denied: IN= OUT=eth0 SRC=' || {IP} || ' DST=192.168.0.1 LEN=' || (40 + doc_id % 1400) || ' PROTO=TCP SPT=' || {PORT} || ' DPT=443'
  WHEN 4 THEN 'user=u' || doc_id || ' action=login status=' || (CASE WHEN doc_id % 3 = 0 THEN 'ok' ELSE 'fail' END)
  WHEN 5 THEN '{{"event":"page_view","id":' || doc_id || '}}'
  WHEN 6 THEN 'dev ' || {MAC} || ' up ' || {DURATION}
  ELSE 'raw: ' || substr(text, 1, 120)
END)"""

# epoch seconds for 2024-01-01T00:00:00Z + doc_id
WARC_EPOCH = "(1704067200 + doc_id)"

PAGES_SELECT = f"""SELECT
  doc_id,
  {URL} AS url,
  {WARC_EPOCH} AS warc_epoch,
  {TEXT} AS text,
  lang,
  {KIND} AS kind
FROM documents"""


def pages_df(spark, sf_dir: str, with_html: bool = False):
    """Build the pages DataFrame for a testdata scale-factor directory.

    Adds the binary ``html`` column and a real ``warc_ts`` timestamp on the
    Spark side (excluded from the dialect-common SELECT because BLOB/CAST
    syntax diverges between engines)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    df = spark.sql(PAGES_SELECT)
    df = df.withColumn("warc_ts", F.timestamp_seconds(F.col("warc_epoch")))
    if with_html:
        df = df.withColumn(
            "html",
            F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")), "UTF-8"),
        )
    return df


def pages_df_n(spark, n_rows: int, with_html: bool = False):
    """Bench-scale pages table: identical deterministic synthesis over
    ``range(n_rows)`` (doc_id = id; the kind-7 raw text is md5-derived
    instead of documents.text so no join is needed).  Used for throughput
    measurement where the driver-provided documents table is too small to
    exercise the engine; correctness oracles keep the documents-based
    variant."""
    from pyspark.sql import functions as F

    base = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("text"),  # raw-text stand-in
        F.element_at(
            F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "ja", "zh")]),
            (F.col("id") % 6 + 1).cast("int"),
        ).alias("lang"),
    )
    base.createOrReplaceTempView("documents")
    df = spark.sql(PAGES_SELECT)
    df = df.withColumn("warc_ts", F.timestamp_seconds(F.col("warc_epoch")))
    if with_html:
        df = df.withColumn(
            "html",
            F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")), "UTF-8"),
        )
    return df


# expected sink per kind, used by routing oracles (must mirror the fixture
# rulebase in liblognorm_spark/pipeline/fixture_rulebase.py)
SINK_BY_KIND = f"""(CASE {KIND}
  WHEN 0 THEN 'ssh' WHEN 1 THEN 'ftp' WHEN 2 THEN 'ident' WHEN 3 THEN 'fw'
  WHEN 4 THEN 'kv' WHEN 5 THEN 'json' WHEN 6 THEN 'net' ELSE 'fallback' END)"""
SINK_BY_KIND_NOFALLBACK = f"""(CASE {KIND}
  WHEN 0 THEN 'ssh' WHEN 1 THEN 'ftp' WHEN 2 THEN 'ident' WHEN 3 THEN 'fw'
  WHEN 4 THEN 'kv' WHEN 5 THEN 'json' WHEN 6 THEN 'net' ELSE 'unparsed' END)"""
