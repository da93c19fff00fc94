"""Generate a LARGER deterministic LLM-tier fixture (documents +
embeddings) for scale measurement of the training-data operators.

The shipped sf0.1 testdata holds 5,000 docs / 2,000 embeddings — small
enough that operator timings measure Spark fixed overhead, not the
operators (round-5 verdict).  This tool synthesizes a deterministic
tier at a chosen multiple so bench_extra can show the round-6
optimizations hold when the leaves run for seconds:

* documents: doc_id, text (~120 words drawn deterministically from a
  md5-derived vocabulary with Zipf-ish repeats + planted cross-doc
  duplication so dedup/span operators have real work), lang.
* embeddings: vec_id, embedding (64 floats in [-1, 1) from md5, like
  similarity._hyperplanes' derivation).

Usage: python tools/gen_llm_fixtures.py [out_dir] [n_docs] [n_vecs]
Defaults: /tmp/lls_llm_big 100000 200000
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lls_llm_big"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000

    from pyspark.sql import functions as F

    from liblognorm_spark.session import get_spark

    spark = get_spark(app="gen_llm_fixtures")

    # --- documents ---------------------------------------------------
    # 120 words per doc; word w of doc d indexes a 50k-word md5 vocab by
    # a Zipf-ish rank so frequent words repeat; every 37th doc (d > 0)
    # shares its first 30-word span VERBATIM with doc d-1: d-1 is never
    # itself a 37-multiple, so the copy uses exactly the source doc's own
    # word formula and the duplication genuinely materializes (the
    # round-6 review caught a first version that chained multiples into
    # words no real doc had).
    def _rank(doc, i):
        return F.pmod(F.xxhash64(doc * 1000 + i), F.lit(50000))

    words = F.transform(
        F.sequence(F.lit(0), F.lit(119)),
        lambda i: F.concat(
            F.lit("w"),
            F.substring(
                F.md5(
                    F.when(
                        (F.col("doc_id") % 37 == 0) & (F.col("doc_id") > 0) & (i < 30),
                        _rank(F.col("doc_id") - 1, i),
                    )
                    .otherwise(_rank(F.col("doc_id"), i))
                    .cast("string")
                ),
                1,
                6,
            ),
        ),
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
            F.element_at(
                F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "ja", "zh")]),
                (F.col("id") % 6 + 1).cast("int"),
            ).alias("lang"),
        )
    )
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    # --- embeddings --------------------------------------------------
    # element e of vec v: md5("v|e") first 8 hex chars -> [-1, 1);
    # every 41st vector (v > 0) copies vec v-1 with a tiny deterministic
    # nudge — v-1 is never itself a 41-multiple, so the near-duplicate
    # pair (v-1, v) genuinely exists (same review fix as the documents).
    src = F.when(
        (F.col("vec_id") % 41 == 0) & (F.col("vec_id") > 0), F.col("vec_id") - 1
    ).otherwise(F.col("vec_id"))
    elems = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda e: (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", src.cast("string"), e.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(2 ** 31))
            - 1.0
            + F.when(F.col("vec_id") % 41 == 0, (e % 7).cast("double") * 1e-4)
            .otherwise(F.lit(0.0))
        ).cast("float"),
    )
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), elems.alias("embedding")
    )
    emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print(f"wrote {out}: documents={n_docs} embeddings={n_vecs}")


if __name__ == "__main__":
    main()
