"""BM25 ranking ground truth + plan shape."""

import math

SF = "/root/testdata/sf0.001"


def test_bm25_ranks_planted_relevance(spark):
    """More matching terms and higher tf beat fewer; a doc without any
    query term never appears; longer docs with equal tf score lower
    (the length normalization)."""
    from liblognorm_spark.functions.search import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),          # all three terms
            (1, "alpha beta filler filler"),  # two terms, longer
            (2, "alpha filler filler filler"),
            (3, "filler junk noise pad"),     # no terms -> excluded
            (4, "alpha alpha alpha beta gamma"),  # highest tf, all terms
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["alpha", "beta", "gamma"], k=10).collect()
    ids = [r.doc_id for r in rows]
    assert 3 not in ids
    # full matches (0, 4) beat the two-term doc, which beats the one-term
    # doc; within the full matches the SHORTER doc wins (doc 0, dl=3,
    # beats doc 4's tf=3 — k1=1.2 saturates tf fast, length norm doesn't)
    assert set(ids[:2]) == {0, 4}, ids
    assert ids.index(1) < ids.index(2), ids


def test_bm25_matches_reference_formula(spark):
    """Spark scores equal a from-scratch Python BM25 (Lucene idf form)
    to the micro digit."""
    from liblognorm_spark.functions.search import bm25_topk

    corpus = {
        0: "x y z x",
        1: "x filler words here",
        2: "y y z filler pad",
        3: "no match at all",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string")
    terms = ["x", "y"]
    got = {r.doc_id: r.score_micros for r in bm25_topk(docs, terms, k=10).collect()}

    toks = {i: t.split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = float(sum(len(w) for w in toks.values())) / float(n)
    k1, b = 1.2, 0.75
    exp = {}
    for i, w in toks.items():
        s = 0.0
        for t in terms:
            df = sum(1 for ww in toks.values() if t in ww)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            tf = float(w.count(t))
            s = s + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (float(len(w)) / avgdl)))
        if int(s * 1000000.0) > 0:
            exp[i] = int(s * 1000000.0)
    assert got == exp, (got, exp)


def test_bm25_plan_is_projection_plus_takeordered(spark):
    """Scoring must stay a single codegen projection over the scan with
    TakeOrdered on top — no join, no exchange, no explode (the stats
    pass is a separate tiny aggregate, already collected)."""
    from liblognorm_spark.functions.search import bm25_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = bm25_topk(docs, ["customer", "window", "merge"], k=15)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan  # no explode
