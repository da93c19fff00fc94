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


# ------------------------------------------------------- unigram NLL


def test_unigram_nll_exact_values(spark):
    """Spark result equals a from-scratch Python computation of the
    scaled-integer NLL pipeline (floor(-ln(cnt/total)*2^20), long sums,
    integer-division mean)."""
    import math

    from liblognorm_spark.functions.dedup import unpersist_dedup_caches
    from liblognorm_spark.functions.text import unigram_nll

    corpus = {0: "a a a b", 1: "a b c", 2: "c d"}
    docs = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.mean_nll_micros)
           for r in unigram_nll(docs).collect()}
    unpersist_dedup_caches()

    toks = {i: t.split() for i, t in corpus.items()}
    allw = [w for ws in toks.values() for w in ws]
    total = len(allw)
    cnt = {w: allw.count(w) for w in set(allw)}
    nll = {c: math.floor(-math.log(float(c) / float(total)) * 1048576.0)
           for c in set(cnt.values())}
    exp = {}
    for i, ws in toks.items():
        s = sum(nll[cnt[w]] for w in ws)
        exp[i] = (len(ws), (s * 1000000) // (len(ws) * 1048576))
    assert got == exp, (got, exp)


def test_unigram_nll_rare_tokens_score_higher(spark):
    """A doc made of hapaxes must out-score a doc made of the most
    common token."""
    from liblognorm_spark.functions.dedup import unpersist_dedup_caches
    from liblognorm_spark.functions.text import unigram_nll

    docs = spark.createDataFrame(
        [(0, "common common common common common common"),
         (1, "rare1 rare2 rare3"),
         (2, "common common common")],
        "doc_id long, text string")
    got = {r.doc_id: r.mean_nll_micros for r in unigram_nll(docs).collect()}
    unpersist_dedup_caches()
    assert got[1] > got[0] and got[1] > got[2]


def test_unigram_nll_invariant_under_partitioning(spark):
    """Long sums + integer division: identical output for 1 vs 13
    input partitions."""
    from liblognorm_spark.functions.dedup import unpersist_dedup_caches
    from liblognorm_spark.functions.text import unigram_nll

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {tuple(r) for r in unigram_nll(docs.coalesce(1)).collect()}
    b = {tuple(r) for r in unigram_nll(docs.repartition(13)).collect()}
    unpersist_dedup_caches()
    assert a == b and len(a) > 0


def test_unigram_nll_plan_broadcasts_count_map(spark):
    """The (cnt -> nll) frame broadcasts into the vocab; the word join
    is an equi-join; nothing cartesian or single-partition."""
    from liblognorm_spark.functions.dedup import unpersist_dedup_caches
    from liblognorm_spark.functions.text import unigram_nll

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = unigram_nll(docs)._jdf.queryExecution().executedPlan().toString()
    unpersist_dedup_caches()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SinglePartition" not in plan, plan
