"""BM25 retrieval scoring: fit statistics, score formula, edge cases —
checked against a pure-Python replay."""

import math

import pytest

from merchant_classification_spark.operators.retrieval import (
    bm25_fit,
    bm25_scores,
)

DOCS = [
    (1, "spark query engine runs a spark query plan"),
    (2, "ducks swim in the pond"),
    (3, "query planner"),
    (4, ""),
    (5, None),
]


def _toks(s):
    import re

    c = re.sub(r"[^a-z0-9']+", " ", (s or "").lower()).strip()
    return c.split(" ") if c else []


def _naive(docs, terms, k1=1.2, b=0.75):
    tokd = {i: _toks(t) for i, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in tokd.values()) / n
    idf = {
        q: math.log(
            1.0
            + (n - sum(q in t for t in tokd.values()) + 0.5)
            / (sum(q in t for t in tokd.values()) + 0.5)
        )
        for q in terms
    }
    out = {}
    for i, t in tokd.items():
        norm = k1 * ((1.0 - b) + b * (float(len(t)) / avgdl))
        s, m = 0.0, 0
        for q in terms:
            tf = float(t.count(q))
            s = s + idf[q] * tf * (k1 + 1.0) / (tf + norm)
            m += 1 if tf > 0 else 0
        out[i] = (len(t), m, s)
    return idf, avgdl, out


def test_bm25_fit_and_scores_vs_naive(spark):
    terms = ["spark", "query", "pond"]
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model, avgdl = bm25_fit(df, terms, "text")
    idf_want, avgdl_want, scores_want = _naive(DOCS, terms)
    assert avgdl == avgdl_want
    assert dict(model) == idf_want
    assert [t for t, _ in model] == terms  # model preserves query order

    got = {
        r.doc_id: (r.n_tokens, r.matched, r.bm25)
        for r in bm25_scores(df, model, avgdl, "text", "doc_id").collect()
    }
    assert got == scores_want
    # match accounting and score sanity (NB: BM25's length
    # normalization legitimately boosts very short matching docs, so no
    # cross-doc ranking is asserted beyond matched > unmatched)
    assert got[1][1] == 2 and got[2][1] == 1 and got[3][1] == 1
    assert min(got[d][2] for d in (1, 2, 3)) > 0.0
    # empty / NULL text: zero tokens, zero matches, zero score
    for d in (4, 5):
        assert got[d] == (0, 0, 0.0)


def test_bm25_validates_inputs(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_fit(df, [], "text")
    with pytest.raises(ValueError):
        bm25_fit(df, ["a", "a"], "text")
    with pytest.raises(ValueError):
        bm25_scores(df, [], 1.0)
    with pytest.raises(ValueError):
        bm25_scores(df, [("a", 1.0)], 0.0)
    with pytest.raises(ValueError):
        bm25_fit(df.where("doc_id < 0"), ["a"], "text")


def test_query_term_sets_order_dedup_and_bounds():
    from merchant_classification_spark.operators.retrieval import (
        query_term_sets,
    )

    got = query_term_sets(
        [(1, "The cat, the CAT sat!"), (2, None), (3, "a b c d e")], 3
    )
    assert got == [(1, ["the", "cat", "sat"]), (2, []), (3, ["a", "b", "c"])]
    import pytest as _pt

    with _pt.raises(ValueError):
        query_term_sets([(1, "x")], 0)


def test_rrf_fuse_math_and_missing_legs(spark):
    from merchant_classification_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank_lex int",
    )
    sem = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, doc_id long, rank_sem int",
    )
    rows = {r["doc_id"]: r for r in rrf_fuse(lex, sem, k=4, k_rrf=60).collect()}
    # doc 11 is in both legs; 10/12 lex-only; 13 sem-only
    assert rows[11]["rrf"] == 1.0 / 62 + 1.0 / 61
    assert rows[10]["rrf"] == 1.0 / 61
    assert rows[13]["rrf"] == 1.0 / 62
    assert rows[12]["rrf"] == 1.0 / 63
    assert rows[10]["rank_sem"] is None and rows[13]["rank_lex"] is None
    # both-legs doc outranks either single leg here
    order = sorted(rows.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in order] == [11, 10, 13, 12]


def test_rrf_fuse_tiebreak_on_doc_id(spark):
    from merchant_classification_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 20, 1), (1, 7, 1)],  # impossible dup rank, but ties must break
        "query_id long, doc_id long, rank_lex int",
    )
    sem = spark.createDataFrame(
        [], "query_id long, doc_id long, rank_sem int"
    )
    got = [
        (r["doc_id"], r["rank"])
        for r in rrf_fuse(lex, sem, k=2).orderBy("rank").collect()
    ]
    assert got == [(7, 1), (20, 2)]


def test_hybrid_member_shape_and_fusion_invariants(spark, sf_dir):
    import __spark_entry__ as entry

    out = entry.q_hybrid_retrieval(spark, sf_dir).collect()
    assert len(out) == entry.HR_K * len({r["query_id"] for r in out})
    for r in out:
        assert r["rank_lex"] is not None or r["rank_sem"] is not None
        want = (
            (1.0 / (entry.RRF_K + r["rank_lex"]) if r["rank_lex"] else 0.0)
            + (1.0 / (entry.RRF_K + r["rank_sem"]) if r["rank_sem"] else 0.0)
        )
        assert r["rrf"] == want
        assert r["doc_id"] != r["query_id"]  # both legs exclude self
