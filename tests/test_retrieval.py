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
