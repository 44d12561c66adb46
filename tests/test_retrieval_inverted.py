"""Inverted-index BM25 (operators/retrieval.py bm25_scores_inverted):
the unbounded-query-batch tier must reproduce the literal multi-query
scorer BIT-FOR-BIT on every matched (doc, query) pair, and the fused
hybrid-retrieval output built on it must equal the literal form's on
the graded shape."""

import math

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.operators.retrieval import (
    bm25_fit,
    bm25_scores_inverted,
    bm25_scores_multi,
    query_term_sets,
)

DOCS = [
    (0, "spark runs a query over the window and a merge of windows"),
    (1, "the query window moved; merge merge merge"),
    (2, "nothing relevant here at all"),
    (3, "spark spark spark query"),
    (4, "merge window spark"),
    (5, ""),
    (6, "a b c d e f g h i j k l m n o p q r s t"),
    (7, "query query query query window"),
]


def _corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _models(docs):
    qs = query_term_sets(
        [(0, "spark query window merge"), (1, "merge nothing q")], 4
    )
    union_terms = []
    for _, ts in qs:
        for t in ts:
            if t not in union_terms:
                union_terms.append(t)
    model, avgdl = bm25_fit(docs, union_terms, "text")
    idf = dict(model)
    return [(qid, [(t, idf[t]) for t in ts]) for qid, ts in qs], avgdl


def test_inverted_bit_identical_to_literal_on_matched_pairs(spark):
    docs = _corpus(spark)
    qmodels, avgdl = _models(docs)
    lit = {
        (r["doc_id"], r["query_id"]): r["bm25"]
        for r in bm25_scores_multi(
            docs, qmodels, avgdl, "text", "doc_id"
        ).collect()
    }
    inv = {
        (r["doc_id"], r["query_id"]): r["bm25"]
        for r in bm25_scores_inverted(
            docs, qmodels, avgdl, "text", "doc_id"
        ).collect()
    }
    # matched ⟺ bm25 > 0 in the literal form (idf > 0 always)
    matched = {k: v for k, v in lit.items() if v > 0.0}
    assert set(inv) == set(matched)
    for k, v in matched.items():
        # bit-for-bit, not approx: same IEEE adds in the same order
        assert math.copysign(1, inv[k]) == math.copysign(1, v)
        assert inv[k].hex() == v.hex(), (k, inv[k].hex(), v.hex())
    # sanity: the literal form really does emit unmatched zeros the
    # inverted form omits (doc 5 is empty, doc 2/6 match query 0 never)
    assert len(lit) > len(matched)


def test_inverted_plan_constant_in_query_count(spark):
    """The whole point of the tier: the plan's EXPRESSION/CODEGEN shape
    must not grow with |queries| (the literal form compiles per-query
    scoring branches). Since round 11 the bounded (term, query, idf)
    dimension rides as ONE folded array-of-structs Literal
    (functions/lookup.py literal_table) — DATA inside that single
    literal is allowed to grow (it is a constant object, not generated
    code, and literal_table caps it with a createDataFrame fallback);
    per-query EXPRESSION growth is not. Canonicalizing literal payloads
    out of the plan text keeps exactly that distinction: a
    reintroduced per-query branch grows the canonical text, the folded
    data literal does not."""
    import re

    docs = _corpus(spark)
    qmodels, avgdl = _models(docs)

    def plan_len(models):
        d = bm25_scores_inverted(docs, models, avgdl, "text", "doc_id")
        s = d._jdf.queryExecution().optimizedPlan().toString()
        # fold literal payloads: the terms dimension prints as
        # inline([[term,qid,pos,idf], ...]) — one constant object
        return len(re.sub(r"inline\(\[\[.*?\]\]\)", "inline([...])", s))

    few = plan_len(qmodels)
    idf = dict(qmodels[0][1])
    many = plan_len(
        [(i, list(qmodels[0][1])) for i in range(64)]
    )
    assert many < few * 2, (few, many)
    # and the node count itself is identical — growth could only ever
    # be data inside the one folded literal
    def n_nodes(models):
        d = bm25_scores_inverted(docs, models, avgdl, "text", "doc_id")
        return len(
            d._jdf.queryExecution()
            .optimizedPlan()
            .toString()
            .splitlines()
        )

    assert n_nodes([(i, list(qmodels[0][1])) for i in range(64)]) == n_nodes(
        qmodels
    )


def test_qid_validation_rejects_non_ints(spark):
    docs = _corpus(spark)
    qmodels, avgdl = _models(docs)
    bad = [("q1", qmodels[0][1])]
    with pytest.raises(TypeError, match="query_id must be an int"):
        bm25_scores_inverted(docs, bad, avgdl, "text", "doc_id")
    with pytest.raises(TypeError, match="query_id must be an int"):
        bm25_scores_multi(docs, bad, avgdl, "text", "doc_id")


def test_qid_accepts_numpy_integral(spark):
    """numpy.int64 qids arrive naturally from pandas-built query
    batches and were valid inputs before the _check_qids guard existed
    (round-10 advice): any numbers.Integral must pass, bool must not."""
    import numpy as np

    docs = _corpus(spark)
    qmodels, avgdl = _models(docs)
    np_models = [(np.int64(qid), model) for qid, model in qmodels]
    base = {
        (r["doc_id"], r["query_id"]): r["bm25"]
        for r in bm25_scores_multi(
            docs, qmodels, avgdl, "text", "doc_id"
        ).collect()
    }
    for fn in (bm25_scores_multi, bm25_scores_inverted):
        rows = fn(docs, np_models, avgdl, "text", "doc_id").collect()
        assert rows, fn.__name__
        for r in rows:
            assert base[(r["doc_id"], r["query_id"])] == r["bm25"]
    with pytest.raises(TypeError, match="query_id must be an integer"):
        bm25_scores_multi(docs, [(True, qmodels[0][1])], avgdl, "text", "doc_id")


def test_empty_model_rejected(spark):
    docs = _corpus(spark)
    qmodels, avgdl = _models(docs)
    with pytest.raises(ValueError, match="empty term model"):
        bm25_scores_inverted(docs, [(9, [])], avgdl, "text", "doc_id")


def test_hybrid_inverted_member_equals_literal_member(spark):
    """The graded twin: q_hybrid_inverted's fused top-k must equal
    q_hybrid_retrieval's row-for-row on the grading-shaped data (every
    query has ≥ HR_POOL matched docs, so dropping unmatched zero-score
    pairs cannot change the pool)."""
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    a = entry.q_hybrid_retrieval(spark, sf_dir).collect()
    b = entry.q_hybrid_inverted(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_auto_dispatch_shapes_identical_across_threshold(spark):
    """bm25_scores_auto must return the SAME rows whichever branch the
    threshold selects — matched pairs only, identical doubles."""
    from merchant_classification_spark.operators.retrieval import (
        bm25_scores_auto,
    )

    docs = _corpus(spark)
    qmodels, avgdl = _models(docs)

    def rows(threshold):
        return {
            (r["doc_id"], r["query_id"]): r["bm25"].hex()
            for r in bm25_scores_auto(
                docs, qmodels, avgdl, "text", "doc_id", threshold=threshold
            ).collect()
        }

    lit_branch = rows(threshold=10)   # |q|=2 <= 10 -> literal + filter
    inv_branch = rows(threshold=0)    # |q|=2 > 0  -> inverted
    assert lit_branch == inv_branch
    assert len(lit_branch) > 0


def test_retrieval_multi_hof_identity(spark):
    """Round 11 rebuilt bm25_scores_multi's scoring tree as HOFs over
    literal arrays (plan-size/driver-cost optimization): its output
    must stay BIT-identical to the original unrolled expression chain
    — same tf cells, same ((idf·tf)·(k1+1))/(tf+norm) contributions,
    same left-to-right 0.0-seeded fold. This pins the rolled form to
    an inline unrolled reference on every (doc, query) pair."""
    k1, b = 1.2, 0.75
    docs = _corpus(spark)
    qmodels, avgdl = _models(docs)
    union_terms = []
    for _, model in qmodels:
        for term, _ in model:
            if term not in union_terms:
                union_terms.append(term)
    t_ix = {term: i for i, term in enumerate(union_terms)}

    from merchant_classification_spark.functions.text_analysis import tokens

    def unrolled_reference(t):
        # the pre-round-11 implementation, verbatim shape
        dl = F.size(t)
        norm = F.lit(float(k1)) * (
            F.lit(1.0 - b)
            + F.lit(float(b)) * (dl.cast("double") / F.lit(float(avgdl)))
        )
        tfs = F.array(
            *[
                F.size(F.filter(t, lambda x: x == F.lit(term))).cast(
                    "double"
                )
                for term in union_terms
            ]
        )

        def scores(bound):
            tf_arr = bound["tfs"]
            nrm = bound["norm"]
            out = []
            for qid, model in qmodels:
                s = F.lit(0.0)
                for term, idf in model:
                    tf = F.element_at(tf_arr, t_ix[term] + 1)
                    s = s + F.lit(float(idf)) * tf * F.lit(
                        float(k1 + 1.0)
                    ) / (tf + nrm)
                out.append(
                    F.struct(
                        F.lit(int(qid)).cast("long").alias("query_id"),
                        s.alias("bm25"),
                    )
                )
            return F.array(*out)

        return F.element_at(
            F.transform(
                F.array(F.struct(tfs.alias("tfs"), norm.alias("norm"))),
                scores,
            ),
            1,
        )

    arr = F.element_at(
        F.transform(F.array(tokens("text")), unrolled_reference), 1
    )
    ref = {
        (r["doc_id"], r["query_id"]): r["bm25"].hex()
        for r in docs.select(
            F.col("doc_id"), F.explode(arr).alias("_e")
        )
        .select(
            "doc_id",
            F.col("_e")["query_id"].alias("query_id"),
            F.col("_e")["bm25"].alias("bm25"),
        )
        .collect()
    }
    got = {
        (r["doc_id"], r["query_id"]): r["bm25"].hex()
        for r in bm25_scores_multi(
            docs, qmodels, avgdl, "text", "doc_id", k1=k1, b=b
        ).collect()
    }
    assert got == ref
    assert len(got) == len(DOCS) * len(qmodels)


def test_tokens_sql_bit_parity_with_tokens(spark):
    """Round 11 renders the multi-query scorer as ONE SQL string, which
    embeds a SQL-text twin of the tokens() kernel (tokens_sql). The two
    must tokenize identically on every adversarial shape a corpus can
    contain — quotes, backslashes, unicode, digits, NULL, empty, blank,
    punctuation-only — or every downstream tf (and so every score)
    drifts."""
    from merchant_classification_spark.functions.text_analysis import (
        tokens,
        tokens_sql,
    )

    cases = [
        (0, None),
        (1, ""),
        (2, "   "),
        (3, "...!!!###"),
        (4, "Hello, World!"),
        (5, "don't stop-me now"),
        (6, "back\\slash 'single' \"double\""),
        (7, "unicode: naïve café über 北京 🙂 mixed7digits42"),
        (8, "a  b\t c\nd"),
        (9, "UPPER lower 0123456789 '' ' x"),
        (10, "tab\tsep\ttokens"),
        (11, "trailing space "),
        (12, " leading"),
        (13, "x" * 500 + " y"),
    ]
    df = spark.createDataFrame(cases, "id long, text string")
    got = df.select(
        "id",
        tokens("text").alias("py"),
        F.expr(tokens_sql("`text`")).alias("sql"),
    ).collect()
    for r in got:
        assert r["py"] == r["sql"], (r["id"], r["py"], r["sql"])
