"""BM25 lexical retrieval scoring over a document corpus.

Training-data pipelines use lexical retrieval for quality-targeted
selection (pull documents similar to a trusted seed set), decontamination
triage, and eval-set construction; BM25 (Robertson/Spärck Jones's Okapi
weighting) is the standard scorer. The reference engine has no retrieval
tier (its similarity surface is embedding ANN); this implements the
classic bag-of-words twin so a query set can be scored corpus-wide as a
single map-only projection.

Engine-portability discipline (same as ``tfidf.py`` / the DSIR fit): the
corpus statistics — per-term document frequency, average document length
— are computed in ONE bounded aggregate pass, converted to double
literals in Python, and baked into the scoring expression, so an external
SQL oracle replaying the same integer counts through the same ``math.log``
reproduces every score bit-for-bit (engines only ever multiply/add the
same literals in the same order).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from merchant_classification_spark.functions.text_analysis import tokens


def bm25_fit(
    df: DataFrame, query_terms: list[str], text_col: str = "text"
) -> tuple[list[tuple[str, float]], float]:
    """Corpus statistics for :func:`bm25_scores`: returns
    ``([(term, idf)], avgdl)`` with ``idf = ln(1 + (N − df + 0.5)/(df +
    0.5))`` (the non-negative Robertson–Spärck Jones form) and ``avgdl``
    the mean token count.

    Scale shape: ONE aggregate pass — the token array is bound once per
    row (the ``transform(array(tokens), …)`` binding idiom, see
    ``dedup.shingles``) into a struct carrying the doc length and one
    ``array_contains`` flag per query term, then a single scalar
    aggregate reduces to |terms| + 2 driver scalars (the
    bounded-driver-scalar pattern). No explode, no shuffle beyond the
    partial-aggregate merge.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    stats = F.element_at(
        F.transform(
            F.array(tokens(text_col)),
            lambda t: F.struct(
                F.size(t).alias("dl"),
                *[
                    F.array_contains(t, term).alias(f"c{i}")
                    for i, term in enumerate(query_terms)
                ],
            ),
        ),
        1,
    )
    bound = df.select(stats.alias("_s"))
    row = bound.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.col("_s")["dl"]), F.lit(0)).alias("dl_sum"),
        *[
            F.sum(
                F.when(F.col("_s")[f"c{i}"], 1).otherwise(0)
            ).alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    ).collect()[0]
    n = int(row["n"])
    if n == 0:
        raise ValueError("cannot fit BM25 statistics on an empty corpus")
    avgdl = float(row["dl_sum"]) / float(n)
    model = [
        (
            term,
            math.log(
                1.0
                + (n - int(row[f"df{i}"]) + 0.5) / (int(row[f"df{i}"]) + 0.5)
            ),
        )
        for i, term in enumerate(query_terms)
    ]
    return model, avgdl


def bm25_scores(
    df: DataFrame,
    model: list[tuple[str, float]],
    avgdl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against a fitted BM25 model:
    ``bm25 = Σ_terms idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``,
    accumulated left-to-right in the model's term order (fixed IEEE
    order — replayable); ``matched`` counts query terms present.

    Scale shape: the model is |terms| literals in the plan, so scoring is
    ONE map-only codegen projection — no join, no shuffle, linear in
    corpus bytes; ranking composes downstream with the engine's top-k
    operators. Term frequencies come from ``F.filter`` inside the same
    bound-token lambda, so the document is tokenized exactly once.

    Returns (id, n_tokens, matched, bm25).
    """
    if not model:
        raise ValueError("model must be non-empty")
    if avgdl <= 0:
        raise ValueError("avgdl must be positive")

    def score_struct(t: Column) -> Column:
        dl = F.size(t)
        norm = F.lit(float(k1)) * (
            F.lit(1.0 - b) + F.lit(float(b)) * (dl.cast("double") / F.lit(float(avgdl)))
        )
        s: Column = F.lit(0.0)
        matched: Column = F.lit(0)
        for term, idf in model:
            tf = F.size(F.filter(t, lambda x: x == F.lit(term))).cast("double")
            s = s + F.lit(float(idf)) * tf * F.lit(float(k1 + 1.0)) / (tf + norm)
            matched = matched + F.when(tf > 0, 1).otherwise(0)
        return F.struct(
            dl.cast("int").alias("n_tokens"),
            matched.alias("matched"),
            s.alias("bm25"),
        )

    stats = F.element_at(
        F.transform(F.array(tokens(text_col)), score_struct), 1
    )
    bound = df.select(F.col(id_col), stats.alias("_s"))
    return bound.select(
        F.col(id_col),
        F.col("_s")["n_tokens"].alias("n_tokens"),
        F.col("_s")["matched"].alias("matched"),
        F.col("_s")["bm25"].alias("bm25"),
    )
