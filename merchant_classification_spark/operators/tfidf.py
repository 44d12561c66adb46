"""Corpus TF-IDF — DataFrame-native term/document statistics.

The MLlib path (HashingTF → IDF, used by ml/classifier.py) hashes terms
away; this operator keeps the actual term strings, which is what corpus
analysis needs (vocabulary pruning, boilerplate mining, keyword-ish
retrieval, stopword discovery for a new domain).

Shape at scale: one explode + two hash aggregates, all shuffling on the
term key (frequent terms are the heavy keys — exactly the distribution
AQE skew handling is for). ``n_docs`` rides along via a 1-row broadcast
cross join so the whole thing stays one lazy plan — no driver-side
``.count()`` materialization inside the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from merchant_classification_spark.functions.text_analysis import tokens


def term_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf) + per-term df and corpus n_docs on every row.

    tf = occurrences of term in doc; df = docs containing term; exact
    integers throughout.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    return tf.join(df_, "term").crossJoin(F.broadcast(n))


def tfidf(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """term_stats + smoothed idf: idf = ln((n_docs + 1)/(df + 1)) + 1,
    tfidf = tf · idf (the sklearn-style smooth variant, which never
    divides by zero and keeps unseen-term idf finite)."""
    stats = term_stats(docs, text_col, id_col)
    idf = (
        F.log(
            (F.col("n_docs").cast("double") + 1.0)
            / (F.col("df").cast("double") + 1.0)
        )
        + 1.0
    )
    return stats.select(
        "doc_id",
        "term",
        "tf",
        "df",
        "n_docs",
        idf.alias("idf"),
        (F.col("tf").cast("double") * idf).alias("tfidf"),
    )
