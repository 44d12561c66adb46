"""Tests for operators/decontaminate.py — n-gram train/eval overlap."""

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.operators.decontaminate import (
    decontaminate,
    ngram_overlap_report,
    word_ngrams,
)


def _docs(spark):
    rows = [
        # doc 1 contains eval doc 100's exact 4-gram "the cat sat down"
        (1, "today the cat sat down on the mat"),
        # doc 2 shares words but no 4-gram
        (2, "the cat stood up on the mat"),
        # doc 3 is a verbatim copy of the eval doc (max overlap)
        (3, "the cat sat down quietly"),
        # doc 4 too short to carry a 4-gram
        (4, "tiny doc"),
        (100, "the cat sat down quietly"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_word_ngrams_basic(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["i", "t"])
    got = df.select(word_ngrams("t", 3).alias("g")).head()["g"]
    assert got == ["a b c", "b c d", "c d e"]


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")], ["i", "t"])
    got = [r["g"] for r in df.select(word_ngrams("t", 3).alias("g")).collect()]
    assert got == [[], []]


def test_word_ngrams_dedups_repeats(spark):
    df = spark.createDataFrame([(1, "x y x y x y")], ["i", "t"])
    got = df.select(word_ngrams("t", 2).alias("g")).head()["g"]
    assert sorted(got) == ["x y", "y x"]


def test_overlap_report_flags_expected_docs(spark):
    docs = _docs(spark)
    ev = docs.where(F.col("doc_id") == 100)
    tr = docs.where(F.col("doc_id") != 100)
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in ngram_overlap_report(tr, ev, "doc_id", "text", n=4).collect()
    }
    # doc 1 shares exactly one 4-gram; doc 3 shares both of the eval
    # doc's 4-grams; docs 2 and 4 are clean
    assert got == {1: 1, 3: 2}


def test_hashed_grams_equivalent(spark):
    docs = _docs(spark)
    ev = docs.where(F.col("doc_id") == 100)
    tr = docs.where(F.col("doc_id") != 100)
    plain = ngram_overlap_report(
        tr, ev, "doc_id", "text", n=4, hash_grams=False
    ).collect()
    hashed = ngram_overlap_report(
        tr, ev, "doc_id", "text", n=4, hash_grams=True
    ).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, hashed))


def test_decontaminate_drops_flagged_keeps_rest(spark):
    docs = _docs(spark)
    ev = docs.where(F.col("doc_id") == 100)
    tr = docs.where(F.col("doc_id") != 100)
    kept = decontaminate(tr, ev, "doc_id", "text", n=4)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4]
    # all original columns survive
    assert kept.columns == tr.columns


def test_no_eval_overlap_keeps_everything(spark):
    docs = _docs(spark)
    ev = spark.createDataFrame([(0, "completely different words here")],
                               ["doc_id", "text"])
    tr = docs
    assert decontaminate(tr, ev, "doc_id", "text", n=4).count() == docs.count()


@pytest.mark.parametrize("n", [2, 5])
def test_overlap_report_no_python_stage(spark, n):
    docs = _docs(spark)
    ev = docs.where(F.col("doc_id") == 100)
    tr = docs.where(F.col("doc_id") != 100)
    plan = (
        ngram_overlap_report(tr, ev, "doc_id", "text", n=n)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # pure JVM — no UDF fallback anywhere
