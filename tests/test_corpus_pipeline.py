"""End-to-end corpus-prep pipeline: funnel counts, dedup behavior,
split stability, and PII scrub verified on a crafted corpus."""

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.pipelines.corpus import prepare_corpus


@pytest.fixture(scope="module")
def raw_docs(spark):
    good = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, good),
        (2, good),                                  # exact dup of 1
        (3, good + " "),                            # exact-dedup survivor, fingerprint dup of 1
        (4, "a completely different sentence about weather patterns and ships"),
        (5, "yes " * 30),                           # repetitive → repetition gate
        (6, "tiny"),                                # too short
        (7, "mail me at spy@example.com about the quick brown fox story today friends"),
        (8, good.replace("dog", "dog today") + " with more words appended here"),  # near-dup-ish of 1
    ] + [
        (100 + i, f"document number {i} discusses topic {i % 7} in satisfying depth "
                  f"with several additional unique words item{i} detail{i}")
        for i in range(30)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_prepare_corpus_funnel(spark, raw_docs):
    out, report = prepare_corpus(raw_docs, near_dup_threshold=0.6)
    assert report["input"] == 38
    # short + repetitive docs gone before dedup
    ids = {r.id for r in out.select("id").collect()}
    assert 5 not in ids and 6 not in ids
    # exact dup dropped, keeping min id
    assert 1 in ids and 2 not in ids
    # fingerprint dup (trailing whitespace) dropped
    assert 3 not in ids
    assert report["after_exact_dedup"] > report["after_fingerprint_dedup"] or 3 not in ids
    # PII scrubbed in the surviving text
    row7 = out.where(F.col("id") == 7).collect()
    if row7:
        assert "<EMAIL>" in row7[0].text and "spy@example.com" not in row7[0].text
    # counts are a monotone funnel
    assert (
        report["input"]
        >= report["after_filters"]
        >= report["after_exact_dedup"]
        >= report["after_fingerprint_dedup"]
        >= report["after_near_dedup"]
    )
    assert report["train"] + report["val"] == report["after_near_dedup"]


def test_split_is_stable(spark, raw_docs):
    out1, _ = prepare_corpus(raw_docs)
    out2, _ = prepare_corpus(raw_docs.repartition(7))
    s1 = {(r.id, r.split) for r in out1.select("id", "split").collect()}
    s2 = {(r.id, r.split) for r in out2.select("id", "split").collect()}
    assert s1 == s2


def test_tfidf_scores(spark):
    import math

    from merchant_classification_spark.operators.tfidf import tfidf

    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        ["doc_id", "text"],
    )
    rows = {(r.doc_id, r.term): r for r in tfidf(df).collect()}
    r = rows[(1, "apple")]
    assert r.tf == 2 and r.df == 1 and r.n_docs == 3
    want_idf = math.log(4 / 2) + 1
    assert abs(r.idf - want_idf) < 1e-12
    assert abs(r.tfidf - 2 * want_idf) < 1e-12
    assert rows[(2, "banana")].df == 2
    assert rows[(3, "cherry")].tf == 2 and rows[(3, "cherry")].df == 2


def test_prepare_corpus_governance_stages(spark, raw_docs):
    out, report = prepare_corpus(
        raw_docs,
        near_dup_threshold=0.6,
        k_anonymity_quasi=["lang"],
        k_anonymity_k=2,
        export_token_salt="corp-v1",
    )
    assert "after_k_anonymity" in report
    assert report["after_k_anonymity"] <= report["after_filters"]
    rows = out.select("id", "export_id").collect()
    assert all(r["export_id"] is not None and len(r["export_id"]) == 64 for r in rows)
    # deterministic across reruns
    out2, _ = prepare_corpus(
        raw_docs,
        near_dup_threshold=0.6,
        k_anonymity_quasi=["lang"],
        k_anonymity_k=2,
        export_token_salt="corp-v1",
    )
    assert {tuple(r) for r in rows} == {
        tuple(r) for r in out2.select("id", "export_id").collect()
    }
