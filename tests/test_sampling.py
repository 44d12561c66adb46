"""Sampling/split invariant tests (FIXTURES.md §6 — not DuckDB-
reproducible, so checked by seeded invariants instead of an oracle)."""

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.operators.sampling import (
    class_counts_fractions,
    class_percentile_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """Classes straddling the thresholds: big (2000), mid (300), small (60)."""
    rows = (
        [("big", i) for i in range(2000)]
        + [("mid", i) for i in range(300)]
        + [("small", i) for i in range(60)]
    )
    return spark.createDataFrame(rows, ["cls", "v"]).repartition(8)


def test_capped_fractions(skewed):
    fr = class_counts_fractions(skewed, "cls", sample_size=500, min_count=100)
    assert "small" not in fr  # below threshold → dropped
    assert fr["mid"] == 1.0  # 500/300 capped at 1
    assert abs(fr["big"] - 0.25) < 1e-12


def test_capped_sampler_sizes(skewed):
    out = stratified_sample(skewed, "cls", sample_size=500, min_count=100, seed=1)
    counts = {r.cls: r.cnt for r in out.groupBy("cls").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"big", "mid"}
    assert counts["mid"] == 300
    assert 380 <= counts["big"] <= 620  # binomial(2000, .25) ± 5σ


def test_oversample_floor(skewed):
    fr = class_counts_fractions(
        skewed, "cls", sample_size=100, oversample_floor=100
    )
    # small class (60 rows): rate bumped to min(1, 100/60 + .05) = 1.0
    assert fr["small"] == 1.0


def test_fixed_sampler_exact_cap(skewed):
    out = stratified_sample(skewed, "cls", sample_size=50, fixed=True, seed=2)
    counts = {r.cls: r.cnt for r in out.groupBy("cls").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"big": 50, "mid": 50, "small": 50}


def test_sampler_deterministic(skewed):
    a = stratified_sample(skewed, "cls", sample_size=500, min_count=100, seed=9)
    b = stratified_sample(skewed, "cls", sample_size=500, min_count=100, seed=9)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_partition_and_fraction(skewed):
    train, test = class_percentile_split(skewed, "cls", test_fraction=0.1, seed=5)
    n_train, n_test, n_all = train.count(), test.count(), skewed.count()
    assert n_train + n_test == n_all
    # disjoint: no (cls, v) appears in both
    overlap = train.select("cls", "v").intersect(test.select("cls", "v")).count()
    assert overlap == 0
    # per-class test fraction ≈ 0.10 for the big class
    big_test = test.where(F.col("cls") == "big").count()
    assert 150 <= big_test <= 250  # 2000 * 0.1 ± tolerance

    # same seed → same split
    train2, test2 = class_percentile_split(skewed, "cls", test_fraction=0.1, seed=5)
    assert test2.count() == n_test
    assert test2.select("cls", "v").exceptAll(test.select("cls", "v")).count() == 0


def test_hash_sample_partition_stable(tables):
    """The hash sampler keeps the SAME rows under any partitioning —
    the property rand(seed) lacks (per-partition-index seeding) — and
    approximates the requested fraction."""
    from merchant_classification_spark.operators.sampling import hash_sample

    docs = tables["documents"].select("doc_id", "text")
    a = {
        r.doc_id
        for r in hash_sample(docs.repartition(1), ["doc_id"], 0.3).collect()
    }
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(17), ["doc_id"], 0.3).collect()
    }
    assert a == b and a
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n
    # independent salts give (near-)independent samples
    c = {
        r.doc_id
        for r in hash_sample(docs, ["doc_id"], 0.3, salt="other").collect()
    }
    assert c != a
    # disjoint percentile ranges compose without a second pass
    from pyspark.sql import functions as F

    from merchant_classification_spark.operators.sampling import hash_percentile

    p = hash_percentile(["doc_id"])
    lo = {r.doc_id for r in docs.where(p < F.lit(0.3)).collect()}
    hi = {r.doc_id for r in docs.where(p >= F.lit(0.3)).collect()}
    assert lo == a and not (lo & hi) and len(lo) + len(hi) == n


def test_hash_split_disjoint_exhaustive_stable(tables):
    from merchant_classification_spark.operators.sampling import hash_split

    docs = tables["documents"].select("doc_id", "text")
    train, test = hash_split(docs, ["doc_id"], test_fraction=0.2)
    tr = {r.doc_id for r in train.collect()}
    te = {r.doc_id for r in test.collect()}
    assert not (tr & te)
    assert len(tr) + len(te) == docs.count()
    # membership is stable when the corpus grows: the same doc lands on
    # the same side after adding rows (no window rank to shift it)
    bigger = docs.unionByName(
        docs.selectExpr("doc_id + 1000000 AS doc_id", "text")
    )
    _, test2 = hash_split(bigger, ["doc_id"], test_fraction=0.2)
    te2 = {r.doc_id for r in test2.collect() if r.doc_id < 1000000}
    assert te2 == te
