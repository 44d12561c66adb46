"""ML pipeline tests: train on synthetic narratives, verify accuracy and
in-engine evaluation metrics; full ETL → train → score round trip."""

import random

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.ml.classifier import NarrativeClassifier
from merchant_classification_spark.ml.evaluate import evaluate_per_class
from merchant_classification_spark.pipelines.etl import etl_pipeline

MERCHANTS = {
    "starbucks": "starbucks coffee {n} london",
    "amazon": "amzn mktp {n} lux",
    "virgin media": "virgin media cd {n} deb",
    "national trust": "national trust cd {n} deb",
    "tesco": "tesco stores {n} gbp",
}


def synth_rows(n_per_class=80, seed=11):
    rng = random.Random(seed)
    rows = []
    for merchant, tpl in MERCHANTS.items():
        for _ in range(n_per_class):
            rows.append((merchant, tpl.format(n=rng.randint(1000, 9999))))
    rng.shuffle(rows)
    return rows


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.createDataFrame(
        synth_rows(), ["tr_merchant", "tr_description_clean"]
    )


def test_train_and_score(labeled):
    clf = NarrativeClassifier(ngram_max=2, num_features=1 << 14, max_iter=30)
    model = clf.fit(labeled)
    scored = model.transform(labeled)
    assert "pr_merchant" in scored.columns
    # internal feature columns must not leak
    assert all(not c.startswith("_") for c in scored.columns)
    acc = scored.where(F.col("pr_merchant") == F.col("tr_merchant")).count() / scored.count()
    assert acc > 0.95, f"train accuracy too low: {acc}"


def test_evaluate_per_class(labeled):
    clf = NarrativeClassifier(ngram_max=2, num_features=1 << 14, max_iter=30)
    model = clf.fit(labeled)
    per_class, summary = evaluate_per_class(
        model.transform(labeled), "tr_merchant", "pr_merchant"
    )
    assert set(per_class.columns) == {"tr_merchant", "predicted", "total", "accuracy"}
    assert per_class.count() == len(MERCHANTS)
    assert 0.9 < summary["avg_acc"] <= 1.0
    assert summary["q_05"] <= summary["q_50"] <= summary["q_95"]


def test_model_save_load(labeled, tmp_path):
    from merchant_classification_spark.ml.classifier import NarrativeClassifierModel

    clf = NarrativeClassifier(ngram_max=2, num_features=1 << 14, max_iter=10)
    model = clf.fit(labeled)
    path = str(tmp_path / "model")
    model.save(path)
    reloaded = NarrativeClassifierModel.load(path, clf)
    a = model.transform(labeled).select("pr_merchant").collect()
    b = reloaded.transform(labeled).select("pr_merchant").collect()
    assert a == b


def test_etl_to_model_roundtrip(spark):
    """Reference pipeline end-to-end: raw noisy narratives → ETL →
    train on the train split → evaluate on the test split."""
    rng = random.Random(3)
    rows = []
    for merchant, tpl in MERCHANTS.items():
        for _ in range(120):
            desc = tpl.format(n=rng.randint(1000, 9999)) + " 14sep19 12.34 gbp"
            rows.append((merchant, desc, float(rng.randint(1, 500))))
    raw = spark.createDataFrame(rows, ["tr_merchant", "tr_description", "tr_amount"])
    out = etl_pipeline(raw, sample_size=100, count_threshold=50, seed=7)
    train, test = out["train"], out["test"]
    # cleaning removed dates/prices before formatting
    assert train.where(F.col("tr_description_clean").contains("14sep19")).count() == 0
    assert train.where(F.col("fasttext").startswith("__label__")).count() == train.count()
    # split is disjoint and roughly 90/10
    ids_train = {r.tr_description for r in train.select("tr_description").collect()}
    ids_test = {r.tr_description for r in test.select("tr_description").collect()}
    total = train.count() + test.count()
    assert 0.03 < test.count() / total < 0.25
    clf = NarrativeClassifier(ngram_max=2, num_features=1 << 14, max_iter=30)
    model = clf.fit(train)
    _, summary = evaluate_per_class(
        model.transform(test), "tr_merchant", "pr_merchant"
    )
    assert summary["avg_acc"] > 0.9


def test_subword_char_ngrams(labeled, spark):
    """fasttext-style subword features: the subword expression emits
    boundary-marked character n-grams ('<tok', 'ok>', whole '<tok>' for
    short tokens), the trained model stays a stock serializable MLlib
    pipeline, and truncated mentions that share no word n-gram with the
    training vocabulary still classify via shared subwords."""
    clf = NarrativeClassifier(
        ngram_max=2,
        num_features=1 << 14,
        max_iter=30,
        char_ngram_min=3,
        char_ngram_max=4,
    )
    model = clf.fit(labeled)
    scored = model.transform(labeled)
    # internal subword columns must not leak
    assert all(not c.startswith("_") for c in scored.columns)
    acc = (
        scored.where(F.col("pr_merchant") == F.col("tr_merchant")).count()
        / scored.count()
    )
    assert acc > 0.95, f"train accuracy too low with subwords: {acc}"

    # truncated-mention generalization: "starbuck coff" has no word
    # bigram in common with "starbucks coffee {n} london" rows, but
    # shares most subwords
    probe = spark.createDataFrame(
        [("starbucks", "starbuck coff 4411")],
        ["tr_merchant", "tr_description_clean"],
    )
    assert model.transform(probe).first().pr_merchant == "starbucks"

    # the subword expression itself: '<ab>' at n=3 -> ['<ab','ab>'];
    # a token shorter than the window contributes its whole '<a>' once
    row = spark.sql(
        "SELECT flatten(transform(array('ab','a'), t -> "
        "transform(sequence(1, greatest(length(t) + 0, 1)), i -> "
        "substring(concat('<', t, '>'), i, 3)))) AS g"
    ).first()
    assert row.g == ["<ab", "ab>", "<a>"]

    with pytest.raises(ValueError, match="char_ngram"):
        NarrativeClassifier(char_ngram_min=0, char_ngram_max=3).fit(labeled)


def test_extra_tokens_col_consumed(labeled, spark):
    # round 6: a pre-computed token-array column (e.g. fitted BPE
    # segments) hashes into the same feature space when named via
    # extra_tokens_col — and its features actually matter: two labels
    # whose TEXT is identical can only be separated by the extra column
    rows = []
    for i in range(120):
        lbl = "alpha" if i % 2 == 0 else "beta"
        rows.append((lbl, "payment ref due", [f"tag_{lbl}"]))
    df = spark.createDataFrame(
        rows, "tr_merchant string, tr_description_clean string, side array<string>"
    )
    clf = NarrativeClassifier(
        ngram_max=1,
        num_features=1 << 12,
        max_iter=30,
        extra_tokens_col="side",
    )
    model = clf.fit(df)
    scored = model.transform(df)
    acc = (
        scored.where(F.col("pr_merchant") == F.col("tr_merchant")).count()
        / scored.count()
    )
    # text alone cannot separate the labels (ref numbers are shared);
    # the tag column can — near-perfect accuracy proves it was hashed in
    assert acc > 0.95, acc


def test_extra_tokens_col_null_rows_survive(labeled, spark):
    # a NULL extra-token array must behave as "no extra tokens", not
    # NULL-poison concat() and crash HashingTF (round-7 advice fix)
    rows = []
    for i in range(60):
        lbl = "alpha" if i % 2 == 0 else "beta"
        side = [f"tag_{lbl}"] if i % 3 else None
        rows.append((lbl, f"payment ref {lbl}", side))
    df = spark.createDataFrame(
        rows, "tr_merchant string, tr_description_clean string, side array<string>"
    )
    clf = NarrativeClassifier(
        ngram_max=1, num_features=1 << 12, max_iter=10, extra_tokens_col="side"
    )
    model = clf.fit(df)  # previously raised on the NULL rows
    assert model.transform(df).count() == 60
