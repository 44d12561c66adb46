"""End-to-end train-lifecycle test: raw narratives → registered model."""

import json
import os
import random

from merchant_classification_spark.config import EngineConfig
from merchant_classification_spark.ml.classifier import NarrativeClassifier
from merchant_classification_spark.pipelines.train import train_merchant_classifier

MERCHANTS = {
    "starbucks": "starbucks coffee {n} 14sep19",
    "amazon": "amzn mktp {n} 12.34 gbp",
    "virgin media": "virgin media cd {n} deb",
    "tesco": "tesco stores {n} (ref)",
}


def _raw(spark, n=150, seed=13):
    rng = random.Random(seed)
    rows = [
        (m, t.format(n=rng.randint(1000, 9999)), float(rng.randint(1, 500)))
        for m, t in MERCHANTS.items()
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, ["tr_merchant", "tr_description", "tr_amount"])


def test_full_lifecycle(spark, tmp_path):
    cfg = EngineConfig(
        model_path=str(tmp_path),
        model_name="merchcat_test",
        sample_size=120,
        count_threshold=50,
        seed=3,
    )
    clf = NarrativeClassifier(ngram_max=2, num_features=1 << 14, max_iter=20)
    result = train_merchant_classifier(
        _raw(spark),
        config=cfg,
        classifier=clf,
        export_corpus=True,
    )
    assert result.metrics["avg_acc"] > 0.9
    assert result.per_class.count() == len(MERCHANTS)
    # corpus artifact exists and is fasttext-formatted
    with open(result.corpus_path) as f:
        first = f.readline()
    assert first.startswith("__label__")
    # run log + registry written
    runs = [json.loads(l) for l in open(os.path.join(cfg.model_path, "runs.jsonl"))]
    assert runs[0]["run_id"] == result.run_id
    assert runs[0]["metrics"]["avg_acc"] == result.metrics["avg_acc"]
    assert os.path.exists(os.path.join(cfg.model_path, "registry_merchcat_test.json"))
    # model dir is loadable; scoring raw data goes through the cleaner
    from merchant_classification_spark.ml.classifier import NarrativeClassifierModel
    from merchant_classification_spark.pipelines.etl import clean_transactions

    reloaded = NarrativeClassifierModel.load(
        os.path.join(cfg.model_path, "merchcat_test_model"), clf
    )
    scored = reloaded.transform(clean_transactions(_raw(spark, n=5)))
    assert scored.count() == 20 and "pr_merchant" in scored.columns


def test_lifecycle_with_tuning(spark, tmp_path):
    cfg = EngineConfig(
        model_path=str(tmp_path), model_name="merchcat_tuned", sample_size=100,
        count_threshold=50, seed=5,
    )
    clf = NarrativeClassifier(ngram_max=1, num_features=1 << 12, max_iter=10)
    result = train_merchant_classifier(
        _raw(spark, n=100),
        config=cfg,
        classifier=clf,
        param_grid=[{"ngram_max": 1}, {"ngram_max": 2}],
        register=False,
    )
    assert len(result.trials) == 2
    assert result.metrics["avg_acc"] > 0.8
