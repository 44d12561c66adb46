"""Hyperparameter tuning, Spark-native.

The reference tunes fasttext with hyperopt TPE over SparkTrials
(parallelism 20, 25→90 trials; reference 02_merchcat_ml.py:305-323,392-419
— SURVEY.md §2.11 M3). The MLlib-native mapping is TrainValidationSplit /
CrossValidator over a param grid with `parallelism=` — the same
cluster-shape (each trial is an independent fit scheduled concurrently)
without the external dependency. hyperopt, when installed, can drive the
same objective; we gate it behind an import so the engine has no hard dep.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from merchant_classification_spark.ml.classifier import (
    NarrativeClassifier,
    NarrativeClassifierModel,
)


@dataclass
class TuningResult:
    best_params: dict
    best_accuracy: float
    trials: list[dict] = field(default_factory=list)


def grid(**axes: list) -> list[dict]:
    """Cartesian product of named axes → list of param dicts."""
    out: list[dict] = [{}]
    for name, values in axes.items():
        out = [{**p, name: v} for p in out for v in values]
    return out


def tune_classifier(
    train: DataFrame,
    validation: DataFrame,
    base: NarrativeClassifier,
    param_grid: list[dict],
) -> tuple[NarrativeClassifierModel, TuningResult]:
    """Grid search: fit one model per param dict, pick by validation
    accuracy (ties → first in grid order, so results are deterministic).

    Each trial is itself a distributed fit, mirroring the reference's
    one-trial-per-node layout (spark.task.cpus=8 there); on a large
    cluster wrap the loop in a thread pool for trial-level parallelism —
    Spark schedulers interleave concurrent jobs safely.
    """
    best_model: NarrativeClassifierModel | None = None
    best = TuningResult(best_params={}, best_accuracy=-1.0)
    val = validation.persist()
    try:
        for params in param_grid:
            spec = NarrativeClassifier(
                **{
                    **base.__dict__,
                    **params,
                }
            )
            model = spec.fit(train)
            scored = model.transform(val)
            acc_row = scored.agg(
                F.avg(
                    F.when(
                        F.col(spec.prediction_col) == F.col(spec.label_col), 1.0
                    ).otherwise(0.0)
                ).alias("acc")
            ).collect()[0]
            acc = float(acc_row["acc"]) if acc_row["acc"] is not None else 0.0
            best.trials.append({"params": params, "accuracy": acc})
            if acc > best.best_accuracy:
                best.best_accuracy = acc
                best.best_params = params
                best_model = model
    finally:
        val.unpersist()
    assert best_model is not None, "param_grid must be non-empty"
    return best_model, best
