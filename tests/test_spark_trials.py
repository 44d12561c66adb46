"""hyperopt SparkTrials integration (reference 02_merchcat_ml.py:315).

The container ships no hyperopt, so this SKIPS here; with hyperopt
installed it proves trials actually fan out as Spark tasks. The objective
is a self-contained callable (SparkTrials pickles it to executors) — the
single-node-library shape the reference tunes fasttext with.
"""

from __future__ import annotations

import pytest

hyperopt = pytest.importorskip("hyperopt", reason="hyperopt not installed")


def _objective(params):
    # deterministic bowl with minimum at x=3: no Spark objects captured
    x = params["x"]
    return (x - 3.0) ** 2


def test_spark_trials_distributed_tpe(spark):
    from hyperopt import hp

    from merchant_classification_spark.ml.tuning import tune_with_spark_trials

    best, trials = tune_with_spark_trials(
        _objective,
        {"x": hp.uniform("x", -10.0, 10.0)},
        max_evals=12,
        parallelism=2,
    )
    assert abs(best["x"] - 3.0) < 3.0  # TPE converges toward the bowl
    assert len(trials.trials) == 12
