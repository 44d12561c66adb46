"""In-engine model evaluation.

The reference evaluates driver-side with pandas: per-class accuracy via
groupby-mean, then mean + q05/q25/q50/q75/q95 quantiles
(reference utils/merchcat_utils.py:56-71, 02_merchcat_ml.py:120-127 —
SURVEY.md §2.4 A3/A4, §2.11 M2). Here both levels stay distributed: one
hash aggregate for per-class accuracy, one exact percentile over the
(tiny) per-class frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from merchant_classification_spark.operators.relational import accuracy_report


def evaluate_per_class(
    scored: DataFrame, label_col: str, prediction_col: str
) -> tuple[DataFrame, dict[str, float]]:
    """Returns (per_class_df, summary) where per_class_df has
    (label, predicted, total, accuracy) and summary carries
    avg_acc / q_05 / q_25 / q_50 / q_75 / q_95 over per-class accuracies
    — the reference's headline metrics (BASELINE.md)."""
    per_class = accuracy_report(scored, label_col, prediction_col)
    row = per_class.agg(
        F.avg("accuracy").alias("avg_acc"),
        F.expr(
            "percentile(accuracy, array(0.05, 0.25, 0.5, 0.75, 0.95))"
        ).alias("qs"),
    ).collect()[0]
    summary = {
        "avg_acc": float(row["avg_acc"]),
        "q_05": float(row["qs"][0]),
        "q_25": float(row["qs"][1]),
        "q_50": float(row["qs"][2]),
        "q_75": float(row["qs"][3]),
        "q_95": float(row["qs"][4]),
    }
    return per_class, summary
