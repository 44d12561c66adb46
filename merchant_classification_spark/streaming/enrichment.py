"""Structured Streaming enrichment + monitoring.

The reference only *mentions* that its scoring UDF "unlocks a structured
streaming approach" (reference 02_merchcat_ml.py:518 — SURVEY.md §2.9);
this module makes it real:

  * ``enrich_stream`` — the same narrative cleaner (and optionally the
    same fitted classifier) applied to a streaming DataFrame. Because both
    are pure Catalyst expressions / MLlib transforms, the IDENTICAL code
    path serves batch and streaming — no reimplementation.
  * ``windowed_accuracy`` — tumbling-window per-window prediction accuracy
    with a watermark for late events (the continuous-monitoring need the
    reference motivates at 02_merchcat_ml.py:535).

Scale: stateless enrichment has no state store; the windowed aggregates
keep one row of state per (window) or (window, key) — watermarks bound
state size, so this runs indefinitely at any input rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from merchant_classification_spark.functions.cleaning import clean_narrative


def enrich_stream(
    stream: DataFrame,
    description_col: str = "tr_description",
    model=None,
) -> DataFrame:
    """Clean (and optionally score) a stream of transaction narratives.

    `model` is a fitted NarrativeClassifierModel; MLlib transforms are
    streaming-safe (pure row-wise pipelines), so `.transform` just works.
    """
    out = stream.withColumn(
        "tr_description_clean", clean_narrative(description_col)
    )
    if model is not None:
        out = model.transform(out)
    return out


def windowed_accuracy(
    stream: DataFrame,
    ts_col: str = "ts",
    label_col: str = "tr_merchant",
    prediction_col: str = "pr_merchant",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window prediction accuracy: (window_start, window_end,
    predicted, total, accuracy). Late rows beyond the watermark drop out
    of the aggregate (bounded state)."""
    flag = F.when(F.col(prediction_col) == F.col(label_col), 1).otherwise(0)
    return (
        stream.withWatermark(ts_col, watermark)
        .withColumn("predicted", flag)
        .groupBy(F.window(ts_col, window_duration).alias("w"))
        .agg(
            F.sum("predicted").alias("predicted"),
            F.count(F.lit(1)).alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "predicted",
            "total",
            (F.col("predicted") / F.col("total")).alias("accuracy"),
        )
    )


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-key tumbling-window counts over an event stream — the generic
    monitoring aggregate for the `events` table shape."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "cnt",
        )
    )
