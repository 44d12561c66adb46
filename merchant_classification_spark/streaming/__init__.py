from merchant_classification_spark.streaming.enrichment import (
    enrich_stream,
    windowed_accuracy,
    windowed_event_counts,
)
from merchant_classification_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

__all__ = [
    "enrich_stream",
    "sessionize_batch",
    "sessionize_stream",
    "windowed_accuracy",
    "windowed_event_counts",
]
