from merchant_classification_spark.streaming.enrichment import (
    enrich_stream,
    windowed_accuracy,
    windowed_event_counts,
)

__all__ = ["enrich_stream", "windowed_accuracy", "windowed_event_counts"]
