from merchant_classification_spark.operators.relational import (
    accuracy_report,
    class_histogram,
    group_topk,
    histogram_bins,
)
from merchant_classification_spark.operators.sampling import (
    class_percentile_split,
    stratified_sample,
)

__all__ = [
    "accuracy_report",
    "class_histogram",
    "group_topk",
    "histogram_bins",
    "class_percentile_split",
    "stratified_sample",
]
