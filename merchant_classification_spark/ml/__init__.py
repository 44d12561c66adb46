from merchant_classification_spark.ml.classifier import NarrativeClassifier
from merchant_classification_spark.ml.evaluate import evaluate_per_class
from merchant_classification_spark.ml.external import score_with

__all__ = ["NarrativeClassifier", "evaluate_per_class", "score_with"]
