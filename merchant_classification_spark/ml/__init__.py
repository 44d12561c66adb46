from merchant_classification_spark.ml.classifier import NarrativeClassifier
from merchant_classification_spark.ml.evaluate import evaluate_per_class

__all__ = ["NarrativeClassifier", "evaluate_per_class"]
