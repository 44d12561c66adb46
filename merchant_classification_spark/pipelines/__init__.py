from merchant_classification_spark.pipelines.etl import clean_transactions, etl_pipeline
from merchant_classification_spark.pipelines.train import train_merchant_classifier

__all__ = ["clean_transactions", "etl_pipeline", "train_merchant_classifier"]
