from merchant_classification_spark.pipelines.etl import clean_transactions, etl_pipeline

__all__ = ["clean_transactions", "etl_pipeline"]
