"""merchant_classification_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the `databricks-industry-solutions/merchant-classification`
reference (see SURVEY.md), plus the large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
that a 100 TB corpus pipeline needs.

Design tenets (SURVEY.md §4.3, §7):
  * DataFrame/SQL only — every operator is a Catalyst logical plan; no RDDs.
  * UDFs are the slow path — native `pyspark.sql.functions` everywhere;
    Arrow-batched pandas UDFs only where a Python library is unavoidable.
  * Deterministic by default — all sampling/splitting takes an explicit seed
    (fixing the reference's unseeded `F.rand()` hazard,
    reference 01_merchcat_etl.py:179).
  * Scale-aware — AQE on, broadcast hints for dim tables, salting-ready
    group-top-k, approximate variants documented next to exact ones.
"""

from merchant_classification_spark.session import build_session

__all__ = ["build_session"]
__version__ = "0.1.0"
