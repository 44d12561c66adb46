"""End-to-end ETL pipeline: raw transactions → train/test corpora.

The reference's `01_merchcat_etl.py` top-to-bottom (SURVEY.md §3.1),
re-expressed as one composable function chain:

    ingest → project/filter → clean → fasttext-format →
    stratified sample → per-class 90/10 split

Differences from the reference, on purpose:
  * the date scrub runs native (no pandas UDF) — see functions/cleaning;
  * sampling and the split are seeded and the split persists its ranked
    input, so train/test are disjoint and reproducible (the reference
    re-evaluates an unseeded random plan twice, SURVEY.md §3.1);
  * sinks take any format (parquet/delta) instead of hard-coded Delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from merchant_classification_spark.functions.cleaning import clean_narrative
from merchant_classification_spark.functions.fasttext_format import to_fasttext_line
from merchant_classification_spark.operators.sampling import (
    class_percentile_split,
    stratified_sample,
)


def clean_transactions(
    df: DataFrame,
    description_col: str = "tr_description",
    merchant_col: str = "tr_merchant",
) -> DataFrame:
    """Project + filter + clean + fasttext-format
    (reference 01_merchcat_etl.py:20-94)."""
    return (
        df.filter(F.col(merchant_col).isNotNull())
        .withColumn("tr_description_clean", clean_narrative(description_col))
        .withColumn(
            "fasttext", to_fasttext_line(merchant_col, "tr_description_clean")
        )
    )


def etl_pipeline(
    raw: DataFrame,
    sample_size: int = 5000,
    count_threshold: int = 100,
    test_fraction: float = 0.1,
    seed: int = 42,
    merchant_col: str = "tr_merchant",
) -> dict[str, DataFrame]:
    """Full reference ETL (01_merchcat_etl.py, SURVEY.md §3.1): returns
    {"formatted": ..., "sampled": ..., "train": ..., "test": ...}.

    Scale shape: clean+format is one codegen projection; sampling is a
    group-count (one shuffle over ~#classes keys) plus a map-side filter;
    the split is the only per-class window sort.
    """
    formatted = clean_transactions(raw, merchant_col=merchant_col)
    sampled = stratified_sample(
        formatted,
        merchant_col,
        sample_size=sample_size,
        min_count=count_threshold,
        seed=seed,
    )
    train, test = class_percentile_split(
        sampled, merchant_col, test_fraction=test_fraction, seed=seed
    )
    return {"formatted": formatted, "sampled": sampled, "train": train, "test": test}
