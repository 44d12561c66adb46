"""Bucketed tables — shuffle-free co-located joins and aggregations.

THE 100 TB join strategy: a fact-to-fact equi-join (orders ⨝ lineitem,
documents ⨝ embeddings) shuffles BOTH sides on every query. Bucketing
pays that shuffle once at write time: each side is hash-partitioned into
``num_buckets`` files per partition on the join key and (optionally)
sorted within buckets, so Catalyst's physical planner sees matching
output partitionings and plans a sort-merge join with NO Exchange on
either side — the dominant cost of the query disappears for every
subsequent read. Aggregations on the bucket key likewise skip their
exchange.

The reference (notebook glue over Delta) has no bucketing; this is
engine surface the north star requires. On Databricks the same role is
played by Delta liquid clustering / Z-order + DFP; plain
``bucketBy``/``saveAsTable`` is the OSS-Spark-native equivalent and works
against any metastore (including the in-memory catalog used in tests).

Sizing rule of thumb: pick ``num_buckets`` so one bucket of the LARGER
table ≈ 100-200 MB compressed (at 100 TB and 1000 executors, thousands of
buckets — buckets are split across files per writing task, so there is no
single-file bottleneck). Both join sides MUST use the same bucket count
and key, or the planner falls back to shuffling the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 16,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) parquet table.

    ``path`` makes it an external table (data survives catalog drop).
    Sorting within buckets lets the later sort-merge join skip its sort
    when Spark can prove the ordering (and makes min/max row-group
    pruning effective on the key).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    Plain ``DataFrame.join`` — the point is what's ABSENT from the plan:
    with both tables bucketed identically on `on`, there is no Exchange
    on either side (assert via ``plans.explain.count_exchanges``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
