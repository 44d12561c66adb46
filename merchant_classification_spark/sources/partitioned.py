"""Partition-aware sinks — the write-side half of the 100 TB story.

A table that will be filtered by a column at read time should be WRITTEN
partitioned by it: the directory layout becomes the index, and reads with
a matching predicate scan only the surviving directories (partition
pruning — check `PartitionFilters` in the scan node). The reference
writes flat Delta tables (01_merchcat_etl.py:105-111); at 100 TB flat
layout means every query scans everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write `df` hive-partitioned by `partition_cols`.

    Partition columns should be low-cardinality (date, region, status) —
    one directory per value per parent. High-cardinality keys belong in
    bucketed table layouts or file-level sort order (min/max pruning),
    not directory partitioning.
    """
    df.write.mode(mode).format(format).partitionBy(*partition_cols).save(path)


def read_partitioned(spark: SparkSession, path: str, format: str = "parquet") -> DataFrame:
    """Read a partitioned table; partition columns come back typed by
    directory discovery and predicates on them prune at planning time."""
    return spark.read.format(format).load(path)
