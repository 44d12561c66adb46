"""Parquet table sources for the engine's test corpus.

The reference reads/writes Delta tables (reference 01_merchcat_etl.py:20-27,
:105-111 — SURVEY.md §2.1 S1-S6); the engine treats the format as a config
knob (parquet here, delta on a cluster with the delta jars) because every
operator above the scan is format-agnostic DataFrame code. Filters and
column projections written against these scans push down into the parquet
reader automatically (check `.explain` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables a planner should always broadcast in a join.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(
    spark: SparkSession, sf_dir: str, name: str, format: str = "parquet"
) -> DataFrame:
    """Load one named table from an sf directory of parquet files.

    ``events.ts`` is written as TIMESTAMP(NANOS), which Spark reads only as
    a long (with ``spark.sql.legacy.parquet.nanosAsLong``); normalize it to
    a microsecond timestamp here so every operator sees a real timestamp.

    Works on ANY SparkSession — the nanos conf is runtime-settable, so we
    set it here rather than relying on the caller's session builder. The
    ``format`` knob mirrors the reference's Delta reads (reference
    01_merchcat_etl.py:20-27): ``"delta"`` passes straight through to
    ``spark.read.format("delta")`` on a cluster with the delta jars.
    """
    if name == "events":
        # Runtime-settable; required to read TIMESTAMP(NANOS) parquet on a
        # vanilla session (without it: PARQUET_TYPE_ILLEGAL).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if format == "parquet":
        df = spark.read.parquet(path)
    else:
        df = spark.read.format(format).load(path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integral `div`, NOT `/`: float division of epoch-nanos exceeds
            # double precision (2^53) and lands ±1 µs off
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # timestamp[us] parquet reads as NTZ; operators use LTZ-only
            # functions (unix_micros, watermarks), so normalize. The cast
            # reinterprets the wall clock in the session tz — exact.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table as {name: DataFrame}."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` queries run on it."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
