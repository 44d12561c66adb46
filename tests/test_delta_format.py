"""Delta-format round-trip through the engine's format knob.

The reference reads/writes Delta tables (reference 01_merchcat_etl.py:20-27,
105-111); the engine's sources expose that as ``format="delta"`` passthrough
(`sources/tables.py`, `sources/partitioned.py`). This container ships no
delta-spark jars, so the test SKIPS here — on a cluster with the jars it
runs and proves the knob is wired, not just documented.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

delta = pytest.importorskip("delta", reason="delta-spark not installed")


@pytest.fixture(scope="module")
def delta_spark():
    """Session with the Delta SQL extension + catalog (needs the jars)."""
    builder = (
        SparkSession.builder.appName("mcs-delta-test")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    return delta.configure_spark_with_delta_pip(builder).getOrCreate()


def test_delta_write_read_roundtrip(delta_spark, tmp_path):
    from merchant_classification_spark.sources.partitioned import (
        read_partitioned,
        write_partitioned,
    )

    df = delta_spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], ["k", "grp"]
    )
    path = str(tmp_path / "tbl_delta")
    write_partitioned(df, path, ["grp"], format="delta")
    back = read_partitioned(delta_spark, path, format="delta")
    assert sorted(r.k for r in back.collect()) == [1, 2, 3]
    # Delta-specific: an overwrite leaves prior versions time-travelable
    write_partitioned(df.where("k < 3"), path, ["grp"], format="delta")
    v0 = (
        delta_spark.read.format("delta").option("versionAsOf", 0).load(path)
    )
    assert v0.count() == 3 and read_partitioned(
        delta_spark, path, format="delta"
    ).count() == 2
