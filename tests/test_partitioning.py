"""Partitioned-sink tests: layout, round trip, and pruning in the plan."""

import os

from pyspark.sql import functions as F

from merchant_classification_spark.plans.explain import explain_str
from merchant_classification_spark.sources import load_table
from merchant_classification_spark.sources.partitioned import (
    read_partitioned,
    write_partitioned,
)


def test_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_part")
    write_partitioned(li, path, ["l_returnflag"])

    # hive layout on disk
    dirs = {d for d in os.listdir(path) if d.startswith("l_returnflag=")}
    assert len(dirs) >= 2

    back = read_partitioned(spark, path)
    assert back.count() == li.count()

    filtered = back.where(F.col("l_returnflag") == "R")
    plan = explain_str(filtered)
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split("PartitionFilters", 1)[1][:200]
    expected = li.where(F.col("l_returnflag") == "R").count()
    assert filtered.count() == expected


def test_streaming_exact_dedup(spark, tmp_path):
    """Streaming dedup: watermark + dropDuplicates keeps first arrival of
    each key with bounded state — the streaming twin of exact_dedup."""
    import datetime as dt
    import uuid

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(seconds=i), f"doc {i % 40}")  # 120 rows, 40 distinct
        for i in range(120)
    ]
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicates(["text"])
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"/tmp/ckpt-{name}")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql(f"SELECT count(DISTINCT text) c FROM {name}").collect()[0].c == 40
    assert spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c == 40
