"""Stream-static enrichment with dimension refresh between runs: the
second availableNow pass must see dimension rows added after the first."""

import os
import uuid

from merchant_classification_spark.streaming.static_join import (
    start_enriched_stream,
)


def test_dim_refresh_between_batches(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    dim = os.path.join(str(tmp_path), "dim")
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), f"ckpt-{uuid.uuid4().hex}")

    spark.createDataFrame([(1, "m1"), (2, "m2")], "k: long, label: string") \
        .write.mode("overwrite").parquet(dim)
    spark.createDataFrame([(1, 10.0), (2, 20.0)], "k: long, v: double") \
        .coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("k long, v double").parquet(src)
    q = start_enriched_stream(stream, dim, ["k"], out, ckpt)
    q.awaitTermination()
    got = {(r["k"], r["label"]) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "m1"), (2, "m2")}

    # dimension gains a row AND relabels k=1; new stream rows arrive
    spark.createDataFrame(
        [(1, "m1-v2"), (2, "m2"), (3, "m3")], "k: long, label: string"
    ).write.mode("overwrite").parquet(dim)
    spark.createDataFrame([(1, 11.0), (3, 30.0)], "k: long, v: double") \
        .coalesce(1).write.mode("append").parquet(src)

    stream2 = spark.readStream.schema("k long, v double").parquet(src)
    q2 = start_enriched_stream(stream2, dim, ["k"], out, ckpt)
    q2.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4
    by_pair = {(r["k"], r["v"]): r["label"] for r in rows}
    assert by_pair[(1, 10.0)] == "m1"  # enriched with the dim AS OF batch 1
    assert by_pair[(1, 11.0)] == "m1-v2"  # sees the refreshed dim
    assert by_pair[(3, 30.0)] == "m3"  # sees the inserted dim row
