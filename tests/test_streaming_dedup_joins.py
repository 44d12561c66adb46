"""Streaming dedup, stream-stream interval join, and foreachBatch upsert
sink: file-source streams → memory/parquet sinks, multi-micro-batch."""

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from merchant_classification_spark.streaming.dedup import (
    dedup_stream,
    dedup_stream_by_fingerprint,
)
from merchant_classification_spark.streaming.joins import interval_join_streams
from merchant_classification_spark.streaming.sinks import start_upsert_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"/tmp/ckpt-{name}-{uuid.uuid4().hex}")
        .start()
    )
    q.processAllAvailable()
    q.stop()


@pytest.fixture(scope="module")
def doc_stream_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docstream"))
    rows = []
    for i in range(60):
        ts = T0 + dt.timedelta(seconds=i)
        # ids repeat every 20; texts are permutations of the same tokens
        # for i%3==0 (fingerprint-equal), distinct otherwise
        base = i % 20
        text = (
            "alpha beta gamma delta"
            if base % 3 == 0
            else f"unique text number {base} with filler"
        )
        rows.append((ts, base, text))
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_dedup_stream_by_key(spark, doc_stream_dir):
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(doc_stream_dir)
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    _run_to_memory(dedup_stream(stream, ["doc_id"], watermark="1 hour"), name)
    out = spark.sql(f"SELECT doc_id FROM {name}")
    # 60 rows with ids repeating every 20 → exactly 20 distinct survive
    assert out.count() == 20
    assert out.distinct().count() == 20


def test_dedup_stream_by_fingerprint(spark, doc_stream_dir):
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(doc_stream_dir)
    name = f"fpdedup_{uuid.uuid4().hex[:8]}"
    _run_to_memory(
        dedup_stream_by_fingerprint(stream, "text", watermark="1 hour"), name
    )
    out = spark.sql(f"SELECT fp, text FROM {name}")
    # distinct texts: 1 shared boilerplate + 13 uniques (base in 0..19,
    # base%3!=0 → 13 values) = 14 fingerprints
    assert out.count() == 14
    assert out.select("fp").distinct().count() == 14


def test_interval_join_streams(spark, tmp_path):
    click_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("click_ts", T.TimestampType(), True),
        ]
    )
    buy_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("buy_ts", T.TimestampType(), True),
            T.StructField("amount", T.LongType(), True),
        ]
    )
    clicks = [(u, T0 + dt.timedelta(minutes=u)) for u in range(10)]
    # user u buys u minutes + 5 min after the click for even u (inside the
    # 10-minute bound); odd u buys 30 min later (outside)
    buys = [
        (u, T0 + dt.timedelta(minutes=u + (5 if u % 2 == 0 else 30)), 100 + u)
        for u in range(10)
    ]
    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    spark.createDataFrame(clicks, click_schema).write.parquet(cdir)
    spark.createDataFrame(buys, buy_schema).write.parquet(bdir)

    cs = spark.readStream.schema(click_schema).parquet(cdir)
    bs = spark.readStream.schema(buy_schema).parquet(bdir)
    joined = interval_join_streams(
        cs, bs, "user_id", "click_ts", "buy_ts", max_delay="10 minutes"
    )
    name = f"ivj_{uuid.uuid4().hex[:8]}"
    _run_to_memory(joined, name)
    out = spark.sql(f"SELECT user_id, amount FROM {name}").collect()
    got = sorted((r.user_id, r.amount) for r in out)
    assert got == [(u, 100 + u) for u in range(10) if u % 2 == 0]


def test_upsert_sink_across_batches(spark, tmp_path):
    # two parquet files + maxFilesPerTrigger=1 → two micro-batches with
    # overlapping keys; the sink must end with one row per key
    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    b1 = [(T0, i, f"text {i}") for i in range(10)]
    b2 = [(T0 + dt.timedelta(minutes=1), i, f"text {i} v2") for i in range(5, 15)]
    spark.createDataFrame(b1, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    spark.createDataFrame(b2, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = start_upsert_stream(stream, sink, ["doc_id"], ckpt, trigger_once=False)
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(sink)
    assert out.count() == 15
    assert out.select("doc_id").distinct().count() == 15
    # first-seen wins for overlapping keys: ids 5-9 keep their batch-1 text
    kept = {r.doc_id: r.text for r in out.collect()}
    assert kept[7] in ("text 7", "text 7 v2")  # ordering of file pickup
    assert kept[12] == "text 12 v2"
