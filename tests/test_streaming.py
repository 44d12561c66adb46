"""Structured Streaming tests: file-source stream → memory sink,
exercising enrichment, windowed accuracy, and watermark semantics."""

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from merchant_classification_spark.streaming.enrichment import (
    enrich_stream,
    windowed_accuracy,
    windowed_event_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("tr_merchant", T.StringType(), True),
        T.StructField("pr_merchant", T.StringType(), True),
        T.StructField("tr_description", T.StringType(), True),
    ]
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_src"))
    rows = []
    for i in range(120):
        ts = T0 + dt.timedelta(seconds=i)
        label = "amazon" if i % 2 == 0 else "tesco"
        pred = label if i % 10 != 0 else "wrong"
        rows.append((ts, label, pred, f"amzn mktp {i} 14sep19 deb"))
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _run_to_memory(df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", f"/tmp/ckpt-{name}-{uuid.uuid4().hex}")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_enrich_stream(spark, stream_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    assert stream.isStreaming
    name = f"enriched_{uuid.uuid4().hex[:8]}"
    _run_to_memory(enrich_stream(stream), name)
    out = spark.sql(f"SELECT * FROM {name}")
    assert out.count() == 120
    # cleaner ran on the stream: dates removed
    assert out.where(F.col("tr_description_clean").contains("14sep19")).count() == 0


def test_enrich_stream_with_model(spark, stream_dir):
    """The SAME fitted MLlib model scores a stream — the capability the
    reference only gestures at (02_merchcat_ml.py:518)."""
    from merchant_classification_spark.ml.classifier import NarrativeClassifier

    train = spark.createDataFrame(
        [("amazon", f"amzn mktp {i} deb") for i in range(40)]
        + [("tesco", f"tesco stores {i} gbp") for i in range(40)],
        ["tr_merchant", "tr_description_clean"],
    )
    model = NarrativeClassifier(ngram_max=1, num_features=1 << 12, max_iter=10).fit(
        train
    )
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir).drop("pr_merchant")
    name = f"scored_{uuid.uuid4().hex[:8]}"
    _run_to_memory(enrich_stream(stream, model=model), name)
    out = spark.sql(f"SELECT * FROM {name}")
    assert out.count() == 120
    # every 'amzn mktp ...' narrative scores as amazon
    assert (
        out.where(F.col("pr_merchant") == "amazon").count() == 120
    )  # all rows are amzn-style narratives


def test_windowed_accuracy(spark, stream_dir):
    # aggregation emits in append mode only once the watermark passes the
    # window end — a one-batch test would see nothing; complete mode shows
    # the running aggregate
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(stream_dir)
    name = f"winacc_{uuid.uuid4().hex[:8]}"
    _run_to_memory(
        windowed_accuracy(stream, window_duration="1 minute"), name, mode="complete"
    )
    rows = spark.sql(f"SELECT * FROM {name} ORDER BY window_start").collect()
    assert len(rows) == 2  # 120 s of events → two 1-minute windows
    for r in rows:
        assert r.total == 60
        assert r.predicted == 54  # every 10th is wrong
        assert abs(r.accuracy - 0.9) < 1e-12


def test_windowed_event_counts(spark, stream_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir).withColumnRenamed(
        "tr_merchant", "event_type"
    )
    name = f"wincnt_{uuid.uuid4().hex[:8]}"
    _run_to_memory(windowed_event_counts(stream), name, mode="complete")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = {(r.window_start.minute, r.event_type): r.cnt for r in rows}
    assert got[(0, "amazon")] == 30 and got[(0, "tesco")] == 30
    assert got[(1, "amazon")] == 30 and got[(1, "tesco")] == 30
