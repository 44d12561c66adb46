"""Stateful sessionization tests: gap-split sessions over a file stream."""

import datetime as dt
import uuid

import pytest
from pyspark.sql import types as T

from merchant_classification_spark.streaming.sessionize import sessionize_stream

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def session_src(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sessions_src"))
    rows = [
        # user 1: two sessions split by a 40-minute gap
        (1, _ts(0), 1.0),
        (1, _ts(5), 2.0),
        (1, _ts(10), 3.0),
        (1, _ts(50), 4.0),
        (1, _ts(55), 5.0),
        # user 2: one session
        (2, _ts(0), 10.0),
        (2, _ts(20), 10.0),
        # a late straggler far in the future advances the watermark so all
        # earlier sessions time out and flush
        (3, _ts(600), 0.0),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_sessionize(spark, session_src):
    stream = spark.readStream.schema(SCHEMA).parquet(session_src)
    sessions = sessionize_stream(stream, gap_seconds=1800, watermark="1 minute")
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"/tmp/ckpt-{name}")
        .start()
    )
    q.processAllAvailable()
    # one extra empty batch lets event-time timeouts fire after the
    # watermark advanced in the previous batch
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(f"SELECT * FROM {name} ORDER BY user_id, session_start").collect()
    got = [
        (r.user_id, r.session_start.minute, r.session_end.minute, r.n_events, r.sum_value_cents)
        for r in rows
        if r.user_id != 3
    ]
    assert (1, 0, 10, 3, 600) in got  # first session of user 1
    assert (1, 50, 55, 2, 900) in got  # second session after the gap
    assert (2, 0, 20, 2, 2000) in got


def test_stream_batch_parity(spark, session_src):
    """Batch-as-backfill: streaming the same closed dataset must produce
    the IDENTICAL session rows (schema, types, integer-cent values) as
    sessionize_batch, for every session the stream has flushed."""
    from merchant_classification_spark.streaming.sessionize import (
        sessionize_batch,
    )

    stream = spark.readStream.schema(SCHEMA).parquet(session_src)
    sessions = sessionize_stream(stream, gap_seconds=1800, watermark="1 minute")
    name = f"parity_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"/tmp/ckpt-{name}")
        .start()
    )
    q.processAllAvailable()
    q.processAllAvailable()  # extra batch lets event-time timeouts fire
    q.stop()
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value_cents)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch_df = sessionize_batch(
        spark.read.schema(SCHEMA).parquet(session_src), gap_seconds=1800
    )
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value_cents)
        for r in batch_df.collect()
    }
    # the stream may still hold the straggler user's open session; every
    # flushed session must match batch exactly, and all fully-closed
    # users must be present
    assert streamed <= batch
    closed_users = {u for (u, *_rest) in streamed}
    assert {1, 2} <= closed_users
    for row in batch:
        if row[0] in (1, 2):
            assert row in streamed
