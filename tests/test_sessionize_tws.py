"""transformWithState sessionizer: parity with the GroupState version.

Same fixture shape as tests/test_sessionize.py — a closed parquet file
stream with a far-future straggler that advances the watermark so every
earlier session flushes via event-time timer.

transformWithState's Python client requires google.protobuf (the state
server protocol); this sandbox doesn't ship it, so the test skips when
the import fails — same pattern as the Delta round-trip test. On a real
Spark distro (protobuf present) it runs.
"""

import datetime as dt
import uuid

import pytest
from pyspark.sql import types as T

from merchant_classification_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream_tws,
)

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState state-server protocol needs protobuf",
)

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
def tws_src(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tws_src"))
    rows = [
        (1, _ts(0), 1.0),
        (1, _ts(5), 2.0),
        (1, _ts(10), 3.0),
        (1, _ts(50), 4.0),
        (1, _ts(55), 5.0),
        (2, _ts(0), 10.0),
        (2, _ts(20), 10.0),
        (3, _ts(600), 0.0),  # straggler advances the watermark
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _run_stream(spark, src):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    sessions = sessionize_stream_tws(stream, gap_seconds=1800, watermark="1 minute")
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"/tmp/ckpt-{name}")
        .start()
    )
    q.processAllAvailable()
    q.processAllAvailable()  # extra batch lets event-time timers fire
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_tws_sessionize_matches_batch(spark, tws_src):
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value_cents)
        for r in _run_stream(spark, tws_src)
    }
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value_cents)
        for r in sessionize_batch(
            spark.read.schema(SCHEMA).parquet(tws_src), gap_seconds=1800
        ).collect()
    }
    # every flushed session is exactly a batch session, and all non-
    # straggler users fully flushed
    assert streamed <= batch
    got = {
        (r.user_id, r.session_start.minute, r.session_end.minute, r.n_events,
         r.sum_value_cents)
        for r in _run_stream(spark, tws_src)
    }
    assert (1, 0, 10, 3, 600) in got
    assert (1, 50, 55, 2, 900) in got
    assert (2, 0, 20, 2, 2000) in got
