"""Streaming materialized-aggregate maintenance: file-source stream →
foreachBatch merge into a parquet state table; state must equal the
batch full recompute over everything ingested."""

import os
import uuid

from pyspark.sql import functions as F

from merchant_classification_spark.operators.maintenance import (
    incremental_agg_state,
)
from merchant_classification_spark.streaming.agg_state import (
    start_agg_state_stream,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "g: string, v: long").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _state_map(spark, state_path):
    return {
        r["g"]: (r["n_rows"], r["sum_v"])
        for r in spark.read.parquet(state_path).collect()
    }


def test_stream_state_equals_full_recompute(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    state = os.path.join(str(tmp_path), "state")
    ckpt = os.path.join(str(tmp_path), f"ckpt-{uuid.uuid4().hex}")

    _write_batch(spark, src, [("a", 1), ("a", 2), ("b", 10)])
    stream = spark.readStream.schema("g string, v long").parquet(src)
    q = start_agg_state_stream(stream, state, ["g"], ["v"], ckpt)
    q.awaitTermination()
    assert _state_map(spark, state) == {"a": (2, 3), "b": (1, 10)}

    # second tranche arrives; a NEW availableNow run resumes from the
    # checkpoint and merges only the delta
    _write_batch(spark, src, [("a", 5), ("c", 7)])
    stream2 = spark.readStream.schema("g string, v long").parquet(src)
    q2 = start_agg_state_stream(stream2, state, ["g"], ["v"], ckpt)
    q2.awaitTermination()
    got = _state_map(spark, state)
    full = {
        r["g"]: (r["n_rows"], r["sum_v"])
        for r in incremental_agg_state(
            spark.read.parquet(src), ["g"], ["v"]
        ).collect()
    }
    assert got == full == {"a": (3, 8), "b": (1, 10), "c": (1, 7)}
