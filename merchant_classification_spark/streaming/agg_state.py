"""Streaming materialized-aggregate maintenance via foreachBatch.

Couples the stream to ``operators/maintenance.py``'s mergeable state:
each micro-batch is collapsed to per-key partials (count + sums) and
merged into a persisted state table, so the "materialized view" stays
current at O(|batch| + |touched state|) per trigger instead of any
re-scan of history. Because the state is mergeable (commutative +
associative), the SAME operator maintains it from batch backfill and
from the stream — the lambda-architecture unification without two code
paths.

Parquet sandbox note: the state table is swapped atomically-enough by
writing to a temp dir and renaming; on Delta/Iceberg the body would be
one ``MERGE INTO``. Replays of a failed batch re-merge its partials —
exactly-once state requires the transactional store; this is the honest
non-transactional variant, same stance as ``streaming/sinks.py``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from merchant_classification_spark.operators.maintenance import (
    incremental_agg_state,
    merge_agg_state,
)


def merge_state_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    keys: list[str],
    sum_cols: list[str],
) -> None:
    """foreachBatch body: state ← merge(state, partials(batch))."""
    spark = batch_df.sparkSession
    delta = incremental_agg_state(batch_df, keys, sum_cols)
    if os.path.exists(state_path):
        state = spark.read.parquet(state_path)
        merged = merge_agg_state(state, delta)
    else:
        merged = delta
    tmp = state_path + f".__tmp_{batch_id}"
    merged.write.mode("overwrite").parquet(tmp)
    old = state_path + ".__old"
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(tmp, state_path)
    shutil.rmtree(old, ignore_errors=True)


def start_agg_state_stream(
    stream: DataFrame,
    state_path: str,
    keys: list[str],
    sum_cols: list[str],
    checkpoint: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain the mergeable per-key aggregate state from a stream."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: merge_state_batch(df, bid, state_path, keys, sum_cols)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
