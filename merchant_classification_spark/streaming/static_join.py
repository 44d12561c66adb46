"""Stream-static enrichment with a REFRESHING dimension.

A plain stream-static join resolves the static side's file listing once,
at plan time — dimension rows added while the stream runs are invisible
until restart. The production pattern for slowly-changing dimensions is
re-reading the dimension inside ``foreachBatch``: each micro-batch gets
the dimension as of ITS trigger, broadcast-joined (the dim is small by
definition; the stream side never shuffles), and appended downstream.

This composes with `operators/scd.py`: point the path at the current
SCD-2 snapshot and every batch enriches against the newest intervals.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def enrich_batch_with_dim(
    batch_df: DataFrame,
    batch_id: int,
    dim_path: str,
    keys: list[str],
    out_path: str,
    how: str = "left",
) -> None:
    """foreachBatch body: fresh dim read → broadcast join → append."""
    spark = batch_df.sparkSession
    if os.path.exists(dim_path):
        dim = spark.read.parquet(dim_path)
        joined = batch_df.join(F.broadcast(dim), keys, how)
    else:
        joined = batch_df
    joined.write.mode("append").parquet(out_path)


def start_enriched_stream(
    stream: DataFrame,
    dim_path: str,
    keys: list[str],
    out_path: str,
    checkpoint: str,
    how: str = "left",
    trigger_once: bool = True,
) -> StreamingQuery:
    """Enrich a stream against the dimension AS OF each micro-batch."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: enrich_batch_with_dim(
                df, bid, dim_path, keys, out_path, how
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
