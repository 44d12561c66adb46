"""Streaming ANN serving: a query stream scored against a persisted
PQ index — the deployment shape of the vector tier.

The batch side (`operators/similarity.py`) already splits the index
lifecycle into :func:`pq_fit` → :func:`pq_encode` (ONE full-corpus
pass, persisted to parquet) → :func:`pq_search`. Serving is then a
stream-static composition: each micro-batch of queries runs
``pq_search`` against the index AS OF its trigger (re-read inside
``foreachBatch``, the `streaming/static_join.py` refreshing-dimension
pattern — an index rebuilt/extended between triggers is picked up
without restart). The corpus text/embedding table is touched only for
the refine fetch, a broadcast-candidate semi-join of
|batch|·k·refine_factor ids.

100 TB shape: the stream side is tiny (queries), so nothing shuffles
on the stream; the index scan is the per-trigger cost and it reads
(vec_id, cell, codes) — ~32× smaller than the fp32 corpus — with the
probe join broadcast. Exactly-once output: each batch OVERWRITES its
own ``out_path/batch_id=<id>`` partition directory. Determinism alone
is not idempotence — ``pq_search`` is a pure function of (index,
queries, literals), so a replayed batch produces identical rows, but a
blind ``append`` after a crash between the parquet write and the
checkpoint commit would land those identical rows TWICE. Keying the
write by Spark's checkpointed batch id makes the replay overwrite its
own partial output instead, and readers get the batch id as a
discovered partition column for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def score_queries_batch(
    batch_df: DataFrame,
    index_path: str,
    data_path: str | None,
    coarse: list[list[float]],
    books: list[list[list[float]]],
    out_path: str,
    batch_id: int = 0,
    k: int = 10,
    n_probe: int = 4,
    refine_factor: int | None = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> None:
    """foreachBatch body: fresh index read → pq_search → overwrite the
    batch's own ``out_path/batch_id=<batch_id>`` directory (idempotent
    under checkpoint replay — see module docstring).

    ``data_path`` supplies raw vectors for the refine fetch; pass None
    with ``refine_factor=None`` for ADC-only serving (the raw corpus is
    never read at all)."""
    from merchant_classification_spark.operators.similarity import pq_search

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    index = spark.read.parquet(index_path)
    if refine_factor is not None:
        if data_path is None:
            raise ValueError("refine needs data_path for the vector fetch")
        data = spark.read.parquet(data_path)
    else:
        data = index.limit(0).select("vec_id").withColumn(
            "embedding", F_null_vec()
        )
    out = pq_search(
        index,
        data,
        coarse,
        books,
        batch_df,
        k=k,
        n_probe=n_probe,
        refine_factor=refine_factor,
        query_id=query_id,
        query_vec=query_vec,
    )
    out.write.mode("overwrite").parquet(
        os.path.join(out_path, f"batch_id={int(batch_id)}")
    )


def F_null_vec():
    """Typed empty embedding column for the ADC-only path (pq_search
    never evaluates it — the refine branch is off)."""
    from pyspark.sql import functions as F

    return F.lit(None).cast("array<double>")


def start_ann_stream(
    stream: DataFrame,
    index_path: str,
    data_path: str | None,
    coarse: list[list[float]],
    books: list[list[list[float]]],
    out_path: str,
    checkpoint: str,
    k: int = 10,
    n_probe: int = 4,
    refine_factor: int | None = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    trigger_once: bool = True,
) -> StreamingQuery:
    """Serve a query stream against the persisted PQ index.

    availableNow by default (the repo's bounded-test trigger); drop
    ``trigger_once`` for a continuous micro-batch server."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        score_queries_batch(
            batch_df,
            index_path,
            data_path,
            coarse,
            books,
            out_path,
            batch_id=batch_id,
            k=k,
            n_probe=n_probe,
            refine_factor=refine_factor,
            query_id=query_id,
            query_vec=query_vec,
        )

    writer = stream.writeStream.foreachBatch(body).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    return writer.start()
