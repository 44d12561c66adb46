"""Distributed scoring with an arbitrary external (non-MLlib) model.

The reference wraps its fasttext binary in an mlflow pyfunc whose model
file is lazily loaded once per executor and then applied per batch
(reference utils/merchcat_utils.py:10-78 — SURVEY.md §2.10 U2/U3). MLlib
models don't need that machinery (`PipelineModel.transform` is JVM-side),
but a user with a real fasttext/ONNX/sklearn artifact does. This operator
is the generic Spark-first shape:

  * the model ARTIFACT travels as bytes in a SparkContext broadcast —
    shipped once per executor, torrent-style, not once per task, and with
    no shared-filesystem dependency;
  * ``init`` turns those bytes into a live model — called lazily on FIRST
    use inside each Python worker, then cached for the worker's lifetime
    (the pyfunc `load_context` parity point: expensive deserialization /
    file-backed loads happen once per executor process, not per batch);
  * ``predict`` maps a pandas DataFrame batch of the input columns to a
    Series/array of outputs — Arrow-batched, never row-at-a-time.

Works identically in batch and Structured Streaming (`transform` is just a
projection), so it is also the distributed-scoring path (§2.11 M6-M7) for
external models.
"""

from __future__ import annotations

import itertools
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Per-worker-PROCESS model cache, keyed per score_with call. Module-level
# on purpose: a dict captured in the UDF closure is re-deserialized per
# task and would defeat the lazy-load (init would rerun every task); a
# module global survives for the worker's lifetime, exactly like pyfunc
# load_context state.
_MODEL_CACHE: dict[int, Any] = {}
_next_key = itertools.count()


def score_with(
    df: DataFrame,
    model_bytes: bytes,
    init: Callable[[bytes], Any],
    predict: Callable[[Any, pd.DataFrame], "pd.Series"],
    input_cols: list[str],
    output_col: str = "score",
    output_type: str = "double",
) -> DataFrame:
    """Append ``output_col`` = predict(init(model_bytes), batch[input_cols]).

    ``init`` runs at most once per Python worker process (lazy, cached);
    ``predict`` runs once per Arrow batch. For a file-backed loader (e.g. a
    fasttext .bin), ``init`` writes the bytes to a local temp file and
    loads from there — executors never need a shared filesystem.
    """
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(model_bytes)
    cache_key = next(_next_key)

    @F.pandas_udf(output_type)
    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        model = _MODEL_CACHE.get(cache_key)
        if model is None:
            model = _MODEL_CACHE[cache_key] = init(bc.value)
        for pdf in batches:
            out = predict(model, pdf)
            yield out if isinstance(out, pd.Series) else pd.Series(list(out))

    packed: Column = F.struct(*[F.col(c) for c in input_cols])
    return df.withColumn(output_col, _score(packed))
