"""Streaming deduplication — dedup-on-ingest for a training-data pipeline.

The batch dedup family (operators/dedup.py) answers "which existing rows
are duplicates"; this module answers the streaming twin: "drop duplicates
as they arrive, with bounded state". That is the shape an LLM-corpus
ingest pipeline actually runs: content-fingerprint each incoming document
and emit only first-seen fingerprints.

State discipline (the 100 TB concern): a naive ``dropDuplicates`` on an
unbounded stream keeps every key in the state store forever.  Both entry
points here take a watermark so the state store only retains keys inside
the lateness horizon:

  * ``dedup_stream`` — ``dropDuplicatesWithinWatermark`` (Spark 3.5+):
    keys expire once the event-time watermark passes them, so state is
    O(keys per watermark window), not O(all keys ever).
  * ``dedup_stream_by_fingerprint`` — same, keyed on the SAME canonical
    content fingerprint used by batch ``fingerprint_dedup``
    (md5 over the sorted distinct token set), so batch backfill and
    streaming ingest agree on what "duplicate" means.

Reference had no streaming at all (SURVEY.md §1.1: streaming only
"mentioned", reference 02_merchcat_ml.py:518); this is north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from merchant_classification_spark.functions.text_analysis import fingerprint


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit only the first row seen per key within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` so the state store evicts a
    key once the watermark passes its event time — bounded state on an
    unbounded stream. A key recurring AFTER the horizon is emitted again
    (by design: the horizon IS the dedup guarantee); pair with a batch
    ``fingerprint_dedup`` backfill for global exactness.
    """
    wm = stream.withWatermark(ts_col, watermark)
    return wm.dropDuplicatesWithinWatermark(keys)


def dedup_stream_by_fingerprint(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Content-dedup an incoming document stream by canonical fingerprint.

    The fingerprint column (`fp`) is kept in the output so downstream
    sinks can MERGE on it; computation is a pure codegen projection
    (tokenize → sort distinct → md5), streaming-safe, no Python stage.
    """
    with_fp = stream.withColumn("fp", fingerprint(F.col(text_col)))
    return dedup_stream(with_fp, ["fp"], ts_col=ts_col, watermark=watermark)
