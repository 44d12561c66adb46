"""Near-dup-on-ingest: batch-internal and cross-batch corpus matching."""

import uuid

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.streaming.neardup import (
    neardup_ingest_batch,
    start_neardup_ingest,
)

DOC = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to hide from every hunter"
)
NEAR = DOC.replace("green", "dark")  # one token changed -> high jaccard
OTHER = (
    "completely different subject matter about spark query engines and "
    "columnar execution with vectorized readers and shuffle services"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "neardup_store")


def test_cross_batch_neardup(spark, store):
    # batch 0: two unique docs + one internal near-dup of doc 1
    neardup_ingest_batch(
        _df(spark, [(1, DOC), (2, OTHER), (3, NEAR)]), 0, store, threshold=0.5
    )
    dupes0 = spark.read.parquet(f"{store}/dupes")
    assert {r.doc_id for r in dupes0.collect()} == {3}  # 3 ~ 1, internal
    admitted = {r.doc_id for r in spark.read.parquet(f"{store}/docs").collect()}
    assert admitted == {1, 2}

    # batch 1: a near-copy of corpus doc 1, and a fresh doc
    fresh = "entirely novel text with tokens shared with nothing else at all"
    neardup_ingest_batch(
        _df(spark, [(10, DOC + " extra"), (11, fresh)]), 1, store, threshold=0.5
    )
    dupes = spark.read.parquet(f"{store}/dupes")
    row = dupes.where(F.col("doc_id") == 10).collect()
    assert len(row) == 1 and row[0].matched_id == 1 and row[0].batch_id == 1
    admitted = {r.doc_id for r in spark.read.parquet(f"{store}/docs").collect()}
    assert admitted == {1, 2, 11}

    # idempotent contract: the index never contains a flagged doc's bands
    bands_ids = {r.doc_id for r in spark.read.parquet(f"{store}/bands").collect()}
    assert bands_ids == {1, 2, 11}


def test_streaming_wrapper(spark, store, tmp_path):
    src = str(tmp_path / "src")
    _df(spark, [(1, DOC), (2, OTHER)]).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = start_neardup_ingest(
        stream,
        store,
        checkpoint=str(tmp_path / f"ckpt-{uuid.uuid4().hex[:6]}"),
        threshold=0.5,
    )
    q.processAllAvailable()
    q.stop()
    admitted = {r.doc_id for r in spark.read.parquet(f"{store}/docs").collect()}
    assert admitted == {1, 2}
