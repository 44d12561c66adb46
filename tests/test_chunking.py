"""Chunking + packing operator semantics on crafted docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.operators.chunking import (
    chunk_documents,
    pack_documents,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
        (1, "a b c"),                               # 3 tokens (< window)
        (2, ""),                                    # empty: no chunks
        (3, " ".join(f"x{i}" for i in range(7))),   # 7 tokens
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_windows_cover_and_overlap(docs):
    out = chunk_documents(docs, "doc_id", "text", window=4, stride=2)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 0 (10 tokens): chunks at 1,3,5,7 -> ceil((10-4)/2)+1 = 4
    d0 = [rows[(0, i)] for i in range(4)]
    assert (0, 4) not in rows
    assert [r.start_token for r in d0] == [1, 3, 5, 7]
    assert [r.n_chunk_tokens for r in d0] == [4, 4, 4, 4]
    assert d0[0].chunk_text == "w0 w1 w2 w3"
    assert d0[3].chunk_text == "w6 w7 w8 w9"
    # short doc: one chunk, whole text
    assert rows[(1, 0)].chunk_text == "a b c"
    assert rows[(1, 0)].n_chunk_tokens == 3
    # empty doc contributes nothing
    assert not any(k[0] == 2 for k in rows)
    # 7 tokens: chunks at 1,3,5 -> sizes 4,4,3 (tail clamps)
    assert [rows[(3, i)].n_chunk_tokens for i in range(3)] == [4, 4, 3]
    # final chunk reaches the end
    last = rows[(3, 2)]
    assert last.start_token + last.n_chunk_tokens - 1 == 7


def test_pack_offset_rule(spark):
    rows = [(i, " ".join(["t"] * n)) for i, n in [(0, 5), (1, 4), (2, 3), (3, 9)]]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in pack_documents(df, "doc_id", "text", budget=8).collect()}
    # offsets: 0,5,9,12 -> packs 0,0,1,1
    assert [out[i].pack_id for i in range(4)] == [0, 0, 1, 1]
    assert [out[i].pack_offset for i in range(4)] == [0, 5, 1, 4]
    assert [out[i].pack_pos for i in range(4)] == [1, 2, 1, 2]


def test_pack_unsharded_matches_global_window(spark, tables):
    """The distributed two-phase prefix sum must be bit-identical to the
    single global window it replaced (the round-6 scale-killer)."""
    from pyspark.sql.window import Window

    docs = tables["documents"]
    got = pack_documents(docs, "doc_id", "text", budget=256)
    # reference formulation: the old Window.partitionBy().orderBy path
    from merchant_classification_spark.functions.text_analysis import tokens

    base = docs.select(
        F.col("doc_id"),
        F.size(F.element_at(F.array(tokens("text")), 1)).alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    w = Window.partitionBy().orderBy("doc_id")
    before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    want = base.withColumn("cum_before", before).select(
        "doc_id",
        F.expr("cum_before DIV 256").alias("pack_id"),
        F.expr("cum_before % 256").alias("pack_offset"),
    )
    # collect-and-sort comparison: a self-join on shared lineage
    # mis-resolves the two windowed columns
    cols = ["doc_id", "pack_id", "pack_offset"]
    got_rows = sorted(map(tuple, got.select(*cols).collect()))
    want_rows = sorted(map(tuple, want.select(*cols).collect()))
    assert got_rows == want_rows
    assert got.schema["pack_id"].dataType.simpleString() == "bigint"


def test_pack_sharded_is_per_shard(spark):
    rows = [
        (0, "a", " ".join(["t"] * 6)),
        (1, "a", " ".join(["t"] * 6)),
        (2, "b", " ".join(["t"] * 6)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "text"])
    out = {
        r.doc_id: r
        for r in pack_documents(
            df, "doc_id", "text", budget=8, shard_cols=["shard"]
        ).collect()
    }
    # shard b restarts its offsets
    assert out[2].pack_id == 0 and out[2].pack_offset == 0
    assert out[1].pack_id == 0 and out[1].pack_offset == 6
