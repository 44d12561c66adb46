"""JSONL source/sink roundtrip + malformed-row handling; salted-join
result identity on skewed data."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from merchant_classification_spark.operators.skew import salted_join
from merchant_classification_spark.sources.jsonl import (
    CORRUPT_COL,
    infer_jsonl_schema,
    read_jsonl,
    write_jsonl,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def test_jsonl_roundtrip_gzip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"document {i}", "en") for i in range(100)], DOC_SCHEMA
    )
    out = str(tmp_path / "corpus")
    write_jsonl(df, out, num_files=3)
    import glob

    gz = glob.glob(out + "/*.json.gz")
    assert len(gz) == 3  # bounded file count (gzip isn't splittable)
    back = read_jsonl(spark, out, DOC_SCHEMA).cache()
    assert back.count() == 100
    assert back.where(F.col(CORRUPT_COL).isNotNull()).count() == 0
    got = {r.doc_id: r.text for r in back.collect()}
    assert got[42] == "document 42"


def test_jsonl_malformed_rows(spark, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    lines = [json.dumps({"doc_id": i, "text": f"t{i}", "lang": "en"}) for i in range(5)]
    lines.insert(2, "{not valid json at all")
    lines.insert(4, '{"doc_id": "NaN-ish"')  # truncated
    (src / "part-0.jsonl").write_text("\n".join(lines))

    back = read_jsonl(spark, str(src), DOC_SCHEMA).cache()
    assert back.count() == 7
    bad = back.where(F.col(CORRUPT_COL).isNotNull())
    assert bad.count() == 2
    good = back.where(F.col(CORRUPT_COL).isNull())
    assert good.count() == 5

    with pytest.raises(Exception):
        read_jsonl(spark, str(src), DOC_SCHEMA, strict=True).count()


def test_jsonl_schema_inference_bounded(spark, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    (src / "a.jsonl").write_text('{"doc_id": 1, "text": "x"}')
    schema = infer_jsonl_schema(spark, str(src))
    assert set(schema.fieldNames()) == {"doc_id", "text"}


def test_salted_join_identity(spark):
    # heavy skew: 90% of fact rows share key 0
    fact = spark.createDataFrame(
        [(0 if i % 10 else i % 7, i) for i in range(2000)], ["k", "v"]
    )
    dim = spark.createDataFrame([(i, f"name{i}") for i in range(7)], ["k", "name"])
    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_join(fact, dim, "k", salt=8).select("k", "v", "name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    dim = spark.createDataFrame([(1, "one")], ["k", "name"])
    out = salted_join(fact, dim, "k", salt=4, how="left").collect()
    by_k = {r.k: r.name for r in out}
    assert by_k == {1: "one", 99: None}
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="right")


def test_compact_parquet(spark, tmp_path):
    from merchant_classification_spark.sources.compact import (
        compact_parquet,
        dir_stats,
    )

    path = str(tmp_path / "frag")
    df = spark.createDataFrame([(i, f"row {i}") for i in range(1000)], ["k", "v"])
    df.repartition(32).write.parquet(path)  # 32 tiny files
    n0, _ = dir_stats(path)
    assert n0 == 32
    report = compact_parquet(spark, path, target_file_bytes=10**9)
    assert report["compacted"] and report["files_after"] == 1
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg({"k": "sum"}).first()[0] == sum(range(1000))
    # already compact: no-op
    report2 = compact_parquet(spark, path, target_file_bytes=10**9)
    assert report2["compacted"] is False
