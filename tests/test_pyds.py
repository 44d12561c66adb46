"""Tests: custom Python DataSource (synthetic corpus generator)."""

from merchant_classification_spark.sources.pyds import register_synthetic_corpus


def _load(spark, n_rows, n_partitions, seed=7):
    register_synthetic_corpus(spark)
    return (
        spark.read.format("synthetic_corpus")
        .option("n_rows", n_rows)
        .option("n_partitions", n_partitions)
        .option("seed", seed)
        .load()
    )


def test_row_count_and_schema(spark):
    df = _load(spark, 500, 4)
    assert df.count() == 500
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    row = df.where("doc_id = 123").collect()[0]
    assert row["n_chars"] == len(row["text"])


def test_partition_planning(spark):
    df = _load(spark, 1000, 8)
    assert df.rdd.getNumPartitions() == 8


def test_deterministic_across_partitionings(spark):
    # (seed, doc_id) fully determines a row: 3 partitions or 7, same data
    a = {r["doc_id"]: tuple(r) for r in _load(spark, 300, 3).collect()}
    b = {r["doc_id"]: tuple(r) for r in _load(spark, 300, 7).collect()}
    assert a == b
    c = {r["doc_id"]: tuple(r) for r in _load(spark, 300, 3, seed=8).collect()}
    assert a != c  # seed matters


def test_composes_with_engine_operators(spark):
    # generated corpus flows straight into the dedup/text tier
    from merchant_classification_spark.functions.text_analysis import token_count
    from pyspark.sql import functions as F

    df = _load(spark, 400, 4)
    stats = df.select(token_count("text").alias("n")).agg(
        F.min("n").alias("lo"), F.max("n").alias("hi")
    ).collect()[0]
    assert 5 <= stats["lo"] <= stats["hi"] <= 60
