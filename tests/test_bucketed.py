"""Bucketed co-located joins: the plan must contain ZERO shuffle
exchanges when both sides are bucketed on the join key, and the results
must equal the plain-join results exactly."""

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.plans.explain import (
    count_exchanges,
    explain_str,
)
from merchant_classification_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tables, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    write_bucketed(
        tables["orders"], "b_orders", "o_custkey", 8, path=str(base / "orders")
    )
    write_bucketed(
        tables["customer"],
        "b_customer",
        "c_custkey",
        8,
        path=str(base / "customer"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_no_shuffle(spark, tables, bucketed_tables):
    # disable broadcast so the join would otherwise be a shuffled SMJ
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .withColumnRenamed("o_custkey", "c_custkey")
            .join(spark.table("b_customer"), "c_custkey")
        )
        assert count_exchanges(joined) == 0, explain_str(joined)
        # identical result to the plain (shuffling) join
        plain = (
            tables["orders"]
            .withColumnRenamed("o_custkey", "c_custkey")
            .join(tables["customer"], "c_custkey")
        )
        assert joined.count() == plain.count()
        a = joined.agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        ).first()[0]
        b = plain.agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        ).first()[0]
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_no_shuffle(spark, bucketed_tables):
    agg = (
        spark.table("b_orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert count_exchanges(agg) == 0, explain_str(agg)


def test_bucketed_join_helper_self(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_join(spark, "b_orders", "b_orders", on="o_custkey")
        assert count_exchanges(out) == 0, explain_str(out)
        assert out.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mismatched_bucket_count_still_correct(spark, tables, tmp_path_factory):
    # wrong bucket count on one side: planner may shuffle, results stay right
    base = tmp_path_factory.mktemp("mismatch")
    write_bucketed(
        tables["customer"],
        "b_customer4",
        "c_custkey",
        4,
        path=str(base / "c4"),
    )
    try:
        joined = (
            spark.table("b_orders")
            .withColumnRenamed("o_custkey", "c_custkey")
            .join(spark.table("b_customer4"), "c_custkey")
        )
        plain = (
            tables["orders"]
            .withColumnRenamed("o_custkey", "c_custkey")
            .join(tables["customer"], "c_custkey")
        )
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_customer4")
