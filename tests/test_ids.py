"""Tests: scalable dense-ID assignment (two-phase bucket offsets)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from merchant_classification_spark.operators.ids import dense_ids


def test_dense_ids_match_global_row_number(spark, tables):
    orders = tables["orders"].select("o_orderkey", "o_orderpriority")
    out = dense_ids(orders, ["o_orderkey"], buckets=64)
    w = Window.orderBy("o_orderkey")
    want = orders.withColumn("rn", F.row_number().over(w) - 1)
    diff = (
        out.join(want, "o_orderkey")
        .where(F.col("dense_id") != F.col("rn"))
        .count()
    )
    assert diff == 0
    n = orders.count()
    stats = out.agg(
        F.min("dense_id").alias("lo"),
        F.max("dense_id").alias("hi"),
        F.countDistinct("dense_id").alias("d"),
    ).collect()[0]
    assert (stats["lo"], stats["hi"], stats["d"]) == (0, n - 1, n)


def test_dense_ids_tiebreaker_and_skewed_buckets(spark):
    # duplicate lead values: the tiebreaker column makes the order total;
    # all rows land in few buckets (skew) and it must still be exact
    rows = [(v % 3, i) for i, v in enumerate([5, 1, 5, 1, 2, 5, 0, 2])]
    df = spark.createDataFrame(rows, "k: int, t: int")
    out = dense_ids(df, ["k", "t"], buckets=16)
    got = [
        (r["k"], r["t"])
        for r in out.orderBy("dense_id").collect()
    ]
    assert got == sorted(rows)


def test_dense_ids_empty_and_single(spark):
    empty = spark.createDataFrame([], "k: long")
    assert dense_ids(empty, ["k"]).count() == 0
    one = spark.createDataFrame([(42,)], "k: long")
    assert dense_ids(one, ["k"]).collect()[0]["dense_id"] == 0


def test_dense_ids_no_global_single_partition_window(spark, tables):
    # the plan must not contain a window without partitioning over the
    # full input (the scalability hazard this operator exists to avoid):
    # every Window node either partitions by the bucket or runs over the
    # bucket-count aggregate (bounded rows)
    orders = tables["orders"].select("o_orderkey")
    plan = (
        dense_ids(orders, ["o_orderkey"], buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Window \[[^\]]*\]", plan):
        frag = m.group(0)
        # count windows lacking a partition spec: they may only hang off
        # the tiny aggregate branch (which contains no row_number)
        if "_dense_bucket__" not in frag:
            assert "row_number" not in frag
