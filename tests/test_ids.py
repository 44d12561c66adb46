"""Tests: scalable dense-ID assignment (two-phase bucket offsets)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from merchant_classification_spark.operators.ids import dense_ids, prefix_sum


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


def _global_prefix(df, order_cols, val_col):
    w = (
        Window.orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(
        "want",
        F.coalesce(F.sum(val_col).over(w), F.lit(0)).cast("long"),
    )


def test_prefix_sum_matches_global_window_numeric(spark, tables):
    li = tables["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).withColumn("q", F.col("l_quantity").cast("long"))
    keys = ["l_orderkey", "l_linenumber"]
    got = prefix_sum(li, keys, "q", "ps", buckets=64)
    want = _global_prefix(li, keys, "q")
    # collect-and-sort comparison: a DataFrame self-join on shared
    # lineage mis-resolves the two window columns
    got_rows = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["ps"])
        for r in got.select(*keys, "ps").collect()
    )
    want_rows = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["want"])
        for r in want.select(*keys, "want").collect()
    )
    assert got_rows == want_rows
    assert got.schema["ps"].dataType.simpleString() == "bigint"


def test_prefix_sum_non_numeric_order_col(spark):
    # string lead column exercises the repartitionByRange fallback
    rows = [(f"k{i:03d}", i % 7 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k: string, v: int")
    got = {r["k"]: r["ps"] for r in prefix_sum(df, ["k"], "v", "ps", buckets=8).collect()}
    acc = 0
    for k, v in sorted(rows):
        assert got[k] == acc
        acc += v


def test_prefix_sum_null_lead_sorts_first(spark):
    rows = [(None, 10), (1, 1), (2, 2), (None, 5)]
    df = spark.createDataFrame(rows, "k: int, v: int")
    got = prefix_sum(df, ["k"], "v", "ps", buckets=4)
    by_k = {(r["k"], r["v"]): r["ps"] for r in got.collect()}
    # NULL keys take bucket 0 (NULLS FIRST): the two nulls sum to 15
    # before k=1; within-null order is unspecified so check the pair set
    assert sorted(ps for (k, _), ps in by_k.items() if k is None) == [0, 5] or sorted(
        ps for (k, _), ps in by_k.items() if k is None
    ) == [0, 10]
    assert by_k[(1, 1)] == 15
    assert by_k[(2, 2)] == 16


def test_prefix_sum_mixed_sign_values(spark):
    # negative values: the bucket totals must be the true per-bucket SUM,
    # not max(running sum) — with sign changes the running sum's max can
    # exceed its final value and every later bucket's offset shifts
    rows = [(i, (-1) ** i * ((i * 7) % 11 + 1)) for i in range(300)]
    df = spark.createDataFrame(rows, "k: int, v: int")
    got = {r["k"]: r["ps"] for r in prefix_sum(df, ["k"], "v", "ps", buckets=16).collect()}
    acc = 0
    for k, v in sorted(rows):
        assert got[k] == acc, f"k={k}"
        acc += v


def test_prefix_sum_empty(spark):
    df = spark.createDataFrame([], "k: long, v: long")
    assert prefix_sum(df, ["k"], "v", "ps").count() == 0
