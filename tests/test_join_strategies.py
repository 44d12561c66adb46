"""Shuffle-reducing join strategies: result identity + plan shape.

The driver oracle (join_strategies_suite) already proves the aggregated
results match plain SQL; these tests pin the two properties the oracle
can't see — row-level identity on raw joins, and the PHYSICAL plans that
justify the operators' existence (semi side broadcast, isin predicate
reaching the parquet scan).
"""

from pyspark.sql import functions as F

from merchant_classification_spark.operators.join_strategies import (
    pushdown_keys_join,
    semi_prefilter_join,
)
from merchant_classification_spark.plans.explain import (
    has_broadcast_join,
    pushed_filters,
)
from merchant_classification_spark.sources import load_table


def _sorted_rows(df, cols):
    return sorted(df.select(*cols).collect())


def test_semi_prefilter_join_identity(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") <= 10)
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    )
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "p_brand"]
    got = _sorted_rows(semi_prefilter_join(li, dim, "l_partkey"), cols)
    want = _sorted_rows(li.join(dim, "l_partkey"), cols)
    assert got == want and len(got) > 0


def test_semi_prefilter_broadcasts_key_set(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    assert has_broadcast_join(semi_prefilter_join(li, dim, "l_suppkey"))


def test_pushdown_keys_join_identity_and_scan_filter(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == 3)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    out = pushdown_keys_join(li, dim, "l_suppkey")
    cols = ["l_orderkey", "l_linenumber", "l_suppkey"]
    want = _sorted_rows(li.join(dim, "l_suppkey"), cols)
    assert _sorted_rows(out, cols) == want and len(want) > 0
    # the key list must reach the parquet scan as a membership predicate
    # (Catalyst folds a 1-element isin to EqualTo, larger sets stay In)
    pushed = " ".join(pushed_filters(out))
    assert "In(l_suppkey" in pushed or "EqualTo(l_suppkey" in pushed


def test_pushdown_keys_join_falls_back_over_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    out = pushdown_keys_join(li, dim, "l_suppkey", max_keys=2)
    cols = ["l_orderkey", "l_linenumber", "l_suppkey"]
    assert _sorted_rows(out, cols) == _sorted_rows(li.join(dim, "l_suppkey"), cols)
