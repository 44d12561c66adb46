"""Tests: declarative data-quality expectations (one-pass check,
uniqueness + referential-integrity witness sets)."""

from pyspark.sql import functions as F

from merchant_classification_spark.operators.expectations import (
    accepted_values,
    check,
    fk_violations,
    in_range,
    matches,
    not_null,
    satisfies,
    unique_violations,
)


def test_check_single_pass_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 50.0), (3, "zz", -7.0), (None, "a", 1.0)],
        "id: long, tag: string, v: double",
    )
    report = check(
        df,
        [
            not_null("id"),
            not_null("tag"),
            accepted_values("tag", ["a", "b"]),
            in_range("v", 0.0, 10.0),
            matches("tag", r"^[ab]$"),
            satisfies("id_lt_10", F.col("id") < 10),
        ],
    )
    by_rule = {(r["rule"], r["column"]): r["violations"] for r in report}
    assert all(r["rows"] == 4 for r in report)
    assert by_rule[("not_null", "id")] == 1
    assert by_rule[("not_null", "tag")] == 1
    assert by_rule[("accepted_values", "tag")] == 1  # 'zz' (NULL exempt)
    assert by_rule[("in_range", "v")] == 2  # 50.0 and -7.0
    assert by_rule[("matches", "tag")] == 1  # 'zz'
    # satisfies: NULL id -> predicate NULL -> sum skips it (not counted)
    assert by_rule[("id_lt_10", "<expr>")] == 0


def test_expectations_on_real_tables(spark, tables):
    cust = tables["customer"]
    report = check(
        cust,
        [
            not_null("c_custkey"),
            matches("c_name", r"^Customer#\d+$"),
            in_range("c_nationkey", 0, 24),
        ],
    )
    assert all(r["violations"] == 0 for r in report)


def test_unique_violations(spark, tables):
    cust = tables["customer"]
    assert unique_violations(cust, ["c_custkey"]).count() == 0
    dup = cust.limit(5).union(cust.limit(3))
    bad = unique_violations(dup, ["c_custkey"]).collect()
    assert len(bad) == 3 and all(r["times"] == 2 for r in bad)


def test_fk_violations_and_broadcast_plan(spark, tables):
    orders, cust = tables["orders"], tables["customer"]
    v = fk_violations(orders, "o_custkey", cust, "c_custkey")
    assert v.count() == 0
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # poison one FK: it must surface
    poisoned = orders.limit(10).withColumn("o_custkey", F.lit(-99).cast("long"))
    assert fk_violations(poisoned, "o_custkey", cust, "c_custkey").count() == 10
    # NULL FKs are not violations
    nulled = orders.limit(4).withColumn(
        "o_custkey", F.lit(None).cast("long")
    )
    assert fk_violations(nulled, "o_custkey", cust, "c_custkey").count() == 0


def test_check_df_matches_check(spark, tables):
    from merchant_classification_spark.operators.expectations import check_df

    cust = tables["customer"]
    exps = [not_null("c_name"), in_range("c_nationkey", 0, 24)]
    via_df = {
        (r["rule"], r["column"]): (r["violations"], r["rows"])
        for r in check_df(cust, exps).collect()
    }
    via_driver = {
        (r["rule"], r["column"]): (r["violations"], r["rows"])
        for r in check(cust, exps)
    }
    assert via_df == via_driver
