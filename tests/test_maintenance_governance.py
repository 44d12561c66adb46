"""Tests: batch MERGE/upsert, incremental aggregate maintenance,
k-anonymity suppression, pseudonymization, Python UDTF surface."""

from pyspark.sql import functions as F

from merchant_classification_spark.operators.governance import (
    k_anonymity_filter,
    mask_tail,
    pseudonymize,
)
from merchant_classification_spark.operators.maintenance import (
    incremental_agg_state,
    merge_agg_state,
    merge_upsert,
)
from merchant_classification_spark.operators.py_udtf import words_native, words_udtf


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k: long, name: string, bal: double",
    )
    source = spark.createDataFrame(
        [(2, "B2", 99.0), (4, "d", 40.0)], "k: long, name: string, bal: double"
    )
    for bc in (False, True):  # shuffle plan and broadcast plan agree
        out = {
            r["k"]: r
            for r in merge_upsert(
                target, source, "k", broadcast_source=bc
            ).collect()
        }
        assert set(out) == {1, 2, 3, 4}
        assert out[1]["name"] == "a" and out[1]["bal"] == 10.0  # untouched
        assert out[2]["name"] == "B2" and out[2]["bal"] == 99.0  # updated
        assert out[4]["name"] == "d" and out[4]["bal"] == 40.0  # inserted


def test_merge_upsert_partial_update_cols(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0)], "k: long, name: string, bal: double"
    )
    source = spark.createDataFrame(
        [(1, "ZZ", 77.0)], "k: long, name: string, bal: double"
    )
    row = merge_upsert(target, source, "k", update_cols=["bal"]).collect()[0]
    assert row["name"] == "a" and row["bal"] == 77.0


def test_merge_upsert_null_update_keeps_target(spark):
    # coalesce semantics: a NULL source value leaves the target value —
    # document this (real MERGE would overwrite with NULL; exports that
    # need that pass a sentinel instead)
    target = spark.createDataFrame([(1, "a")], "k: long, name: string")
    source = spark.createDataFrame([(1, None)], "k: long, name: string")
    assert merge_upsert(target, source, "k").collect()[0]["name"] == "a"


def test_merge_upsert_broadcast_plan(spark):
    target = spark.createDataFrame([(1, "a")], "k: long, name: string")
    source = spark.createDataFrame([(2, "b")], "k: long, name: string")
    plan = merge_upsert(
        target, source, "k", broadcast_source=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# incremental aggregate maintenance
# ---------------------------------------------------------------------------


def test_incremental_agg_matches_full_recompute(spark, tables):
    orders = tables["orders"].withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    old = orders.where(F.col("o_orderkey") % 4 != 0)
    delta = orders.where(F.col("o_orderkey") % 4 == 0)
    merged = merge_agg_state(
        incremental_agg_state(old, "o_orderpriority", ["cents"]),
        incremental_agg_state(delta, "o_orderpriority", ["cents"]),
    )
    full = incremental_agg_state(orders, "o_orderpriority", ["cents"])
    got = {r["o_orderpriority"]: (r["n_rows"], r["sum_cents"]) for r in merged.collect()}
    want = {r["o_orderpriority"]: (r["n_rows"], r["sum_cents"]) for r in full.collect()}
    assert got == want


def test_incremental_agg_merge_is_order_insensitive(spark):
    rows = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 5)], "g: string, v: long"
    )
    a = incremental_agg_state(rows.where("v <= 1"), "g", ["v"])
    b = incremental_agg_state(rows.where("v > 1"), "g", ["v"])
    ab = {r["g"]: r["sum_v"] for r in merge_agg_state(a, b).collect()}
    ba = {r["g"]: r["sum_v"] for r in merge_agg_state(b, a).collect()}
    assert ab == ba == {"x": 3, "y": 5}


# ---------------------------------------------------------------------------
# governance
# ---------------------------------------------------------------------------


def test_k_anonymity_filter_suppresses_small_groups(spark):
    df = spark.createDataFrame(
        [(1, "US", "A"), (2, "US", "A"), (3, "US", "A"), (4, "FR", "B")],
        "id: long, country: string, seg: string",
    )
    kept = k_anonymity_filter(df, ["country", "seg"], k=2)
    assert sorted(r["id"] for r in kept.collect()) == [1, 2, 3]


def test_k_anonymity_every_surviving_group_has_k(spark, tables):
    cust = tables["customer"]
    out = k_anonymity_filter(cust, ["c_nationkey", "c_mktsegment"], k=5)
    sizes = out.groupBy("c_nationkey", "c_mktsegment").count().collect()
    assert sizes and all(r["count"] >= 5 for r in sizes)


def test_k_anonymity_broadcast_plan(spark, tables):
    plan = (
        k_anonymity_filter(tables["customer"], ["c_mktsegment"], k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_pseudonymize_deterministic_one_way(spark):
    df = spark.createDataFrame([("alice",), ("bob",), (None,)], "name: string")
    out1 = [r["name"] for r in pseudonymize(df, ["name"], salt="s1").collect()]
    out2 = [r["name"] for r in pseudonymize(df, ["name"], salt="s1").collect()]
    out3 = [r["name"] for r in pseudonymize(df, ["name"], salt="s2").collect()]
    assert out1 == out2  # deterministic
    assert out1 != out3  # salt changes tokens
    assert out1[2] is None  # NULL passthrough
    assert all(v is None or len(v) == 64 for v in out1)
    assert "alice" not in out1


def test_mask_tail(spark):
    df = spark.createDataFrame(
        [("1234567890",), ("12",), (None,)], "card: string"
    )
    got = [r["m"] for r in df.select(mask_tail("card", 4).alias("m")).collect()]
    assert got[0] == "******7890"
    assert got[1] == "12"  # shorter than keep: no mask chars, value kept
    assert got[2] is None


# ---------------------------------------------------------------------------
# Python UDTF
# ---------------------------------------------------------------------------


def test_udtf_matches_native_twin(spark, tables):
    docs = tables["documents"].limit(50)
    u = words_udtf(docs, "doc_id", "text").orderBy("doc_id", "pos").collect()
    n = words_native(docs, "doc_id", "text").orderBy("doc_id", "pos").collect()
    assert [tuple(r) for r in u] == [tuple(r) for r in n]
    assert len(u) > 50


def test_udtf_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "id: long, text: string")
    u = words_udtf(df, "id", "text").collect()
    n = words_native(df, "id", "text").collect()
    # split('') yields one empty token; NULL yields nothing — both paths
    assert sorted(tuple(r) for r in u) == sorted(tuple(r) for r in n) == [(2, 0, "")]


# ---------------------------------------------------------------------------
# snapshot_diff (CDC extraction)
# ---------------------------------------------------------------------------


def test_snapshot_diff_types(spark):
    from merchant_classification_spark.operators.maintenance import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0), (4, "d", 4.0)],
        "k: long, s: string, v: double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (3, "c", 3.0), (5, "e", 5.0)],
        "k: long, s: string, v: double",
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    assert set(out) == {2, 3, 4, 5}  # k=1 unchanged → absent
    assert out[2]["change_type"] == "update" and out[2]["s"] == "B"
    assert out[3]["change_type"] == "update"  # NULL -> 'c' detected
    assert out[4]["change_type"] == "delete" and out[4]["s"] is None
    assert out[5]["change_type"] == "insert" and out[5]["s"] == "e"


def test_snapshot_diff_roundtrip_with_merge(spark, tables):
    # applying the diff's upserts+deletes to `old` reproduces `new`
    from merchant_classification_spark.operators.maintenance import (
        merge_upsert,
        snapshot_diff,
    )
    from pyspark.sql import functions as F

    cust = tables["customer"].select("c_custkey", "c_name", "c_acctbal")
    old = cust.where(F.col("c_custkey") % 7 != 0)  # some keys missing
    new = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 1.0).otherwise(
            F.col("c_acctbal")
        ),
    ).where(F.col("c_custkey") % 11 != 0)  # and some deleted
    diff = snapshot_diff(old, new, "c_custkey")
    upserts = diff.where(F.col("change_type") != "delete").drop("change_type")
    deletes = diff.where(F.col("change_type") == "delete").select("c_custkey")
    rebuilt = merge_upsert(old, upserts, "c_custkey").join(
        deletes, "c_custkey", "left_anti"
    )
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0
