"""Tests: observe-based pipeline metrics (plans/metrics.py) and the
recursive-CTE driver probe."""

import os

from pyspark.sql import Observation
from pyspark.sql import functions as F

from merchant_classification_spark.plans.metrics import (
    observed_write,
    with_quality_metrics,
)


def test_observed_write_counts_one_pass(spark, tmp_path, tables):
    cust = tables["customer"]
    expected = cust.count()
    path = os.path.join(str(tmp_path), "out")
    m = observed_write(cust, path, null_cols=["c_name", "c_acctbal"])
    assert m["n_rows"] == expected
    assert m["nulls_c_name"] == 0 and m["nulls_c_acctbal"] == 0
    assert spark.read.parquet(path).count() == expected


def test_with_quality_metrics_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id: long, v: string"
    )
    obs = Observation()
    with_quality_metrics(df, obs, null_cols=["v"]).write.format("noop").mode(
        "overwrite"
    ).save()
    got = dict(obs.get)
    assert got == {"n_rows": 3, "nulls_v": 2}


def test_recursive_cte_matches_iterative_join(spark, sf_dir):
    # the SQL fixpoint must agree with a hand-unrolled doubling walk
    import __spark_entry__ as e

    out = {r["depth"]: (r["n_nodes"], r["sum_node"]) for r in
           e.q_recursive_cte(spark, sf_dir).collect()}
    cust = e._t(spark, sf_dir, "customer").select("c_custkey")
    keys = {r["c_custkey"] for r in cust.collect()}
    depth = 0
    frontier = {k: k for k in keys if k % 2 == 1}  # node -> node at depth 0
    while frontier:
        nodes = list(frontier)
        assert out[depth] == (len(nodes), sum(nodes))
        frontier = {k * 2: k * 2 for k in nodes if k * 2 in keys}
        depth += 1
    assert set(out) == set(range(depth))
