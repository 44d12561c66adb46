"""Grouped applyInPandas tests: per-group OLS fit on exact integer
moments, cross-checked against DuckDB's regr_slope/regr_intercept
aggregates (tolerance-based here because regr_* accumulates floats in
its own order; the driver oracle replays the moment formulas exactly —
see ORACLES["grouped_linear_fit"])."""

import duckdb
import pytest

from merchant_classification_spark.operators.grouped_apply import grouped_linear_fit


def test_grouped_linear_fit_exact_line(spark):
    rows = [("a", float(i), 2.0 * i + 3.0) for i in range(50)] + [
        ("b", float(i), -1.0 * i + 10.0) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {r.group: r for r in grouped_linear_fit(df, "g", "x", "y").collect()}
    assert got["a"].slope == pytest.approx(2.0) and got["a"].intercept == pytest.approx(3.0)
    assert got["b"].slope == pytest.approx(-1.0) and got["b"].intercept == pytest.approx(10.0)
    assert got["a"].r2 == pytest.approx(1.0)


def test_grouped_linear_fit_degenerate(spark):
    df = spark.createDataFrame(
        [("one", 1.0, 5.0), ("flat", 2.0, 1.0), ("flat", 2.0, 3.0)], ["g", "x", "y"]
    )
    got = {r.group: r for r in grouped_linear_fit(df, "g", "x", "y").collect()}
    assert got["one"].slope is None and got["one"].n == 1
    assert got["flat"].slope is None  # zero x-variance


def test_grouped_linear_fit_vs_duckdb(spark, sf_dir):
    from merchant_classification_spark.sources import load_table

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("user_id").alias("x"),
        F.expr("CAST(round(value*100) AS BIGINT)").alias("y_cents"),
    )
    got = {
        r.group: r
        for r in grouped_linear_fit(ev, "event_type", "x", "y_cents").collect()
    }
    con = duckdb.connect()
    expected = con.sql(
        f"""
        SELECT event_type,
               regr_slope(CAST(round(value*100) AS BIGINT), user_id) AS slope,
               regr_intercept(CAST(round(value*100) AS BIGINT), user_id) AS intercept
        FROM '{sf_dir}/events.parquet' GROUP BY event_type
        """
    ).fetchall()
    for event_type, slope, intercept in expected:
        assert got[event_type].slope == pytest.approx(slope, rel=1e-6)
        assert got[event_type].intercept == pytest.approx(intercept, rel=1e-6)


def test_grouped_linear_fit_rejects_non_integral(spark):
    """The exact-moment contract: non-integral inputs would silently
    truncate in the int64 cast — they must raise instead."""
    df = spark.createDataFrame(
        [("g", 1.5, 2.0), ("g", 2.0, 3.0)], ["g", "x", "y"]
    )
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception)) as ei:
        grouped_linear_fit(df, "g", "x", "y").collect()
    assert "integral" in str(ei.value)
