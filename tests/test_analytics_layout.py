"""Funnel / cohort / gap-fill / TWA semantics on crafted data, plus the
z-order layout proof: Morton codes vs a pure-Python reference and
per-file parquet min/max stats that demonstrate multi-dimension skipping.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.functions.layout import (
    cluster_by_zorder,
    zvalue,
    zvalue_sql,
)
from merchant_classification_spark.operators.analytics import (
    cohort_retention,
    funnel_steps,
)
from merchant_classification_spark.operators.temporal import (
    gap_fill,
    time_weighted_avg,
)


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def crafted_events(spark):
    rows = [
        # user 1 completes view -> click -> purchase in order
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        # user 2 purchases BEFORE clicking: reaches view+click only
        (2, _ts(1), "view"),
        (2, _ts(2), "purchase"),
        (2, _ts(3), "click"),
        # user 3 views only
        (3, _ts(5), "view"),
        # user 4 clicks without ever viewing: reaches nothing
        (4, _ts(1), "click"),
        (4, _ts(2), "purchase"),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


def test_funnel_strict_order(spark, crafted_events):
    out = {
        r.step: r.users
        for r in funnel_steps(
            crafted_events, ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_single_step_counts_first_events(spark, crafted_events):
    out = funnel_steps(crafted_events, ["purchase"]).collect()
    assert len(out) == 1 and out[0].users == 3


def test_cohort_retention_offsets(spark):
    # user 1 first touches week of Jan 1 (Mon), returns 2 weeks later;
    # user 2 first touches week of Jan 8, never returns
    rows = [
        (1, _ts(2)),   # Tue Jan 2 -> cohort Mon Jan 1
        (1, _ts(16)),  # Tue Jan 16 -> offset 2
        (2, _ts(10)),  # Wed Jan 10 -> cohort Mon Jan 8
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (str(r.cohort), r.period_offset): r.active_users
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_gap_fill_ffill_and_observed(spark):
    rows = [
        (1, dt.date(2024, 1, 1), 100),
        (1, dt.date(2024, 1, 4), 400),  # 2-day hole before this
        (2, dt.date(2024, 1, 2), 200),  # single-day key: no holes
    ]
    df = spark.createDataFrame(rows, ["k", "day", "v"])
    out = {
        (r.k, str(r.day)): (r.v, r.observed)
        for r in gap_fill(df, "k", "day", ["v"]).collect()
    }
    assert out == {
        (1, "2024-01-01"): (100, True),
        (1, "2024-01-02"): (100, False),
        (1, "2024-01-03"): (100, False),
        (1, "2024-01-04"): (400, True),
        (2, "2024-01-02"): (200, True),
    }


def test_gap_fill_none_leaves_nulls(spark):
    rows = [(1, dt.date(2024, 1, 1), 7), (1, dt.date(2024, 1, 3), 9)]
    df = spark.createDataFrame(rows, ["k", "day", "v"])
    out = {
        str(r.day): r.v
        for r in gap_fill(df, "k", "day", ["v"], fill="none").collect()
    }
    assert out == {"2024-01-01": 7, "2024-01-02": None, "2024-01-03": 9}


def test_time_weighted_avg_hand_computed(spark):
    # value 10.00 held 60s, then 20.00 held 30s, final event weightless
    rows = [
        (1, _ts(1, 0), 10.0),
        (1, dt.datetime(2024, 1, 1, 0, 1), 20.0),
        (1, dt.datetime(2024, 1, 1, 0, 1, 30), 99.0),
        (2, _ts(1), 5.0),  # single event -> no held time, drops out
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = time_weighted_avg(df, "k", "ts", "v").collect()
    assert len(out) == 1
    r = out[0]
    assert r.held_us == 90_000_000
    assert r.weighted_sum == 1000 * 60_000_000 + 2000 * 30_000_000
    assert r.twa_cents == pytest.approx((1000 * 60 + 2000 * 30) / 90)


def _py_morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue(["x", "y"]).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton(x, y), (x, y)


def test_zvalue_sql_matches_column_variant(spark):
    df = spark.range(1000).select(
        (F.col("id") * 37 % 256).alias("x"), (F.col("id") * 101 % 256).alias("y")
    )
    mismatch = df.select(
        zvalue(["x", "y"]).alias("a"),
        F.expr(zvalue_sql(["x", "y"])).alias("b"),
    ).where(F.col("a") != F.col("b"))
    assert mismatch.count() == 0


def test_zvalue_rejects_too_many_bits():
    with pytest.raises(ValueError):
        zvalue(["a", "b"], bits=32)


def test_cluster_by_zorder_tightens_file_stats(spark, tmp_path):
    """The point of z-ordering: per-FILE min/max parquet stats become
    tight boxes on EVERY clustered column, so selective scans on either
    column skip most files. Compare mean per-file span against the
    unclustered baseline via actual parquet footer statistics."""
    import pyarrow.parquet as pq

    df = spark.range(20_000).select(
        (F.col("id") * 7919 % 1024).alias("x"),
        (F.col("id") * 104729 % 1024).alias("y"),
    )

    plain_dir, z_dir = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartition(16).write.parquet(plain_dir)
    cluster_by_zorder(df, ["x", "y"], bits=8, num_partitions=16).write.parquet(
        z_dir
    )

    def mean_span(d: str, col: str) -> float:
        import glob

        spans = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        los.append(c.statistics.min)
                        his.append(c.statistics.max)
            if los:
                spans.append(max(his) - min(los))
        assert spans, f"no stats found under {d}"
        return sum(spans) / len(spans)

    for col in ("x", "y"):
        plain, zord = mean_span(plain_dir, col), mean_span(z_dir, col)
        # hash-random layout spans ~the full 1024 domain per file;
        # a 16-partition z-layout over 256x256 cells must cut it sharply
        assert zord < plain * 0.55, (col, zord, plain)
