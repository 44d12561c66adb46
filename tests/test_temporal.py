"""asof_join / range_join_agg semantics: boundaries, ties, no-match."""

import datetime as dt

from pyspark.sql import functions as F

from merchant_classification_spark.operators.temporal import asof_join, range_join_agg

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(10)),   # match: right at ts 5
            (2, 10, _ts(3)),    # match: right at ts 3 (inclusive <=)
            (3, 10, _ts(2)),    # no right row yet -> nulls
            (4, 20, _ts(50)),   # key with no right rows at all
        ],
        ["lid", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts(3), 1.0),
            (101, 10, _ts(5), 2.0),
            (102, 10, _ts(99), 9.0),  # in the future of every left row
        ],
        ["rid", "k", "ts", "v"],
    )
    out = {
        r.lid: (r.asof_rid, r.asof_v)
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["rid", "v"]
        ).collect()
    }
    assert out == {
        1: (101, 2.0),
        2: (100, 1.0),
        3: (None, None),
        4: (None, None),
    }


def test_asof_join_tie_prefers_highest_sort_id(spark):
    left = spark.createDataFrame([(1, 7, _ts(5))], ["lid", "k", "ts"])
    right = spark.createDataFrame(
        [(200, 7, _ts(5), 1.0), (201, 7, _ts(5), 2.0)], ["rid", "k", "ts", "v"]
    )
    row = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["rid", "v"]
    ).collect()[0]
    assert (row.asof_rid, row.asof_v) == (201, 2.0)


def test_range_join_agg_window_boundaries(spark):
    left = spark.createDataFrame([(1, 9, _ts(0)), (2, 9, _ts(100))], ["lid", "k", "ts"])
    right = spark.createDataFrame(
        [
            (9, _ts(0), 10),    # == left ts: inside (>= start)
            (9, _ts(29), 20),   # inside
            (9, _ts(30), 40),   # == start + window: EXCLUDED (< end)
            (9, _ts(-1), 80),   # before: excluded
        ],
        ["k", "ts", "cents"],
    )
    out = {
        r.lid: (r.n, r.total)
        for r in range_join_agg(
            left,
            right,
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            window_seconds=30 * 60,
            aggs=[F.count("cents").alias("n"), F.sum("cents").alias("total")],
            left_id="lid",
        ).collect()
    }
    # left 2 has no matches -> zero-filled count and sum
    assert out == {1: (2, 30), 2: (0, 0)}


def test_range_join_agg_matches_naive_join(spark, sf_dir):
    """Bucketed implementation == naive inequality join on real data."""
    from merchant_classification_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    win_s = 45 * 60
    bucketed = {
        (r.event_id, r.n)
        for r in range_join_agg(
            purchases,
            clicks,
            on=["user_id"],
            left_ts="ts",
            right_ts="cts",
            window_seconds=win_s,
            aggs=[F.count("click_id").alias("n")],
            left_id="event_id",
        ).collect()
    }
    naive = {
        (r.event_id, r.n)
        for r in purchases.join(
            clicks,
            (purchases.user_id == clicks.user_id)
            & (clicks.cts >= purchases.ts)
            & (clicks.cts < purchases.ts + F.expr(f"INTERVAL {win_s} SECOND")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("click_id").alias("n"))
        .collect()
    }
    assert bucketed == naive and bucketed
