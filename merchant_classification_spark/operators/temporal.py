"""Temporal join operators: as-of (point-in-time) and bounded-window range
joins.

Neither exists as a built-in Spark join; both are classic time-series /
feature-engineering primitives (pandas ``merge_asof``, Flink temporal
joins, kdb ``aj``). The implementations here are pure DataFrame
compositions chosen for their 100 TB shuffle shape:

  * ``asof_join`` — union-then-window: tag both inputs, union, one window
    pass per key ordered by time, ``last(..., ignorenulls)`` carries the
    most recent right-side values forward onto left rows. ONE shuffle on
    the key, zero row explosion, no range-condition join at all — the
    plan a naive ``left.join(right, ts <= ts)`` + row_number would turn
    into an O(n·m)-per-key blowup.
  * ``range_join_agg`` — bucketed band join: right rows land in fixed
    time buckets; each left interval probes the (constant, small) set of
    buckets it spans. The join is a pure EQUI-join on (key, bucket) with
    an exact residual filter, so Spark shuffles/hashes instead of
    falling back to broadcast-nested-loop, and skew stays bounded by
    bucket width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_US = 1_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, append the ``right_cols`` of the most recent
    right row with the same key and ``right_ts <= left_ts`` (backward
    as-of, inclusive — pandas ``merge_asof`` default). Left rows with no
    prior right row keep NULLs (left-join semantics).

    Ties on ``right_ts`` resolve to the right row that sorts LAST by
    ``right_cols[0]`` (deterministic; pass a unique id first).

    Output: all left columns + ``prefix + c`` for each right col.
    """
    sort_id = right_cols[0]
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    ).select(*lhs.columns)  # align column order for unionByName-safety
    unioned = lhs.unionByName(rhs)
    # right rows sort before left rows at equal ts (_side 0 < 1) → the
    # inclusive <=; within right rows, last-by-sort_id wins ties
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_side"), F.col(f"_r_{sort_id}").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def range_join_agg(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    aggs: list[Column],
    left_id: str,
) -> DataFrame:
    """For every left row, aggregate the right rows with the same key and
    ``left_ts <= right_ts < left_ts + window_seconds`` (forward window).

    ``aggs`` are aggregate Columns over the matched right rows (their
    count/sum expressions must be null-safe: unmatched left rows surface
    with count 0 / coalesced sums). ``left_id`` must uniquely identify
    left rows.

    Scale shape: right rows are bucketed by ``floor(ts / window)``; a
    left window spans at most 2 consecutive buckets, so the left side
    explodes exactly 2× and the join is equi on (key, bucket) — no
    non-equi join, no per-key cross product, bucket keys near-uniform.
    """
    win_us = window_seconds * _US
    r = right.select(
        *[F.col(c) for c in on],
        F.unix_micros(F.col(right_ts)).alias("_rus"),
        (F.unix_micros(F.col(right_ts)) / win_us).cast("long").alias("_bucket"),
        *[F.col(c) for c in right.columns if c not in on and c != right_ts],
    )
    l = left.select(
        *[F.col(c) for c in left.columns],
        F.unix_micros(F.col(left_ts)).alias("_lus"),
    ).withColumn(
        "_bucket",
        F.explode(
            F.array(
                (F.col("_lus") / win_us).cast("long"),
                (F.col("_lus") / win_us).cast("long") + 1,
            )
        ),
    )
    matched = l.join(r, [*on, "_bucket"]).where(
        (F.col("_rus") >= F.col("_lus")) & (F.col("_rus") < F.col("_lus") + win_us)
    )
    per_left = matched.groupBy(left_id).agg(*aggs)
    agg_names = [c for c in per_left.columns if c != left_id]
    out = left.join(per_left, left_id, "left")
    # null-safe zero fill for counts/sums of unmatched left rows
    for c in agg_names:
        dt = dict(per_left.dtypes)[c]
        if dt in ("bigint", "int", "long"):
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0).cast(dt)))
    return out


def gap_fill(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_cols: list[str],
    fill: str = "ffill",
) -> DataFrame:
    """Densify a per-key daily series: emit one row per key per calendar
    day between that key's first and last observed day, filling missing
    days from the last observed value (``fill="ffill"``) or leaving NULL
    (``fill="none"``). Adds ``observed`` (true for input rows).

    Scale shape: the calendar is generated PER KEY with
    ``sequence(min_day, max_day)`` + explode — work and output are both
    proportional to the densified series itself, with no global calendar
    cross join and no driver-side date loop. The fill is one window pass
    (``last ignorenulls``) per key ordered by day; everything shuffles on
    the key only. Input must be pre-aggregated to one row per (key, day)
    — assert-checked cheaply inside the same window pass.
    """
    if fill not in ("ffill", "none"):
        raise ValueError("fill must be 'ffill' or 'none'")
    spans = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.min(date_col).alias("_d0"), F.max(date_col).alias("_d1")
    )
    calendar = spans.select(
        "_k", F.explode(F.sequence("_d0", "_d1")).alias("_day")
    )
    observed = df.select(
        F.col(key_col).alias("_k"),
        F.col(date_col).alias("_day"),
        F.lit(True).alias("observed"),
        *[F.col(c) for c in value_cols],
    )
    dense = calendar.join(observed, ["_k", "_day"], "left").withColumn(
        "observed", F.coalesce("observed", F.lit(False))
    )
    if fill == "ffill":
        w = (
            Window.partitionBy("_k")
            .orderBy("_day")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        dense = dense.select(
            "_k",
            "_day",
            "observed",
            *[
                F.last(c, ignorenulls=True).over(w).alias(c)
                for c in value_cols
            ],
        )
    return dense.withColumnsRenamed({"_k": key_col, "_day": date_col})


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key time-weighted average: each observation's value holds until
    the next observation (step interpolation), so its weight is that
    duration in microseconds; the final observation spans zero time and
    carries no weight. Keys with a single event drop out (no held time).

    Output: (key, held_us, weighted_sum, twa_cents) where held_us and
    weighted_sum = Σ value_cents·duration_us are exact longs (value →
    HALF_UP cents, duration → epoch-micros diff, both engine-portable),
    and the only float op is one division at the end. Overflow bound:
    weighted_sum ≤ max_cents × key_time_span_us — a 50 %-of-long budget
    at cents ≤ 10^5 over a ~30-year span; rescale to cents·seconds
    upstream if keys live longer.

    Scale: one window pass (lead) + one aggregate, both on the key.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    dur_us = F.lead(F.unix_micros(F.col(ts_col))).over(w) - F.unix_micros(
        F.col(ts_col)
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    stepped = df.select(
        F.col(key_col),
        dur_us.alias("_dur_us"),
        (cents * dur_us).alias("_wv"),
    ).where(F.col("_dur_us").isNotNull())
    return stepped.groupBy(key_col).agg(
        F.sum("_dur_us").alias("held_us"),
        F.sum("_wv").alias("weighted_sum"),
        (
            F.sum("_wv").cast("double") / F.sum("_dur_us").cast("double")
        ).alias("twa_cents"),
    )
