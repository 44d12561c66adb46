"""Event-stream product analytics: ordered funnels and cohort retention.

Classic clickstream operators (the reference's event table invites them;
SURVEY.md §2 events coverage) with shuffle shapes chosen for 100 TB:

  * ``funnel_steps`` — k chained per-key aggregates. Step i is one
    filter + groupBy(user) + min(ts) pass joined to step i-1's times, so
    the whole funnel is k equi-shuffles on user_id — never a per-user
    sort of the full event history, never a cross join. Event-type
    filters sit directly on the scan (predicate pushdown prunes the
    other types' row groups).
  * ``cohort_retention`` — two aggregates: first-touch per user, then a
    distinct (cohort, offset, user) count. Both shuffle on user_id /
    (cohort, offset); output is tiny (weeks × offsets).

Both return small DataFrames safe to collect, from inputs of any size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step i when an event of
    type ``steps[i]`` occurs STRICTLY AFTER their step i-1 time (first
    qualifying occurrence counts; step 0 is the user's first event of
    ``steps[0]``).

    Returns one row per step: (step_idx, step, users) where ``users`` is
    how many users reached that step — monotone non-increasing.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for step_name in steps:
        matching = events.where(F.col(type_col) == step_name)
        if prev is None:
            cur = matching.groupBy(F.col(user_col).alias("user")).agg(
                F.min(ts_col).alias("t")
            )
        else:
            p = prev.select(
                F.col("user").alias("_puser"), F.col("t").alias("_prev_t")
            )
            cur = (
                matching.join(p, matching[user_col] == p["_puser"])
                .where(F.col(ts_col) > F.col("_prev_t"))
                .groupBy(F.col(user_col).alias("user"))
                .agg(F.min(ts_col).alias("t"))
            )
        reached.append(cur)
        prev = cur
    counts = [
        df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i).alias("step_idx"), F.lit(steps[i]).alias("step"), "users"
        )
        for i, df in enumerate(reached)
    ]
    return reduce(lambda a, b: a.unionByName(b), counts)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort = the period of a user's first event; retention = distinct
    users from that cohort active again N periods later.

    Returns (cohort, period_offset, active_users) with offset 0 being the
    cohort size itself. ``granularity`` is any ``date_trunc`` unit; the
    offset is whole periods between the truncated first-touch period and
    the truncated activity period (exact integer day arithmetic — no
    float date math, so the DuckDB oracle matches bit-for-bit).
    """
    days_per = {"week": 7, "day": 1}
    if granularity not in days_per:
        raise ValueError(f"granularity must be one of {sorted(days_per)}")
    step = days_per[granularity]
    period = lambda c: F.date_trunc(granularity, c).cast("date")  # noqa: E731

    first = events.groupBy(F.col(user_col).alias("user")).agg(
        period(F.min(ts_col)).alias("cohort")
    )
    activity = events.select(
        F.col(user_col).alias("user"), period(F.col(ts_col)).alias("active_period")
    ).distinct()
    return (
        activity.join(first, "user")
        .select(
            "user",
            "cohort",
            F.floor(F.datediff("active_period", "cohort") / step).alias(
                "period_offset"
            ),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct("user").alias("active_users"))
    )
