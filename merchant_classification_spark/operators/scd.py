"""Slowly-changing-dimension (type 2) interval building.

Turns an append-only change log (key, ts, attributes...) into validity
intervals: one row per distinct attribute state per key, with
``effective_from`` / ``effective_to`` / ``is_current``. Consecutive
no-change updates collapse into the earlier interval — the compaction a
dimension-history build needs before a MERGE into the warehouse table.

Scale shape: two window passes over the same (key × ts) sort — Catalyst
reuses the one shuffle+sort for both — and a filter in between. No join,
no state, linear in the change log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    A row opens a new interval iff it is the key's first record or ANY
    attribute differs from the previous record (null-safe comparison).
    ``effective_to`` is the next interval's start (exclusive) and NULL on
    the open interval; ``is_current`` flags it.

    Ties on ``ts`` within a key are broken by the first attr column so
    the result is deterministic; feed one record per (key, ts) for
    well-defined history.
    """
    if not attr_cols:
        raise ValueError("scd2 needs at least one attribute column")
    order = [F.col(ts_col), *[F.col(c) for c in attr_cols]]
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first = F.lag(F.col(ts_col)).over(w).isNull()
    opens = df.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.col(c) for c in attr_cols],
        (first | changed).alias("_opens"),
    ).where("_opens")
    w2 = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w2)
    return opens.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )
