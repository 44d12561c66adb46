"""Declarative data-quality expectations — one aggregate pass.

The reference eyeballs its tables with driver-side pandas
(`01_merchcat_etl.py:122,152`); a 100 TB pipeline needs the checks to be
(a) declarative, (b) computed engine-side, and (c) cheap. Every check
here compiles to a conditional-count column inside ONE hash aggregate
over the table — adding a check adds a column to the same pass, never a
pass. Uniqueness and referential integrity, which genuinely need more
than a scalar aggregate, are expressed as the minimal extra aggregate
(distinct-count delta) and a broadcast anti-join probe respectively.

Usage::

    report = check(df, [
        not_null("c_custkey"),
        accepted_values("c_mktsegment", ["BUILDING", "AUTOMOBILE", ...]),
        in_range("c_acctbal", -1000.0, 10000.0),
        matches("c_name", r"Customer#\\d+"),
    ])
    # -> [{rule, column, violations, rows}, ...]  (violations == 0 is a pass)

    unique_violations(df, ["c_custkey"])          # duplicate-key rows
    fk_violations(fact, "o_custkey", dim, "c_custkey")  # orphan rows
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """A named per-row predicate; `violated` is TRUE on failing rows."""

    rule: str
    column: str
    violated: Column


def not_null(col: str) -> Expectation:
    return Expectation("not_null", col, F.col(col).isNull())


def accepted_values(col: str, values: list) -> Expectation:
    # NULL is not a value violation — pair with not_null to forbid it
    return Expectation(
        "accepted_values", col, F.col(col).isNotNull() & ~F.col(col).isin(values)
    )


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        "in_range",
        col,
        F.col(col).isNotNull() & ((F.col(col) < lo) | (F.col(col) > hi)),
    )


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(
        "matches", col, F.col(col).isNotNull() & ~F.col(col).rlike(pattern)
    )


def satisfies(rule: str, predicate: Column) -> Expectation:
    """Escape hatch: any boolean Column; rows where it is FALSE violate."""
    return Expectation(rule, "<expr>", ~predicate)


def check(df: DataFrame, expectations: list[Expectation]) -> list[dict]:
    """Evaluate every expectation in ONE aggregate pass over `df`.

    Returns one record per expectation:
    {rule, column, violations, rows}. Deterministic order = input order.
    """
    aggs = [F.count(F.lit(1)).alias("_rows")] + [
        F.sum(e.violated.cast("long")).alias(f"_v{i}")
        for i, e in enumerate(expectations)
    ]
    row = df.agg(*aggs).collect()[0]
    return [
        {
            "rule": e.rule,
            "column": e.column,
            "violations": int(row[f"_v{i}"] or 0),
            "rows": int(row["_rows"]),
        }
        for i, e in enumerate(expectations)
    ]


def unique_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys appearing more than once, with their multiplicity — the
    uniqueness expectation's witness set (empty == pass). One shuffle on
    the key columns."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("times"))
        .where(F.col("times") > 1)
    )


def fk_violations(
    fact: DataFrame,
    fk_col: str,
    dim: DataFrame,
    pk_col: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact rows whose foreign key has no match in the dimension
    (referential-integrity witness set; empty == pass). NULL FKs are not
    violations — pair with not_null to forbid them. The dimension's key
    column broadcasts by default, so the fact table never shuffles."""
    keys = dim.select(F.col(pk_col).alias(fk_col)).dropDuplicates([fk_col])
    if broadcast_dim:
        keys = F.broadcast(keys)
    return fact.where(F.col(fk_col).isNotNull()).join(keys, fk_col, "left_anti")


def check_df(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Engine-side variant of ``check``: the same single aggregate pass,
    returned as a DataFrame (rule, column, violations, rows) — for
    pipelines that persist quality reports instead of branching on them
    driver-side."""
    aggs = [F.count(F.lit(1)).alias("_rows")] + [
        F.sum(e.violated.cast("long")).alias(f"_v{i}")
        for i, e in enumerate(expectations)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{e.rule}', '{e.column}', coalesce(_v{i}, 0L)"
        for i, e in enumerate(expectations)
    )
    n = len(expectations)
    return one.selectExpr(
        f"stack({n}, {stack_args}) AS (rule, column, violations)", "_rows AS rows"
    )
