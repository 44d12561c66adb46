"""Shuffle-reducing join strategies for asymmetric (fact x dim) joins.

At fact scale the cost of ``fact.join(dim)`` is not the match — it is
shuffling every fact row, matched or not. Both operators here cut the
shuffled volume while keeping the RESULT row-identical to the plain
join (both are driver-gated against the plain-SQL oracle):

  * ``semi_prefilter_join`` — broadcast the dim's distinct keys as a
    LEFT SEMI join on the fact side first, so non-matching fact rows die
    at the scan stage instead of crossing the wire. Fully JVM-native;
    the semi side is hash-broadcast, no second shuffle is added. This is
    the manual form of what a bloom/runtime filter does, with zero false
    positives.
  * ``pushdown_keys_join`` — when the dim's key set is driver-bounded
    (``max_keys``), collect it ONCE and inline it as an ``isin``
    predicate, which Spark pushes into the parquet scan (visible as
    ``PushedFilters: [In(k, ...)]``): row groups whose min/max range
    misses the set are never read at all. The collect is the bounded
    driver boundary sanctioned by SURVEY §2 S9 — it is a key LIST, not
    data, and the bound is enforced.

Complementary to ``operators/skew.py`` (salted variants for when the
problem is hot keys rather than shuffle volume) and
``sources/bucketed.py`` (co-located layout for when both sides are big
and the join recurs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """``fact.join(dim, on, how)`` with a broadcast semi-join prefilter
    on the fact side. Result-identical for inner joins (a fact row
    surviving the semi filter has >= 1 dim match; one that does not
    would produce no output row anyway)."""
    keys = [on] if isinstance(on, str) else list(on)
    if how != "inner":
        raise ValueError(
            f"semi_prefilter_join is an inner-join optimization, got {how!r}"
            " — outer joins need the non-matching rows the prefilter drops"
        )
    key_set = dim.select(*keys).distinct()
    pruned = fact.join(F.broadcast(key_set), keys, "left_semi")
    return pruned.join(dim, keys, "inner")


def pushdown_keys_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    max_keys: int = 100_000,
) -> DataFrame:
    """Inner join where the dim's distinct keys are collected (bounded by
    ``max_keys``) and pushed into the fact scan as an ``isin`` filter.

    Falls back to ``semi_prefilter_join`` when the key set exceeds the
    bound — same result either way, so callers need not size the dim in
    advance.
    """
    # limit(max_keys + 1): never pulls more than the bound + 1 rows to
    # the driver even when the dim is huge
    rows = dim.select(on).distinct().limit(max_keys + 1).collect()
    if len(rows) > max_keys:
        return semi_prefilter_join(fact, dim, on)
    keys = [r[0] for r in rows]
    return fact.where(F.col(on).isin(keys)).join(dim, on, "inner")
