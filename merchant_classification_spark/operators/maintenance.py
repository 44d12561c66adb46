"""Table-maintenance operators: batch MERGE (upsert) and incremental
aggregate maintenance.

The reference's pipeline rewrites its Delta tables wholesale each run
(`01_merchcat_etl.py:105-111` overwrites the silver table). At 100 TB a
full rewrite per ingest is untenable; the idiomatic fix is (a) key-based
MERGE of the new batch into the existing table and (b) maintaining
pre-aggregated state by merging DELTA partials instead of re-scanning
history. Both are expressed here as pure DataFrame plans so they run on
any store (parquet in this harness, Delta/Iceberg in production via
their native MERGE once available — the semantics below are the
engine-portable contract the sinks must honour).

Scale shape:
  * ``merge_upsert`` — one shuffle per side on the merge keys (or zero
    for the source side when it broadcasts: pass ``broadcast_source``).
    No window, no full rewrite of unmatched partitions is *forced* by
    the plan — with a partition-pruned target scan (partitioned.py) the
    unmatched remainder never moves.
  * ``incremental_agg_state`` / ``merge_agg_state`` — classic
    partial-aggregate maintenance: the delta is aggregated down to one
    row per touched key (map-side combine does most of it), then merged
    with the existing state by key. Cost is O(|delta| + |state∩keys|)
    instead of O(|history|); counts and sums are mergeable by addition,
    avg is re-derived from (sum, count) at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str] | str,
    update_cols: list[str] | None = None,
    broadcast_source: bool = False,
) -> DataFrame:
    """SQL MERGE semantics as a batch plan: rows matched on `keys` take
    `update_cols` from `source` (other target columns kept); unmatched
    source rows are inserted; unmatched target rows pass through.

    `source` must have at most one row per key (enforce upstream — a
    multi-match MERGE is ambiguous and real engines reject it).
    `update_cols` defaults to every non-key source column. Source rows
    must carry all target columns when inserts are possible; missing
    ones land as NULL via unionByName.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if update_cols is None:
        update_cols = [c for c in source.columns if c not in key_list]

    def merged_select(joined):
        return joined.select(
            *key_list,
            *[
                (
                    F.coalesce(F.col(f"_src_{c}"), F.col(c)).alias(c)
                    if c in update_cols
                    else F.col(c)
                )
                for c in target.columns
                if c not in key_list
            ],
        )

    flagged = source.select(
        *key_list,
        *[F.col(c).alias(f"_src_{c}") for c in update_cols],
    )
    if not broadcast_source:
        # one shuffle per side on the merge keys
        return merged_select(target.join(flagged, key_list, "full_outer"))
    # Broadcast plan: full-outer joins cannot broadcast, so split MERGE
    # into (a) updates via a broadcast LEFT join — the target is never
    # shuffled — and (b) inserts via source ∖ matched-keys, where the
    # matched-key set (≤ |source| rows, keys only) comes from a broadcast
    # semi-join; both sides of the anti-join are source-sized. The target
    # scans twice, which with partition pruning and column pruning is far
    # cheaper at scale than shuffling it once.
    updated = merged_select(target.join(F.broadcast(flagged), key_list, "left"))
    matched_keys = target.select(*key_list).join(
        F.broadcast(source.select(*key_list)), key_list, "left_semi"
    )
    inserts = source.join(F.broadcast(matched_keys), key_list, "left_anti")
    return updated.unionByName(inserts, allowMissingColumns=True)


def incremental_agg_state(
    rows: DataFrame, keys: list[str] | str, sum_cols: list[str]
) -> DataFrame:
    """Aggregate raw rows to the mergeable per-key state
    (n_rows + sum_<c> for each c). Map-side combine collapses each input
    partition before the single shuffle on `keys`."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return rows.groupBy(*key_list).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )


def merge_agg_state(state: DataFrame, delta_state: DataFrame) -> DataFrame:
    """Merge two mergeable states (same schema: keys + n_rows + sum_*):
    counts and sums add per key. Commutative and associative, so epochs
    can merge in any order or tree shape."""
    key_list = [c for c in state.columns if c != "n_rows" and not c.startswith("sum_")]
    metric_cols = [c for c in state.columns if c not in key_list]
    return (
        state.unionByName(delta_state)
        .groupBy(*key_list)
        .agg(*[F.sum(c).alias(c) for c in metric_cols])
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data capture from two full snapshots: one row per changed
    key with ``change_type`` ∈ {'insert', 'update', 'delete'} and the NEW
    row's values (NULLs for deletes). The inverse of ``merge_upsert``:
    applying the diff to `old` reproduces `new`.

    One shuffle per side on the keys (full outer join); change detection
    is a null-safe column comparison (<=>) so NULL→value and value→NULL
    transitions count as updates, not misses. Unchanged keys are dropped
    before anything else materializes, so the output is delta-sized.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in key_list]

    o = old.select(
        *key_list,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_list,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
    )
    joined = o.join(n, key_list, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
    change_type = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change_type)
        .where(F.col("change_type").isNotNull())
        .select(
            *key_list,
            "change_type",
            *[F.col(f"_new_{c}").alias(c) for c in compare_cols],
        )
    )
