"""Scalable surrogate-key assignment: dense contiguous ids in key order.

The naive formulation — ``row_number() OVER (ORDER BY key)`` — collapses
the whole table into ONE partition for the un-partitioned window; at
100 TB that is the canonical driver-shaped bottleneck. The classic
distributed shape used here:

  1. bucket rows by key range (``width_bucket`` over the observed
     min/max — one cheap agg pass for the two scalars);
  2. count rows per bucket (shuffle carries (bucket, 1) partials only)
     and prefix-sum the counts into per-bucket OFFSETS — a window over
     ≤ `buckets` rows, trivially small;
  3. broadcast the offsets back and number rows WITHIN each bucket
     (partitioned window — parallel), adding the bucket's offset.

Result is bit-identical to the global ``row_number() - 1`` whenever the
ordering (order_cols) is total — which the oracle enforces — while every
stage stays parallel. Monotonically-increasing-id (gaps allowed) remains
the zero-shuffle alternative when density is not required; this operator
is for the contract "ids are exactly 0..N-1 in key order".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BUCKET = "_dense_bucket__"
_OFFSET = "_dense_offset__"


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out_col: str = "prefix_sum",
    buckets: int = 1024,
    range_of: DataFrame | None = None,
) -> DataFrame:
    """Append ``out_col`` = sum of ``val_col`` over all rows STRICTLY
    before this row in the total order of ``order_cols`` — bit-identical
    to ``SUM(val) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND
    1 PRECEDING)`` (NULL → 0), without the single-partition pass that a
    global window costs.

    Same three-phase shape as :func:`dense_ids`, generalised from prefix
    COUNT to prefix SUM:

      1. range-bucket rows on the lead order column — ``width_bucket``
         when it is numeric (a map-only projection, no shuffle), else a
         ``repartitionByRange`` + ``spark_partition_id`` fallback (one
         range exchange). NULL lead values take bucket 0, matching the
         NULLS FIRST ascending order of the global window they replace.
      2. sum ``val_col`` per bucket and prefix-sum those partials into
         per-bucket offsets — the only unpartitioned window runs over
         ≤ ``buckets`` aggregated rows, never the data.
      3. broadcast the offsets back and run the running sum WITHIN each
         bucket (partitioned window — parallel), adding the offset.

    Correctness does not depend on where bucket boundaries fall — any
    order-contiguous bucketing yields the same prefix sums — so the
    sampled boundaries of the range-partitioner fallback are safe. For
    the same reason ``range_of`` may point the cheap min/max scan at ANY
    frame whose lead-column range covers ``df``'s (e.g. the raw table
    before an expensive derived filter): wider bounds only unbalance
    buckets, never change the output — and the min/max pass then skips
    ``df``'s derivation entirely.

    Cost: ONE pass over ``df``'s expensive expressions. The bucket
    totals aggregate consumes the same bucket-hash exchange the
    within-bucket window sorts on (Spark's exchange reuse), so ``df`` is
    evaluated once even though the plan reads it on two branches; the
    min/max scan projects only the lead column (or ``range_of``).
    Reuse precondition (verified via scan metrics): ``df``'s columns
    must be exactly the ones the sum needs (``order_cols`` + ``val_col``
    — pre-select before calling, as ``pack_documents`` does). Extra
    payload columns make column pruning narrow the totals branch, the
    exchanges stop being canonically equal, and the plan degrades to two
    (still parallel, still correct) evaluations.
    """
    lead = order_cols[0]
    lead_type = df.schema[lead].dataType
    from pyspark.sql.types import NumericType

    if isinstance(lead_type, NumericType):
        rng = range_of if range_of is not None else df
        mm = rng.agg(
            F.min(lead).alias("lo"), F.max(lead).alias("hi")
        ).collect()
        lo = mm[0]["lo"] if mm else None
        if lo is None:
            # empty or all-NULL lead: one bucket (degenerate but exact)
            bucketed = df.withColumn(_BUCKET, F.lit(0))
        else:
            hi = float(mm[0]["hi"])
            # cast→double is monotone (non-strict), so bucket assignment
            # is order-contiguous even past 2^53 precision loss
            bucketed = df.withColumn(
                _BUCKET,
                F.when(F.col(lead).isNull(), F.lit(0)).otherwise(
                    F.width_bucket(
                        F.col(lead).cast("double"),
                        F.lit(float(lo)),
                        F.lit(hi + 1.0),
                        F.lit(buckets),
                    )
                ),
            )
    else:
        bucketed = df.repartitionByRange(
            buckets, *[F.col(c) for c in order_cols]
        ).withColumn(_BUCKET, F.spark_partition_id())
    # no-op filter (the bucket expression never yields NULL) that both
    # plan branches share: without it the broadcast join infers
    # isnotnull(_BUCKET) on the stream side only, the two bucket-hash
    # exchanges stop being canonically equal, and exchange reuse is lost
    # (two full evaluations of df's expressions instead of one)
    bucketed = bucketed.where(F.col(_BUCKET).isNotNull())
    # Two window expressions over ONE Window node (same partition/order
    # spec): the inclusive running sum, and the full-frame bucket total.
    # The total rides the window (rather than a separate groupBy on the
    # pre-window frame) so the totals aggregate still consumes the SAME
    # bucket-hash exchange the window sorts on (reused — df's expressions
    # evaluate once, in the map stage feeding that shuffle). A full-frame
    # SUM is the bucket total for ANY sign mix; the earlier
    # max(running sum) formulation was only correct for non-negative
    # val_col (it silently under-reported totals once a bucket's running
    # sum dipped below its final value).
    w_in = Window.partitionBy(_BUCKET).orderBy(*order_cols)
    cum_in = "_cum_in__"
    tot_in = "_tot_in__"
    win = bucketed.withColumn(
        cum_in,
        F.sum(F.col(val_col))
        .over(w_in.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    ).withColumn(
        tot_in,
        F.sum(F.col(val_col))
        .over(
            w_in.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("long"),
    )
    totals = win.groupBy(_BUCKET).agg(F.max(tot_in).alias("_s"))
    w_off = Window.orderBy(_BUCKET).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _BUCKET,
        F.coalesce(F.sum("_s").over(w_off), F.lit(0))
        .cast("long")
        .alias(_OFFSET),
    )
    return (
        win.join(F.broadcast(offsets), _BUCKET)
        .withColumn(
            out_col,
            (
                F.col(_OFFSET)
                + F.coalesce(F.col(cum_in), F.lit(0))
                - F.coalesce(F.col(val_col), F.lit(0))
            ).cast("long"),
        )
        .drop(_BUCKET, _OFFSET, cum_in, tot_in)
    )


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "dense_id",
    buckets: int = 1024,
) -> DataFrame:
    """Append ``id_col`` = 0..N-1 following the total order of
    ``order_cols``. The FIRST order column drives the range bucketing
    (must be numeric); remaining columns only break ties inside buckets.
    """
    lead = order_cols[0]
    mm = df.agg(
        F.min(lead).alias("lo"), F.max(lead).alias("hi")
    ).collect()[0]
    if mm["lo"] is None:
        return df.withColumn(id_col, F.lit(None).cast("long"))
    lo, hi = float(mm["lo"]), float(mm["hi"])
    bucket = F.width_bucket(
        F.col(lead).cast("double"), F.lit(lo), F.lit(hi + 1.0), F.lit(buckets)
    )
    bucketed = df.withColumn(_BUCKET, bucket)
    counts = bucketed.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("_n"))
    # prefix sum over <= `buckets` rows: the single-partition window is
    # bounded by the bucket count, not the data size
    w_off = Window.orderBy(_BUCKET).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        _BUCKET, F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias(_OFFSET)
    )
    w_in = Window.partitionBy(_BUCKET).orderBy(*order_cols)
    return (
        bucketed.join(F.broadcast(offsets), _BUCKET)
        .withColumn(
            id_col,
            (F.col(_OFFSET) + F.row_number().over(w_in) - 1).cast("long"),
        )
        .drop(_BUCKET, _OFFSET)
    )
