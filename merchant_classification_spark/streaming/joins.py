"""Stream-stream and stream-static joins.

Covers the remaining Structured Streaming join classes beyond
``enrich_stream``'s stateless stream-static broadcast join:

  * ``interval_join_streams`` — watermarked stream-stream inner/left
    join under a time-bound condition (the attribution shape: match each
    conversion to clicks within the preceding N minutes). Spark keeps
    both sides' unmatched rows in the state store only as long as the
    time bound + watermark require — bounded state, the canonical
    "stream-stream join with event-time constraint" pattern.

The batch twin of this operator is ``operators/temporal.py``
(``asof_join`` / ``range_join_agg``) — same semantics, so batch backfill
and live streaming agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on `key` where the right event lands in
    ``[left_ts, left_ts + max_delay]``.

    ``left_ts`` and ``right_ts`` must be distinct column names (rename
    upstream if needed) — the join output keeps both. Watermarks on BOTH
    sides plus the closed time bound let Spark compute when a buffered
    row can never match again and evict it: state is O(rows per
    watermark+delay horizon) per side.

    ``how`` may be "inner" or "leftOuter" (outer emission happens only
    once the watermark proves no match can arrive — late, by design).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])
