"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB, which rows share a file decides how much a selective query
reads. Range-partitioning by one column gives perfect skipping on that
column and none on any other; interleaving the bits of several columns
into a single Z-value and range-partitioning by THAT gives useful min/max
skipping on every interleaved dimension at once (the trick behind Delta
OPTIMIZE ZORDER BY — re-expressed here as plain codegen bit arithmetic +
``repartitionByRange``, no engine extension required).

``zvalue`` is pure built-in bit ops (shiftright/&/shiftleft/|), so it
whole-stage-codegens and an identical expression runs on any SQL engine
— the oracle query pins it against DuckDB bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of k non-negative integral
    columns into one Morton code (column 0 owns the least-significant
    interleaved bit). k * bits must fit a long (≤ 63).

    Callers bin real values to [0, 2^bits) first — e.g. ntile ranks,
    ``width_bucket``, or a modulus for already-uniform ids.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cs)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long's 63 bits")
    parts = [
        F.shiftleft(
            F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * k + j
        )
        for i in range(bits)
        for j, c in enumerate(cs)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zvalue_sql(cols: list[str], bits: int = 8) -> str:
    """The exact same Morton expression as ANSI SQL text (for oracles /
    engines without a DataFrame API). Identical bit order and operator
    sequence as ``zvalue`` so results match bit-for-bit."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long's 63 bits")
    parts = [
        f"((({c} >> {i}) & 1) << {i * k + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return " | ".join(parts)


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-layout rows so each output partition covers a small hyper-box
    of the ``cols`` space: range-partition + sort by the rows' Z-value.

    Columns are first binned to [0, 2^bits) by value position within the
    column's observed [min, max] span (two tiny aggregates broadcast back
    as literals — no second scan of the data per column). Write the
    result with any file sink; per-file min/max stats on EVERY clustered
    column come out tight, which is what downstream scans skip on.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_max_{c}") for c in cols],
    ).first()
    n_bins = 1 << bits
    binned = []
    for c in cols:
        lo, hi = stats[f"_min_{c}"], stats[f"_max_{c}"]
        span = (hi - lo) or 1.0
        bin_c = F.least(
            F.lit(n_bins - 1),
            ((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * n_bins)
            .cast("long"),
        )
        binned.append(bin_c)
    with_z = df.withColumn("_z", zvalue(binned, bits))
    parted = (
        with_z.repartitionByRange(num_partitions, "_z")
        if num_partitions
        else with_z.repartitionByRange("_z")
    )
    return parted.sortWithinPartitions("_z").drop("_z")
