"""Data-governance operators: k-anonymity suppression and deterministic
pseudonymization for training-data exports.

The reference scrubs PII lexically (dates/card numbers in narratives —
`utils/regex_utils.py`; rebuilt in ``functions/pii.py``). A corpus
export additionally needs *record-level* guarantees:

  * ``k_anonymity_filter`` — suppress every row whose quasi-identifier
    combination is shared by fewer than k rows (Sweeney's k-anonymity,
    suppression-only variant). One hash aggregate over the quasi
    columns joined back to the rows — NOT a window over the full table,
    so the heavy side shuffles once and the (distinct-combination)
    aggregate is small enough to broadcast back.
  * ``pseudonymize`` — replace identifier columns with a salted SHA-256
    token: deterministic (joins across exported tables still line up),
    one-way (the salt never ships with the data), and codegen-only.
  * ``mask_tail`` — partial masking (all but the last n chars become
    '*') for human-readable exports.

All three are pure column expressions / single-agg plans — no Python,
no window over the fact table, safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_filter(
    df: DataFrame, quasi_cols: list[str], k: int, broadcast_groups: bool = True
) -> DataFrame:
    """Keep only rows whose (quasi_cols) combination occurs ≥ k times.

    The distinct-combination counts are tiny relative to the fact table
    (bounded by the quasi-identifier domain product), so they join back
    as a broadcast by default — the fact table is never shuffled at all.
    Set ``broadcast_groups=False`` when the quasi domain itself is huge.
    """
    groups = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_qi_count"))
        .where(F.col("_qi_count") >= k)
        .drop("_qi_count")
    )
    if broadcast_groups:
        groups = F.broadcast(groups)
    return df.join(groups, quasi_cols, "left_semi")


def pseudonym(col: Column | str, salt: str) -> Column:
    """Salted SHA-256 hex token of a column (string). NULL stays NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull(), F.sha2(F.concat(F.lit(salt), c.cast("string")), 256)
    )


def pseudonymize(df: DataFrame, cols: list[str], salt: str) -> DataFrame:
    """Replace each named column with its salted SHA-256 token in place."""
    out = df
    for c in cols:
        out = out.withColumn(c, pseudonym(c, salt))
    return out


def mask_tail(col: Column | str, keep: int = 4, mask_char: str = "*") -> Column:
    """Mask all but the last `keep` characters ('**********1234')."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            F.repeat(F.lit(mask_char), F.greatest(n - keep, F.lit(0))),
            F.substring(c, -keep, keep),
        )
    )
