"""Native array-vector math (SURVEY.md §1.2 extended surface).

Embeddings live as ``array<float>`` columns; all math here is built from
higher-order functions (``zip_with`` / ``aggregate`` / ``transform``) so it
runs inside whole-stage codegen — no UDF, no Python worker, no Arrow hop.
Everything is promoted to double before arithmetic: deterministic IEEE
results and no float32 accumulation drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_double_array(col: Column | str) -> Column:
    return _as_col(col).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two numeric arrays (double)."""
    prods = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    """L2 norm of a numeric array (double)."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def squared_euclidean(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        to_double_array(a), to_double_array(b), lambda x, y: (x - y) * (x - y)
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
