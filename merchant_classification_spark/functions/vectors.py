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


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize (double); zero vectors pass through unchanged.

    The norm is bound through a one-element-array lambda so it is
    computed ONCE per row — a bare `transform(v, x -> x / norm(v))`
    would inline the full norm aggregate into every element's division
    (O(dim²) per row after CollapseProject).
    """
    v = to_double_array(a)

    def _scale(n: Column) -> Column:
        return F.when(n == 0.0, v).otherwise(F.transform(v, lambda x: x / n))

    return F.element_at(F.transform(F.array(norm(a)), _scale), 1)


def quantize_int8(a: Column | str) -> Column:
    """fp32 embedding → struct(scale double, q array<tinyint>): symmetric
    linear int8 quantization, q[i] = round(x[i] / scale), scale =
    max|x| / 127.

    Why this is an engine op and not a storage detail: at 100 TB an
    embedding column is the widest thing in the table — int8 cuts every
    shuffle, broadcast, and cache of it 4×, and ANN candidate scoring on
    int8 is exact enough for the recall tiers LSH/IVF already accept.
    All-zero vectors get scale=0 and all-zero codes. Deterministic: the
    same fixed expression order in any IEEE engine.
    """
    v = to_double_array(a)
    amax = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))

    def _q(s: Column) -> Column:
        codes = F.when(
            s == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))
        ).otherwise(F.transform(v, lambda x: F.round(x / s).cast("tinyint")))
        return F.struct(s.alias("scale"), codes.alias("q"))

    return F.element_at(F.transform(F.array(amax / F.lit(127.0)), _q), 1)


def dequantize_int8(qs: Column | str) -> Column:
    """struct(scale, q) → array<double> reconstruction (q[i] * scale)."""
    s = _as_col(qs)

    def _d(scale: Column) -> Column:
        return F.transform(s["q"], lambda x: x.cast("double") * scale)

    return F.element_at(F.transform(F.array(s["scale"]), _d), 1)
