"""Grouped-map custom operators (``applyInPandas``).

The escape hatch for per-group logic that genuinely needs a numerical
library: each group's rows arrive as ONE pandas DataFrame in an Arrow
batch, the function returns a result frame, Spark handles the shuffle and
schema. Use sparingly — anything expressible as native aggregates/windows
stays JVM-side (see operators/relational.py) — but per-group model
fitting is the canonical legitimate case.

Scale: the shuffle key is the group column; a group must fit in one
worker's memory (that is the applyInPandas contract). For dominant keys,
pre-aggregate or sub-sample per group upstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINFIT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType(), False),
        T.StructField("slope", T.DoubleType(), True),
        T.StructField("intercept", T.DoubleType(), True),
        T.StructField("r2", T.DoubleType(), True),
        T.StructField("n", T.LongType(), False),
    ]
)


def grouped_linear_fit(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group ordinary-least-squares fit y = slope*x + intercept.

    Returns (group, slope, intercept, r2, n); degenerate groups (n < 2 or
    zero x-variance) yield NULL coefficients rather than errors.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        g = str(pdf[group_col].iloc[0])
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        n = len(x)
        if n < 2 or np.var(x) == 0.0:
            return pd.DataFrame(
                {"group": [g], "slope": [None], "intercept": [None], "r2": [None], "n": [n]}
            )
        slope, intercept = np.polyfit(x, y, 1)
        pred = slope * x + intercept
        ss_res = float(np.sum((y - pred) ** 2))
        ss_tot = float(np.sum((y - np.mean(y)) ** 2))
        r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else None
        return pd.DataFrame(
            {
                "group": [g],
                "slope": [float(slope)],
                "intercept": [float(intercept)],
                "r2": [r2],
                "n": [n],
            }
        )

    return (
        df.select(group_col, x_col, y_col)
        .groupBy(group_col)
        .applyInPandas(fit, LINFIT_SCHEMA)
    )
