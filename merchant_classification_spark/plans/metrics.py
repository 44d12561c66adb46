"""Zero-cost pipeline observability via ``DataFrame.observe``.

The reference validates its ETL by re-reading what it wrote and running
driver-side pandas checks (`01_merchcat_etl.py:122,152` — a second full
pass per metric). ``observe`` attaches named aggregate metrics to a plan
node; they are computed BY the action that already runs (accumulator
style, streamed with the data) — no extra job, no extra scan, exact at
any scale.

``observed_write`` is the pipeline-facing wrapper: write a DataFrame
and get its quality metrics from the same pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_metrics(
    df: DataFrame, obs: Observation, *, null_cols: list[str] | None = None
) -> DataFrame:
    """Attach row count + per-column null counts to the plan. Metrics
    land in `obs` when the next action on the returned frame runs."""
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
        )
    return df.observe(obs, *metrics)


def observed_write(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    mode: str = "overwrite",
    null_cols: list[str] | None = None,
) -> dict:
    """Write `df` and return {n_rows, nulls_<col>...} computed by the
    write job itself — one pass, no second scan of the output."""
    obs = Observation()
    observed = with_quality_metrics(df, obs, null_cols=null_cols)
    observed.write.mode(mode).format(fmt).save(path)
    return dict(obs.get)
