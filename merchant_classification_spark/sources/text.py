"""Text-file sinks/sources.

Replaces the reference's dbutils-based single-file corpus writer
(reference utils/fasttext_utils.py:39-41,61-63 — SURVEY.md §2.1 S7/S8):
`coalesce(1)` funnels the DataFrame through one task to produce exactly one
part file, then a plain-filesystem rename gives it a stable name. The
`coalesce(1)` is a deliberate serialization funnel — it is only correct for
artifacts that must be one file (a training corpus for a single-node
trainer); never use it for data-scale output.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_single_text_file(df: DataFrame, column: str, dest_path: str) -> str:
    """Write ``df[column]`` as exactly one newline-delimited text file.

    Returns ``dest_path``. Scale note: this intentionally funnels all data
    through a single task — it exists for small exported artifacts only
    (the reference's fasttext training file). For large exports, write
    normally partitioned text and let the consumer read the directory.
    """
    staging = dest_path + ".staging"
    df.select(column).coalesce(1).write.mode("overwrite").text(staging)
    parts = glob.glob(os.path.join(staging, "part-*"))
    if len(parts) != 1:
        raise RuntimeError(f"expected exactly one part file in {staging}, got {parts}")
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    shutil.move(parts[0], dest_path)
    shutil.rmtree(staging, ignore_errors=True)
    return dest_path


def read_text(spark, path: str) -> DataFrame:
    """Read newline-delimited text as a one-column (`value`) DataFrame
    (reference 01_merchcat_etl.py:240-241 — SURVEY.md §2.1 S4)."""
    return spark.read.text(path)
