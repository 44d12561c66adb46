"""Small-files compaction — the table-maintenance chore every long-lived
100 TB dataset needs.

Streaming sinks, incremental batch appends, and over-partitioned writes
all accrete small files; at scale the listing + per-file open cost comes
to dominate scans (a 100 TB table in 4 MB files is 25 million objects).
``compact_parquet`` rewrites a parquet directory into size-targeted
files: read → repartition to ceil(bytes / target) → write to a temp dir →
atomic-ish swap. On Delta/Iceberg this is OPTIMIZE/rewrite_data_files;
this is the plain-parquet equivalent for the sandbox.

The swap is NOT transactional on a plain filesystem (no parquet
metadata transaction to commit against) — run it when the table has no
concurrent writer, which is the same contract plain-parquet appends
already impose.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite `path` into ~target-sized parquet files.

    Returns an audit dict (files/bytes before and after). No-op (and says
    so) when the directory is already at or below the target file count —
    compaction that rewrites 100 TB to save three files is worse than the
    disease.
    """
    n_before, bytes_before = dir_stats(path)
    n_target = max(1, -(-bytes_before // target_file_bytes))  # ceil
    if n_before < min_files_to_compact or n_target >= n_before:
        return {
            "compacted": False,
            "files_before": n_before,
            "files_after": n_before,
            "bytes": bytes_before,
        }
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    # coalesce, not repartition: file-count reduction needs no shuffle
    df.coalesce(n_target).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after, bytes_after = dir_stats(path)
    return {
        "compacted": True,
        "files_before": n_before,
        "files_after": n_after,
        "bytes": bytes_after,
    }
