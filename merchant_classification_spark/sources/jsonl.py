"""JSON-Lines source/sink — the lingua franca of LLM training corpora.

Web-scale text datasets (C4, RedPajama, FineWeb dumps, …) ship as
compressed JSONL; this module makes reading/writing them a first-class
engine capability next to parquet (sources/tables.py) and text
(sources/text.py).

Scale rules encoded here:
  * ALWAYS pass an explicit schema on read. Schema inference is a full
    extra pass over the data — at 100 TB that is a second 100 TB scan
    before the first real one. ``read_jsonl`` therefore REQUIRES a
    schema; ``infer_jsonl_schema`` exists for interactive exploration and
    samples a bounded number of files instead of the whole dataset.
  * Malformed lines are data, not crashes: default PERMISSIVE mode
    routes them to ``_corrupt_record`` so a 100 TB ingest doesn't die at
    byte 97 TB; ``strict=True`` opts into FAILFAST for validation runs.
    (Spark rule: referencing ONLY ``_corrupt_record`` straight off raw
    files is disallowed — persist/cache the parsed frame first, which an
    ingest pipeline does anyway when it splits good from bad rows.)
  * gzip-compressed JSONL is NOT splittable — one .json.gz file = one
    task, no parallelism within a file. The writer's default compression
    and file-count knob exist exactly so downstream reads stay parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    strict: bool = False,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read JSONL (optionally compressed — codec inferred from extension)
    with an explicit schema. PERMISSIVE by default: malformed lines land
    in ``_corrupt_record`` (added to the schema when ``keep_corrupt``);
    ``strict=True`` switches to FAILFAST."""
    full = schema
    if keep_corrupt and not strict and CORRUPT_COL not in schema.fieldNames():
        full = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.schema(full)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def infer_jsonl_schema(
    spark: SparkSession, path: str, sample_files: int = 4
) -> T.StructType:
    """Exploration helper: infer the schema from a BOUNDED sample of
    files (never the full dataset). Pin the result in code for
    production reads."""
    import glob
    import os

    candidates = sorted(glob.glob(os.path.join(path, "*"))) or [path]
    return spark.read.json(candidates[:sample_files]).schema


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "gzip",
    num_files: int | None = None,
) -> None:
    """Write JSONL, gzip-compressed by default. ``num_files`` bounds the
    output file count (gzip isn't splittable, so file count = read
    parallelism for every downstream consumer — size files at a few
    hundred MB, not one giant blob)."""
    out = df.repartition(num_files) if num_files else df
    out.write.mode(mode).option("compression", compression).json(path)
