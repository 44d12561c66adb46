"""Python UDTF surface (Spark 4 ``@udtf``) — the table-function analogue
of the reference's pyfunc UDF boundary (`02_merchcat_ml.py:507-518`).

A UDTF is the sanctioned shape for Python logic that returns a VARIABLE
number of rows per input row (tokenizers that emit per-token rows,
parsers that explode a blob into records) — the cases a scalar pandas
UDF can't express without collect-side post-processing. Spark streams
Arrow batches through the class per partition; there is no driver
involvement and no shuffle beyond what the surrounding plan needs.

Only use a UDTF when the explode genuinely needs Python: the native
``explode(split(...))`` twin below is what the optimizer can see through
(column pruning, filter pushdown into the generate) and is the default.
The UDTF exists so arbitrary Python row-generators have a distributed,
tested on-ramp — and the probe query pins its output to the native
twin's semantics so the two paths can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, word: string")
class WordSplitter:
    """Emit (position, word) per whitespace-separated token.

    Mirrors ``F.posexplode(F.split(text, ' '))`` exactly — including
    empty-string tokens from doubled separators — so the native twin is
    a bit-exact oracle for the plumbing.
    """

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        if text is None:
            return
        for i, w in enumerate(text.split(" ", -1)):
            yield (i, w)


def words_udtf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, word) rows via the Python UDTF (lateral join)."""
    return df.select(F.col(id_col), F.col(text_col)).lateralJoin(
        WordSplitter(F.col(text_col).outer())
    ).select(id_col, "pos", "word")


def words_native(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Native twin: posexplode(split) — same rows, optimizer-visible."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ", -1)).alias("pos", "word"),
    )
