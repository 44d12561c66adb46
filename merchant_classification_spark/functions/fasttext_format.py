"""fasttext corpus-line formatting.

Builds ``__label__<merchant-with-dashes> <clean description>`` lines
(reference 01_merchcat_etl.py:84-94 — SURVEY.md §2.3 E8/E9) as a native
concat expression, and the inverse used when reading predictions back
(reference 02_merchcat_ml.py:96-100 — SURVEY.md §2.10 U4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LABEL_PREFIX = "__label__"


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_fasttext_label(merchant: Column | str) -> Column:
    """merchant name → ``__label__name-with-dashes``."""
    return F.concat(F.lit(LABEL_PREFIX), F.regexp_replace(_as_col(merchant), r"\s+", "-"))


def to_fasttext_line(merchant: Column | str, clean_description: Column | str) -> Column:
    """One fasttext training line: ``__label__merchant clean tokens...``."""
    return F.concat(to_fasttext_label(merchant), F.lit(" "), _as_col(clean_description))


def from_fasttext_label(label: Column | str) -> Column:
    """``__label__the-merchant`` → ``the merchant`` (prediction post-proc)."""
    out = F.regexp_replace(_as_col(label), f"^{LABEL_PREFIX}", "")
    return F.regexp_replace(out, "-", " ")
