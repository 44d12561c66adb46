"""Cleaning-kernel tests.

1. The 14 golden pairs from the reference's unit test
   (reference tests/export.csv via tests_regex.py — SURVEY.md §5) pin the
   end-to-end chain semantics.
2. A fuzz corpus pins Python-dialect (re) ↔ Java-dialect (Spark native
   regexp_replace) parity — the survey's highest-flagged correctness risk
   (SURVEY.md §4.3).
"""

import random

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.functions.cleaning import (
    clean_narrative,
    clean_text,
)
from merchant_classification_spark.functions.fasttext_format import (
    from_fasttext_label,
    to_fasttext_line,
)

# original,expected — verbatim from the reference's golden file
GOLDEN_PAIRS = [
    ("virgin media cd 5347 deb", "virgin media cd 5347 deb"),
    ("the works cd 5347 deb", "the works cd 5347 deb"),
    ("paypal *microsoft cd 5347 14sep19 deb", "paypal microsoft cd 5347 deb"),
    ("costa @ next  cd 5347 deb", "costa next cd 5347 deb"),
    ("amznfreetime cd 5347 deb", "amznfreetime cd 5347 deb"),
    ("paypal *littleclub cd 5347 deb", "paypal littleclub cd 5347 deb"),
    ("co-op group  cd 5347 deb", "co op group cd 5347 deb"),
    ("paypal *helixdigit cd 5347 deb", "paypal helixdigit cd 5347 deb"),
    ("itunes.com/bill cd 5347 13oct19 deb", "itunes com bill cd 5347 deb"),
    ("national trust cd 5347 29dec19 deb", "national trust cd 5347 deb"),
    ("national trust cd 5347 deb", "national trust cd 5347 deb"),
    ("paypal *microsoft cd 5347 deb", "paypal microsoft cd 5347 deb"),
    ("co-op group  cd 5347 28sep19 deb", "co op group cd 5347 deb"),
    ("virgin media cd 5347 deb", "virgin media cd 5347 deb"),
]

EXTRA_CASES = [
    "pay 12.34 gbp at shop",
    "lunch 2021-04-01 12:30pm",
    "foo 01/04/2021 bar",
    "shop 4th of july 2021",
    "xx-xx-2021 card",
    "mask xxxx 1234 deb",
    "price 12,34% off",
    "time 9.45pm now",
    "2021-04.01 mixed delim",
    "transfer 31st december '99",
    "sept 2021 invoice (ref) a&b",
    "AMZN Mktp DE*2L50X1EG4 14:05",
]


def test_golden_pairs_python():
    for original, expected in GOLDEN_PAIRS:
        assert clean_text(original, trim=False) == expected


def test_golden_pairs_spark_native(spark):
    df = spark.createDataFrame([(o,) for o, _ in GOLDEN_PAIRS], ["raw"])
    got = [r.clean for r in df.select(clean_narrative("raw", trim=False).alias("clean")).collect()]
    assert got == [e for _, e in GOLDEN_PAIRS]


def _fuzz_corpus(n=300, seed=7):
    rng = random.Random(seed)
    tokens = [
        "paypal", "*shop", "amzn", "mktp", "cd", "deb", "&", "(ref)", "xx",
        "xxxx", "14sep19", "2021-04-01", "12:30pm", "9.45", "12.34",
        "gbp", "12,34%", "4th", "of", "july", "2021", "co-op", "@", "a/b",
        "31st", "dec", "'99", "xx-xx-2021", "13oct19", " ", "1st", "may",
        "2nd", "feb", "00.00", "23h59", "12.05.2019", "20190401", "O'Neil",
    ]
    out = []
    for _ in range(n):
        k = rng.randint(1, 12)
        out.append(" ".join(rng.choice(tokens) for _ in range(k)))
    return out


def test_python_java_dialect_parity(spark):
    """The same pattern string must behave identically under Python `re`
    and Spark's Java regex engine — run both on a fuzz corpus."""
    corpus = [o for o, _ in GOLDEN_PAIRS] + EXTRA_CASES + _fuzz_corpus()
    df = spark.createDataFrame([(s,) for s in corpus], ["raw"])
    got = [
        r.clean
        for r in df.select(clean_narrative("raw").alias("clean"))
        .collect()
    ]
    expected = [clean_text(s) for s in corpus]
    mismatches = [
        (s, e, g) for s, e, g in zip(corpus, expected, got) if e != g
    ]
    assert not mismatches, f"{len(mismatches)} dialect mismatches, first: {mismatches[:3]}"


def test_fasttext_roundtrip(spark):
    df = spark.createDataFrame(
        [("virgin media", "virgin media cd 5347 deb")], ["merchant", "clean"]
    )
    line = df.select(to_fasttext_line("merchant", "clean").alias("ft"))
    assert line.collect()[0].ft == "__label__virgin-media virgin media cd 5347 deb"
    back = line.select(
        from_fasttext_label(F.split("ft", " ").getItem(0)).alias("m")
    )
    assert back.collect()[0].m == "virgin media"


def test_native_plan_has_no_python_worker(spark):
    """The cleaner must stay JVM-side: no ArrowEvalPython/BatchEvalPython
    node may appear in the physical plan."""
    df = spark.range(10).select(F.concat(F.lit("x "), F.col("id")).alias("raw"))
    plan = df.select(clean_narrative("raw").alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
