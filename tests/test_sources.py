"""Source/sink tests: single-file corpus export + text read-back
(reference S4/S7/S8 surface)."""

import os

from pyspark.sql import functions as F

from merchant_classification_spark.sources.text import read_text, write_single_text_file


def test_write_single_text_file_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"__label__m{i} desc {i}",) for i in range(100)], ["fasttext"]
    ).repartition(8)
    dest = str(tmp_path / "corpus" / "train.txt")
    out = write_single_text_file(df, "fasttext", dest)
    assert out == dest and os.path.isfile(dest)
    with open(dest) as f:
        lines = f.read().splitlines()
    assert sorted(lines) == sorted(f"__label__m{i} desc {i}" for i in range(100))
    # read back through the engine's text source
    back = read_text(spark, dest)
    assert back.count() == 100 and back.columns == ["value"]
    # no staging leftovers
    assert not os.path.exists(dest + ".staging")


def test_overwrite_existing(spark, tmp_path):
    df1 = spark.createDataFrame([("a",)], ["v"])
    df2 = spark.createDataFrame([("b",), ("c",)], ["v"])
    dest = str(tmp_path / "out.txt")
    write_single_text_file(df1, "v", dest)
    write_single_text_file(df2, "v", dest)
    with open(dest) as f:
        assert sorted(f.read().split()) == ["b", "c"]
