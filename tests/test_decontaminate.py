"""Tests for operators/decontaminate.py — n-gram train/eval overlap."""

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.operators.decontaminate import (
    decontaminate,
    ngram_overlap_report,
    word_ngrams,
)


def _docs(spark):
    rows = [
        # doc 1 contains eval doc 100's exact 4-gram "the cat sat down"
        (1, "today the cat sat down on the mat"),
        # doc 2 shares words but no 4-gram
        (2, "the cat stood up on the mat"),
        # doc 3 is a verbatim copy of the eval doc (max overlap)
        (3, "the cat sat down quietly"),
        # doc 4 too short to carry a 4-gram
        (4, "tiny doc"),
        (100, "the cat sat down quietly"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_word_ngrams_basic(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["i", "t"])
    got = df.select(word_ngrams("t", 3).alias("g")).head()["g"]
    assert got == ["a b c", "b c d", "c d e"]


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")], ["i", "t"])
    got = [r["g"] for r in df.select(word_ngrams("t", 3).alias("g")).collect()]
    assert got == [[], []]


def test_word_ngrams_dedups_repeats(spark):
    df = spark.createDataFrame([(1, "x y x y x y")], ["i", "t"])
    got = df.select(word_ngrams("t", 2).alias("g")).head()["g"]
    assert sorted(got) == ["x y", "y x"]


def test_overlap_report_flags_expected_docs(spark):
    docs = _docs(spark)
    ev = docs.where(F.col("doc_id") == 100)
    tr = docs.where(F.col("doc_id") != 100)
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in ngram_overlap_report(tr, ev, "doc_id", "text", n=4).collect()
    }
    # doc 1 shares exactly one 4-gram; doc 3 shares both of the eval
    # doc's 4-grams; docs 2 and 4 are clean
    assert got == {1: 1, 3: 2}


def test_hashed_grams_equivalent(spark):
    docs = _docs(spark)
    ev = docs.where(F.col("doc_id") == 100)
    tr = docs.where(F.col("doc_id") != 100)
    plain = ngram_overlap_report(
        tr, ev, "doc_id", "text", n=4, hash_grams=False
    ).collect()
    hashed = ngram_overlap_report(
        tr, ev, "doc_id", "text", n=4, hash_grams=True
    ).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, hashed))


def test_decontaminate_drops_flagged_keeps_rest(spark):
    docs = _docs(spark)
    ev = docs.where(F.col("doc_id") == 100)
    tr = docs.where(F.col("doc_id") != 100)
    kept = decontaminate(tr, ev, "doc_id", "text", n=4)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4]
    # all original columns survive
    assert kept.columns == tr.columns


def test_no_eval_overlap_keeps_everything(spark):
    docs = _docs(spark)
    ev = spark.createDataFrame([(0, "completely different words here")],
                               ["doc_id", "text"])
    tr = docs
    assert decontaminate(tr, ev, "doc_id", "text", n=4).count() == docs.count()


@pytest.mark.parametrize("n", [2, 5])
def test_overlap_report_no_python_stage(spark, n):
    docs = _docs(spark)
    ev = docs.where(F.col("doc_id") == 100)
    tr = docs.where(F.col("doc_id") != 100)
    plan = (
        ngram_overlap_report(tr, ev, "doc_id", "text", n=n)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # pure JVM — no UDF fallback anywhere


def test_remove_contaminated_spans_semantics(spark):
    from merchant_classification_spark.operators.decontaminate import (
        remove_contaminated_spans,
    )

    leak = "what is the capital of france"  # 6 tokens, n=3 grams collide
    train = spark.createDataFrame(
        [
            # leak in the middle: prefix and suffix survive as fragments
            (0, "alpha beta gamma delta " + leak + " omega sigma tau pi"),
            # fully clean doc passes through whole
            (1, "one two three four five six"),
            # doc that IS the leak (plus padding): scrubbed to nothing
            (2, "x " + leak + " y"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame([(100, leak)], ["doc_id", "text"])
    got = remove_contaminated_spans(
        train, eval_df, "doc_id", "text", n=3, pad=1, min_fragment_tokens=2
    ).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: the leak ±1 token is excised; two clean fragments remain
    f0 = sorted(by_doc[0], key=lambda r: r.frag_id)
    assert [r.fragment for r in f0] == ["alpha beta gamma", "sigma tau pi"]
    assert [r.frag_id for r in f0] == [1, 2]
    # doc 1 untouched, one whole fragment
    assert [r.fragment for r in by_doc[1]] == ["one two three four five six"]
    # doc 2 entirely contaminated: nothing survives
    assert 2 not in by_doc


def test_remove_contaminated_spans_no_eval_overlap(spark):
    from merchant_classification_spark.operators.decontaminate import (
        remove_contaminated_spans,
    )

    train = spark.createDataFrame([(0, "a b c d e")], ["doc_id", "text"])
    eval_df = spark.createDataFrame([(1, "x y z w v")], ["doc_id", "text"])
    got = remove_contaminated_spans(
        train, eval_df, "doc_id", "text", n=3, pad=0
    ).collect()
    assert len(got) == 1 and got[0].fragment == "a b c d e"
    assert got[0].n_frag_tokens == 5 and got[0].frag_id == 1


def test_bloom_bitmap_membership_exhaustive(spark):
    from merchant_classification_spark.operators.decontaminate import (
        bloom_bitmap,
        _bloom_might_contain,
    )

    keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], ["gram"])
    words = bloom_bitmap(keys, "gram", m_bits=1024, k=4)
    assert len(words) == 1024 // 64
    # zero false negatives: every inserted key passes the probe
    probe = (
        keys.withColumn("h1", F.xxhash64("gram"))
        .withColumn("h2", F.hash("gram").cast("bigint"))
        .withColumn("_bf", F.lit(words).cast("array<bigint>"))
        .where(F.expr(_bloom_might_contain(1024, 4)))
    )
    assert probe.count() == 50
    # and at 1024 bits / 50 keys almost every non-member is rejected
    other = spark.createDataFrame([(f"z{i}",) for i in range(200)], ["gram"])
    fp = (
        other.withColumn("h1", F.xxhash64("gram"))
        .withColumn("h2", F.hash("gram").cast("bigint"))
        .withColumn("_bf", F.lit(words).cast("array<bigint>"))
        .where(F.expr(_bloom_might_contain(1024, 4)))
        .count()
    )
    assert fp < 20


def test_bloom_bitmap_validation(spark):
    from merchant_classification_spark.operators.decontaminate import bloom_bitmap

    keys = spark.createDataFrame([("a",)], ["gram"])
    with pytest.raises(ValueError):
        bloom_bitmap(keys, "gram", m_bits=100, k=4)  # not a power of two
    with pytest.raises(ValueError):
        bloom_bitmap(keys, "gram", m_bits=1024, k=0)


@pytest.mark.parametrize("hash_grams", [False, True])
def test_bloom_prefilter_row_identical(spark, tables, hash_grams):
    # the done-criterion: bloom-prefiltered report == plain report on
    # real data, for both gram key representations, with the exact join
    # NOT broadcast (the scale configuration the prefilter exists for)
    docs = tables["documents"]
    ev = docs.where(F.col("doc_id") % 17 == 0)
    tr = docs.where(F.col("doc_id") % 17 != 0)
    plain = ngram_overlap_report(
        tr, ev, "doc_id", "text", n=3, hash_grams=hash_grams
    )
    bloom = ngram_overlap_report(
        tr,
        ev,
        "doc_id",
        "text",
        n=3,
        hash_grams=hash_grams,
        bloom_prefilter=True,
        broadcast_eval=False,
    )
    a = sorted((r["doc_id"], r["n_overlap"]) for r in plain.collect())
    b = sorted((r["doc_id"], r["n_overlap"]) for r in bloom.collect())
    assert a == b
    assert len(a) > 0  # the fixture actually exercises overlap


def test_bloom_prefilter_plan_shape(spark, tables):
    # the bloom predicate must run BEFORE the exact join (a Filter on
    # the train side), and no Python stage may appear anywhere
    docs = tables["documents"]
    ev = docs.where(F.col("doc_id") % 17 == 0)
    tr = docs.where(F.col("doc_id") % 17 != 0)
    df = ngram_overlap_report(
        tr, ev, "doc_id", "text", n=3,
        bloom_prefilter=True, broadcast_eval=False,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "forall" in plan or "shiftright" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the predicate sits under the join: find the join line and assert a
    # Filter with the bitmap probe below it in the tree text
    lines = plan.splitlines()
    join_i = min(
        i for i, ln in enumerate(lines) if "Join" in ln and "Inner" in ln
    )
    assert any(
        "Filter" in ln and "shiftright" in ln for ln in lines[join_i:]
    )


def test_bloom_positions_match_wrapping_sum_and_never_overflow(spark):
    """The masked double-hash `((h1&m-1) + i*(h2&m-1)) & (m-1)` must equal
    the low bits of the mathematically-wrapping `h1 + i*h2` (the pre-fix
    form, which ANSI mode can abort with ARITHMETIC_OVERFLOW near
    Long.MAX) — checked in arbitrary-precision Python."""
    m_bits, k = 1024, 4
    rows = [(f"gram-{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, ["gram"])
    hashed = df.select(
        "gram",
        F.xxhash64("gram").alias("h1"),
        F.expr("cast(hash(gram) as bigint)").alias("h2"),
        F.expr(
            f"transform(sequence(0, {k - 1}), i -> "
            f"((xxhash64(gram) & {m_bits - 1}) + "
            f"i * (cast(hash(gram) as bigint) & {m_bits - 1}))"
            f" & {m_bits - 1})"
        ).alias("pos"),
    ).collect()
    for r in hashed:
        for i in range(k):
            # Python ints don't overflow: the true wrapped low bits
            want = (r["h1"] + i * r["h2"]) & (m_bits - 1)
            assert r["pos"][i] == want, (r["gram"], i)
