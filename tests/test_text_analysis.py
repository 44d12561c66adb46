"""Text-analysis function tests."""

from pyspark.sql import functions as F

from merchant_classification_spark.functions.text_analysis import (
    fingerprint,
    lang_id,
    quality_score,
    subword_count,
    token_count,
    tokens,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "t: string")
    return df.select(expr.alias("v")).collect()[0].v


def test_token_count(spark):
    assert _one(spark, "Hello, World! 42", token_count("t")) == 3
    assert _one(spark, "   ", token_count("t")) == 0
    assert _one(spark, "", token_count("t")) == 0
    assert _one(spark, None, token_count("t")) == 0  # null-safe


def test_tokens_keep_apostrophe(spark):
    assert _one(spark, "don't stop", tokens("t")) == ["don't", "stop"]


def test_subword_count(spark):
    # "tokenization" → token|izat|ion = 3 pieces; "!" → 1
    assert _one(spark, "tokenization!", subword_count("t")) == 4


def test_lang_id(spark):
    assert _one(spark, "the cat sat on the mat and it is happy", lang_id("t")) == "en"
    assert _one(spark, "el gato y la casa de un amigo", lang_id("t")) == "es"
    assert _one(spark, "der hund und die katze ist da", lang_id("t")) == "de"
    assert _one(spark, "zzz qqq xxx", lang_id("t")) == "und"
    assert _one(spark, "", lang_id("t")) == "und"


def test_quality_score_bounds(spark, tables):
    scores = tables["documents"].select(quality_score("text").alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in scores)


def test_quality_prefers_clean_text(spark):
    clean = _one(spark, "a sensible sentence with many reasonable words " * 3,
                 quality_score("t"))
    noisy = _one(spark, "@@!! ## 123 456 789 $$$ %% ^^", quality_score("t"))
    assert clean > noisy


def test_fingerprint_invariance(spark):
    a = _one(spark, "alpha beta gamma", fingerprint("t"))
    b = _one(spark, "gamma beta alpha alpha", fingerprint("t"))
    c = _one(spark, "alpha beta delta", fingerprint("t"))
    assert a == b
    assert a != c


def test_repetition_scores_edges(spark):
    from merchant_classification_spark.functions.text_analysis import (
        repetition_scores,
    )

    df = spark.createDataFrame(
        [
            (1, "a a a a"),            # fully repetitive
            (2, "w x y z"),            # fully distinct
            (3, "solo"),               # single token: no bigrams
            (4, ""),                   # empty: all ratios NULL
            (5, None),                 # null text behaves as empty
            (6, "p q p q p q"),        # dominant bigram alternation
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in repetition_scores(df, "text").collect()}
    assert out[1].n_tokens == 4 and out[1].n_distinct == 1
    assert out[1].distinct_ratio == 0.25 and out[1].top_token_share == 1.0
    assert out[1].top_bigram_share == 1.0  # "a a" is every bigram
    assert out[2].distinct_ratio == 1.0 and out[2].top_token_share == 0.25
    assert out[3].n_tokens == 1 and out[3].top_bigram_share is None
    assert out[4].n_tokens == 0 and out[4].distinct_ratio is None
    assert out[5].n_tokens == 0 and out[5].top_token_share is None
    # "p q" appears 3x of 5 bigrams
    assert out[6].top_bigram_share == 3 / 5


def test_vector_quantization_roundtrip(spark):
    from merchant_classification_spark.functions.vectors import (
        dequantize_int8,
        l2_normalize,
        norm,
        quantize_int8,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5]),
            (2, [0.0, 0.0, 0.0]),          # zero vector: scale 0, codes 0
            (3, [1e-8, -1e-8]),            # tiny magnitudes
            (4, [100.0] * 64),             # constant
        ],
        "id long, v array<double>",
    )
    out = df.select(
        "id",
        quantize_int8("v").alias("qs"),
        l2_normalize("v").alias("n"),
        F.col("v"),
    ).select(
        "id",
        "qs.scale",
        "qs.q",
        dequantize_int8("qs").alias("recon"),
        norm("n").alias("unit_norm"),
        "v",
    )
    rows = {r.id: r for r in out.collect()}
    # reconstruction error bounded by scale/2 per element
    for rid, r in rows.items():
        for orig, rec in zip(r.v, r.recon):
            assert abs(orig - rec) <= r.scale / 2 + 1e-12, (rid, orig, rec)
        assert all(-127 <= c <= 127 for c in r.q)
    assert rows[2].scale == 0.0 and set(rows[2].q) == {0}
    # unit norm after normalization (zero vector stays zero)
    assert abs(rows[1].unit_norm - 1.0) < 1e-12
    assert rows[2].unit_norm == 0.0
    assert abs(rows[4].unit_norm - 1.0) < 1e-12
