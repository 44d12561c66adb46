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


def test_unigram_model_and_perplexity(spark):
    """CCNet-style unigram screen: model fit, OOV accounting, the
    fixed-order fold, and the keep rule — checked against a hand
    computation on a corpus small enough to enumerate."""
    import math

    from merchant_classification_spark.functions.text_analysis import (
        perplexity_scores,
        unigram_model,
    )

    df = spark.createDataFrame(
        [
            (1, "cat cat dog"),
            (2, "cat dog bird"),
            (3, "zebra zebra zebra"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    # corpus: cat=3 dog=2 bird=1 zebra=3 -> N=9, V=4
    model, oov = unigram_model(df, "text", top_k=2)
    assert [t for t, _ in model] == ["cat", "zebra"]  # ties: count desc, tok asc
    denom = 9 + 4 + 1
    assert model[0][1] == math.log(4 / denom)
    assert oov == math.log(1 / denom)

    out = {
        r.doc_id: r
        for r in perplexity_scores(df, model, oov, tau=2.0).collect()
    }
    lp = dict(model)
    # doc 1: cat cat dog -> cat + cat + oov, left-to-right fold from 0.0
    want = ((0.0 + lp["cat"]) + lp["cat"]) + oov
    assert out[1].logprob_sum == want
    assert out[1].n_tokens == 3 and out[1].oov_count == 1
    assert out[1].avg_neg_logprob == -(want / 3.0)
    # doc 3: all zebra, in-vocab
    assert out[3].oov_count == 0
    # empty + NULL text: zero tokens, NULL score, keep=False (not NULL)
    for d in (4, 5):
        assert out[d].n_tokens == 0
        assert out[d].logprob_sum == 0.0
        assert out[d].avg_neg_logprob is None
        assert out[d].keep is False
    # keep rule: low perplexity (in-distribution) passes
    assert out[3].keep == (out[3].avg_neg_logprob <= 2.0)
    # model vocabulary is bounded by top_k even when V is larger
    assert len(model) == 2


def test_dsir_logratios_and_scores(spark):
    """DSIR hashed importance weights vs a pure-Python replay: same
    bucket counts, same smoothed log-ratios, same left-to-right fold."""
    import hashlib
    import math

    from merchant_classification_spark.functions.text_analysis import (
        dsir_logratios,
        dsir_scores,
    )

    def bucket(feat, b):
        return int(hashlib.md5(feat.encode()).hexdigest()[:15], 16) % b

    def feats(s):
        import re

        c = re.sub(r"[^a-z0-9']+", " ", (s or "").lower()).strip()
        t = c.split(" ") if c else []
        return t + [f"{a}_{b}" for a, b in zip(t, t[1:])]

    rows = [
        (1, "spark query engine", True),
        (2, "spark table scan", True),
        (3, "zebra yak llama gnu", False),
        (4, "spark zebra", False),
        (5, "", True),
        (6, None, False),
    ]
    B = 8
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    lr = dsir_logratios(df, "text", F.col("tgt"), n_buckets=B)

    # pure-Python fit replay
    raw = [0] * B
    tgt = [0] * B
    for _, text, w in rows:
        for f in feats(text):
            b = bucket(f, B)
            raw[b] += 1
            if w:
                tgt[b] += 1
    d_raw, d_tgt = float(sum(raw) + B), float(sum(tgt) + B)
    want = [
        math.log((tgt[i] + 1) / d_tgt) - math.log((raw[i] + 1) / d_raw)
        for i in range(B)
    ]
    assert lr == want

    out = {r.doc_id: r for r in dsir_scores(df, lr, "text", "doc_id").collect()}
    for doc_id, text, _ in rows:
        fs = feats(text)
        s = 0.0
        for f in fs:
            s = s + lr[bucket(f, B)]
        assert out[doc_id].n_features == len(fs)
        assert out[doc_id].dsir_logratio == s
        assert out[doc_id].keep == (len(fs) > 0 and s > 0.0)
    # target-leaning text scores above off-target text
    assert out[1].dsir_logratio > out[3].dsir_logratio
    # empty / NULL text: zero features, zero weight, keep=False
    for d in (5, 6):
        assert out[d].n_features == 0
        assert out[d].dsir_logratio == 0.0
        assert out[d].keep is False


def test_dsir_validates_buckets(spark):
    from merchant_classification_spark.functions.text_analysis import (
        dsir_logratios,
        dsir_scores,
    )

    df = spark.createDataFrame([(1, "a", True)], "doc_id long, text string, t boolean")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dsir_logratios(df, "text", F.col("t"), n_buckets=0)
    with _pytest.raises(ValueError):
        dsir_scores(df, [], "text", "doc_id")


def test_bigram_backoff_model_and_scores(spark):
    """Stupid-backoff bigram screen: fit math, backoff accounting, and
    the context sensitivity a unigram model cannot have."""
    import math

    from merchant_classification_spark.functions.text_analysis import (
        bigram_backoff_model,
        bigram_perplexity_scores,
        unigram_model,
    )

    rows = [(i, "the cat sat on the mat") for i in range(10)] + [
        (100 + i, "the dog ran to the barn") for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uni, bi, oov, la = bigram_backoff_model(
        df, "text", top_k=16, top_k2=32, alpha=0.4
    )
    # unigram part identical to the standalone fit
    uni_ref, oov_ref = unigram_model(df, "text", top_k=16)
    assert uni == uni_ref and oov == oov_ref
    assert la == math.log(0.4)
    bmap = dict(bi)
    # c("the cat")=10, c("the")=40 -> log(0.25); seen in every bigram key
    assert abs(bmap["the\x1fcat"] - math.log(10 / 40)) < 1e-15
    assert abs(bmap["cat\x1fsat"] - math.log(1.0)) < 1e-15  # 10/10

    scored = {
        r["doc_id"]: r
        for r in bigram_perplexity_scores(
            df, uni, bi, oov, la, tau=3.0
        ).collect()
    }
    r = scored[0]
    assert r["n_tokens"] == 6 and r["n_backoff"] == 0  # all bigrams seen
    # exact replay: first-token uni + the five bigram logprobs
    umap = dict(uni)
    toks = "the cat sat on the mat".split()
    want = umap["the"]
    for a, b in zip(toks, toks[1:]):
        want = want + bmap[f"{a}\x1f{b}"]
    assert r["logprob_sum"] == want
    assert r["keep"] == (-(want / 6) <= 3.0)

    # context sensitivity: same multiset of tokens, scrambled order ->
    # unseen bigrams -> backoff positions and a WORSE (higher) score
    df2 = spark.createDataFrame([(1, "cat the on sat mat the")], ["doc_id", "text"])
    r2 = bigram_perplexity_scores(df2, uni, bi, oov, la).collect()[0]
    assert r2["n_backoff"] > 0
    assert -(r2["logprob_sum"] / 6) > -(r["logprob_sum"] / 6)

    # empty/null docs: zero sum, NULL avg
    df3 = spark.createDataFrame([(1, ""), (2, None)], ["doc_id", "text"])
    for row in bigram_perplexity_scores(df3, uni, bi, oov, la).collect():
        assert row["n_tokens"] == 0 and row["logprob_sum"] == 0.0
        assert row["avg_neg_logprob"] is None


# ---------------------------------------------------------------------------
# Gopher duplicate-n-gram character coverage
# ---------------------------------------------------------------------------


def _dup_coverage_py(text, n):
    """Naive replay of dup_ngram_coverage's contract (same tokens rule)."""
    import re

    cleaned = re.sub(r"[^a-z0-9']+", " ", (text or "").lower()).strip()
    t = cleaned.split(" ") if cleaned else []
    grams = [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]
    from collections import Counter

    dup = {g for g, c in Counter(grams).items() if c >= 2}
    covered = set()
    for i, g in enumerate(grams):
        if g in dup:
            covered.update(range(i, i + n))
    cov_chars = sum(len(t[p]) for p in covered)
    tot_chars = sum(len(w) for w in t)
    return (
        len(t),
        len(dup),
        cov_chars,
        tot_chars,
        (cov_chars / tot_chars) if tot_chars > 0 else None,
    )


def test_dup_ngram_coverage_hand_cases(spark):
    from merchant_classification_spark.functions.text_analysis import (
        dup_ngram_coverage,
    )

    rows = [
        (1, "a b c d e a b c d e x"),  # one dup 5-gram, covers 10 of 11
        (2, "one two three four five six"),  # no dups
        (3, ""),  # empty -> zero counts, NULL frac
        (4, None),  # null-safe
        (5, "w w w w w w w w"),  # degenerate: everything duplicated
        (6, "a b c d"),  # fewer tokens than n -> no grams
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r
        for r in dup_ngram_coverage(df, "text", "doc_id", n=5).collect()
    }
    for doc_id, text in rows:
        nt, nd, cov, tot, frac = _dup_coverage_py(text, 5)
        r = got[doc_id]
        assert r["n_tokens"] == nt
        assert r["dup_grams"] == nd
        assert r["covered_chars"] == cov
        assert r["total_chars"] == tot
        if frac is None:
            assert r["dup_char_frac"] is None
        else:
            assert r["dup_char_frac"] == frac
    # the overlap rule: doc 1 covers positions 1..10 once each, not 2x5+5
    assert got[1]["covered_chars"] == 10


def test_dup_ngram_coverage_fuzz_vs_python(spark):
    import random

    from merchant_classification_spark.functions.text_analysis import (
        dup_ngram_coverage,
    )

    rng = random.Random(42)
    vocab = ["aa", "b", "ccc", "dddd", "e1", "f'g"]
    rows = []
    for i in range(60):
        L = rng.randrange(0, 30)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(L))))
    for n in (2, 3, 5):
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {
            r["doc_id"]: r
            for r in dup_ngram_coverage(df, "text", "doc_id", n=n).collect()
        }
        for doc_id, text in rows:
            nt, nd, cov, tot, frac = _dup_coverage_py(text, n)
            r = got[doc_id]
            assert (
                r["n_tokens"],
                r["dup_grams"],
                r["covered_chars"],
                r["total_chars"],
            ) == (nt, nd, cov, tot), (doc_id, n, text)
            assert r["dup_char_frac"] == frac


def test_dup_ngram_coverage_rejects_small_n(spark):
    import pytest

    from merchant_classification_spark.functions.text_analysis import (
        dup_ngram_coverage,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        dup_ngram_coverage(df, "text", "doc_id", n=1)
