"""Unigram-LM tokenizer (functions/unigram_lm.py): deterministic fit,
Viterbi segmentation properties, and Spark↔Python parity."""

import re

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.functions.unigram_lm import (
    fit_unigram_lm,
    unigram_segment,
    unigram_token_counts,
    viterbi_encode,
)

WF = {
    "international": 40,
    "internet": 60,
    "interval": 25,
    "nation": 80,
    "national": 55,
    "nations": 30,
    "station": 70,
    "rational": 20,
    "ratio": 45,
    "the": 500,
    "a": 300,
    "cat": 90,
    "cats": 40,
    "concatenation": 10,
}


@pytest.fixture(scope="module")
def fitted():
    return fit_unigram_lm(WF, vocab_size=24, rounds=4, max_piece_len=6)


def test_fit_is_deterministic():
    a = fit_unigram_lm(WF, vocab_size=24, rounds=4)
    b = fit_unigram_lm(WF, vocab_size=24, rounds=4)
    assert a == b
    # insertion-order invariance: the fit sorts internally
    c = fit_unigram_lm(dict(reversed(list(WF.items()))), vocab_size=24, rounds=4)
    assert a == c


def test_viterbi_segments_are_lossless_and_counted(fitted):
    lp, wnp = fitted
    for w in WF:
        segs = viterbi_encode(w, lp, 6)
        assert "".join(segs) == w
        assert all(p in lp for p in segs)
        assert wnp[w] == len(segs)


def test_viterbi_prefers_high_probability_pieces(fitted):
    lp, _ = fitted
    # frequent multi-char pieces exist (the point of the fit): common
    # morphemes like 'nation'/'the'/'cat' should survive pruning and
    # beat character splits
    multi = [p for p in lp if len(p) > 1]
    assert len(multi) >= 8
    assert len(viterbi_encode("nation", lp, 6)) < len("nation")


def test_viterbi_picks_max_likelihood_split():
    lp = {"ab": -1.0, "a": -2.0, "b": -2.0, "c": -5.0, "abc": -10.0}
    # 'ab'+'c' = -6.0 beats 'abc' (-10) and 'a'+'b'+'c' (-9)
    assert viterbi_encode("abc", lp, 6) == ["ab", "c"]
    with pytest.raises(ValueError):
        viterbi_encode("abd", lp, 6)  # 'd' uncovered


def test_chars_always_retained():
    lp, _ = fit_unigram_lm(WF, vocab_size=2, rounds=3)  # brutal cap
    chars = {c for w in WF for c in w}
    assert chars <= set(lp)  # coverage survives any cap
    for w in WF:
        assert "".join(viterbi_encode(w, lp, 6)) == w


def test_fit_rejects_bad_input():
    with pytest.raises(ValueError):
        fit_unigram_lm({}, 8)
    with pytest.raises(ValueError):
        fit_unigram_lm({"": 3}, 8)
    with pytest.raises(ValueError):
        fit_unigram_lm({"ok": 0}, 8)


def _py_tokens(s):
    c = re.sub(r"[^a-z0-9']+", " ", (s or "").lower()).strip()
    return c.split(" ") if c else []


def test_segment_matches_naive_python_encoder(spark, fitted):
    lp, _ = fitted
    docs = [
        (1, "the cat sat on the international station"),
        (2, "internet nations DEBATE the rational ratio!"),
        (3, "concatenation of cats and zebras"),  # OOV words char-split
        (4, ""),
        (5, None),
        (6, "xyzzy"),  # fully OOV
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (list(r["uni_tokens"]), r["n_uni_tokens"])
        for r in unigram_segment(spark, df, lp, WF).collect()
    }
    for i, text in docs:
        want = []
        for w in _py_tokens(text):
            want += viterbi_encode(w, lp, 6) if w in WF else list(w)
        assert got[i] == (want, len(want)), i


def test_token_counts_match_segments(spark, fitted):
    lp, wnp = fitted
    docs = [
        (1, "the cat sat on the international station"),
        (2, "concatenation of cats and zebras"),
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    seg = {
        r["doc_id"]: r["n_uni_tokens"]
        for r in unigram_segment(spark, df, lp, WF).collect()
    }
    cnt = {
        r["doc_id"]: (r["n_words"], r["n_uni_tokens"], r["n_oov"])
        for r in unigram_token_counts(spark, df, wnp).collect()
    }
    for i, text in docs:
        toks = _py_tokens(text)
        assert cnt[i][0] == len(toks)
        assert cnt[i][1] == seg[i]
        assert cnt[i][2] == sum(1 for w in toks if w not in WF)


def test_em_rounds_do_not_hurt_corpus_likelihood():
    # hard-EM on the fixed candidate set: total Viterbi log-likelihood
    # of the corpus should not degrade from round 1 to the final round
    def ll(lp):
        return sum(
            f * sum(lp[p] for p in viterbi_encode(w, lp, 6))
            for w, f in WF.items()
        )

    lp1, _ = fit_unigram_lm(WF, vocab_size=24, rounds=1)
    lp4, _ = fit_unigram_lm(WF, vocab_size=24, rounds=4)
    assert ll(lp4) >= ll(lp1) - 1e-9
