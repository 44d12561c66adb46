"""Model-based language ID (functions/lang_model.py): deterministic
fit, bit-exact Python replay of scoring, and agreement with the
stopword heuristic on a real-language corpus."""

import re

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.functions.lang_model import (
    char_ngram_features,
    fit_lang_softmax,
    lang_model_scores,
    lang_training_counts,
)

N_BUCKETS = 64

_SENTS = {
    "en": [
        "the cat sat on the mat and it was happy for a while",
        "it is a truth that the weather in the north is cold",
        "she went to the market and bought bread for the family",
        "the quick brown fox jumps over the lazy dog in the field",
        "we believe that the results of the study are important",
    ],
    "es": [
        "el perro corre por la calle y los vecinos lo miran",
        "la casa de mi abuela tiene un jardin con muchas flores",
        "los estudiantes leen un libro en la biblioteca por la tarde",
        "que bonita es la ciudad cuando el sol se pone en el mar",
        "una persona amable ayuda a los demas sin pedir nada",
    ],
    "fr": [
        "le chien dort sous la table et les enfants jouent dehors",
        "la maison de mon ami est pres du parc et des magasins",
        "les eleves lisent des livres dans une salle de la mairie",
        "un jour le soleil se leve sur les montagnes du sud",
        "elle achete du pain et des fruits pour le repas du soir",
    ],
    "de": [
        "der hund lauft durch die strasse und die kinder lachen laut",
        "das haus von meiner mutter ist alt und steht in der stadt",
        "die schuler lesen ein buch mit den lehrern in der schule",
        "und dann geht die sonne uber den bergen im norden auf",
        "ist das nicht schon wenn der regen mit dem wind zu uns kommt",
    ],
}


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    i = 0
    for lang, sents in _SENTS.items():
        for rep in range(6):
            for s in sents:
                rows.append((i, lang, f"{s} nummer {i} item{rep}"))
                i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


@pytest.fixture(scope="module")
def fitted(corpus):
    samples = lang_training_counts(
        corpus, "text", F.col("lang"), "doc_id",
        n_buckets=N_BUCKETS, sample_per_class=20,
    )
    classes = sorted(_SENTS)
    w, b = fit_lang_softmax(samples, classes, N_BUCKETS, iters=150, step=1.0)
    return classes, w, b


def _py_tokens(s):
    c = re.sub(r"[^a-z0-9']+", " ", (s or "").lower()).strip()
    return c.split(" ") if c else []


def _py_grams(s):
    out = []
    for t in _py_tokens(s):
        w = f"^{t}$"
        out += [w[i:i + 3] for i in range(len(t))]
    return out


def _py_bucket(g, n):
    from merchant_classification_spark.functions.lang_model import (
        GRAM_POLY_B1,
        GRAM_POLY_B2,
    )

    return (
        ord(g[0]) * GRAM_POLY_B2 + ord(g[1]) * GRAM_POLY_B1 + ord(g[2])
    ) % n


def test_char_ngram_features_match_python(spark, corpus):
    got = corpus.limit(20).select(
        "doc_id", "text", char_ngram_features("text").alias("g")
    ).collect()
    for r in got:
        assert list(r["g"]) == _py_grams(r["text"]), r["doc_id"]


def test_char_ngram_buckets_match_python(spark, corpus):
    from merchant_classification_spark.functions.lang_model import (
        char_ngram_buckets,
    )

    got = corpus.limit(20).select(
        "doc_id", "text", char_ngram_buckets("text", N_BUCKETS).alias("b")
    ).collect()
    for r in got:
        want = [_py_bucket(g, N_BUCKETS) for g in _py_grams(r["text"])]
        assert list(r["b"]) == want, r["doc_id"]


def test_fit_is_deterministic(corpus):
    samples = lang_training_counts(
        corpus, "text", F.col("lang"), "doc_id",
        n_buckets=N_BUCKETS, sample_per_class=10,
    )
    classes = sorted(_SENTS)
    w1, b1 = fit_lang_softmax(samples, classes, N_BUCKETS, iters=30)
    w2, b2 = fit_lang_softmax(samples, classes, N_BUCKETS, iters=30)
    assert w1 == w2 and b1 == b2


def test_training_counts_are_ordered_and_bounded(corpus):
    samples = lang_training_counts(
        corpus, "text", F.col("lang"), "doc_id",
        n_buckets=N_BUCKETS, sample_per_class=7,
    )
    labels = [y for y, _ in samples]
    assert labels == sorted(labels)
    assert all(labels.count(c) == 7 for c in _SENTS)
    assert all(len(v) == N_BUCKETS for _, v in samples)


def test_scores_bit_exact_vs_python_replay(spark, corpus, fitted):
    classes, w, b = fitted
    out = lang_model_scores(corpus, classes, w, b, "text", "doc_id")
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for r in out.collect():
        grams = _py_grams(texts[r["doc_id"]])
        n = len(grams)
        assert r["n_features"] == n
        if n == 0:
            assert r["lang_model"] == "und"
            continue
        logits = []
        for k, c in enumerate(classes):
            acc = 0.0
            for g in grams:
                acc = acc + w[k][_py_bucket(g, N_BUCKETS)]
            logits.append(acc / n + b[k])
            assert r[f"logit_{c}"] == logits[k], (r["doc_id"], c)
        best, best_v = classes[0], logits[0]
        for k in range(1, len(classes)):
            if logits[k] > best_v:
                best, best_v = classes[k], logits[k]
        assert r["lang_model"] == best, r["doc_id"]


def test_model_learns_real_languages(spark, corpus, fitted):
    classes, w, b = fitted
    out = lang_model_scores(corpus, classes, w, b, "text", "doc_id")
    joined = out.join(corpus.select("doc_id", "lang"), "doc_id")
    acc = joined.where(F.col("lang_model") == F.col("lang")).count() / corpus.count()
    assert acc >= 0.95, acc


def test_agreement_with_stopword_heuristic(spark, corpus):
    """Self-training bootstrap: labels from the heuristic, agreement
    measured against it on the same real-language corpus — the model
    must reproduce the heuristic's confident decisions from char-grams
    alone (no stopword list at scoring time)."""
    from merchant_classification_spark.functions.text_analysis import lang_id

    labeled = corpus.withColumn("hlang", lang_id("text"))
    train = labeled.where(F.col("hlang") != "und")
    present = sorted(
        r["hlang"] for r in train.select("hlang").distinct().collect()
    )
    assert len(present) >= 3  # the crafted corpus covers real languages
    samples = lang_training_counts(
        train, "text", F.col("hlang"), "doc_id",
        n_buckets=N_BUCKETS, sample_per_class=20,
    )
    w, b = fit_lang_softmax(samples, present, N_BUCKETS, iters=60)
    scored = lang_model_scores(train, present, w, b, "text", "doc_id")
    both = scored.join(labeled.select("doc_id", "hlang"), "doc_id")
    agree = both.where(F.col("lang_model") == F.col("hlang")).count()
    assert agree / train.count() >= 0.9


def test_featureless_docs_are_und(spark, fitted):
    classes, w, b = fitted
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "!!! ...")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in
           lang_model_scores(df, classes, w, b).collect()}
    for i in (1, 2, 3):
        assert got[i]["n_features"] == 0
        assert got[i]["lang_model"] == "und"
        assert got[i][f"logit_{classes[0]}"] is None


def test_fit_rejects_bad_input():
    with pytest.raises(ValueError):
        fit_lang_softmax([], ["a"], 4)
    with pytest.raises(ValueError):
        fit_lang_softmax([("x", [0] * 4)], ["a", "b"], 4)
    with pytest.raises(ValueError):
        fit_lang_softmax([("a", [0] * 3)], ["a"], 4)
    with pytest.raises(ValueError):
        fit_lang_softmax([("a", [0] * 4)], ["a", "a"], 4)
