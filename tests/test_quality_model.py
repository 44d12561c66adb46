"""Model-based quality screen: deterministic fit, bit-exact scoring."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.functions.quality_model import (
    fit_quality_lr,
    quality_logits,
    quality_training_counts,
)

N_BUCKETS = 32


@pytest.fixture(scope="module")
def corpus(spark):
    # curated rows use a distinct "encyclopedic" vocabulary; crawl rows a
    # junk vocabulary — linearly separable by bucket counts
    cur = [
        (i, f"history of region {i % 7} described in the archive volume "
            f"chapter {i % 5} with citations and careful notes", "curated")
        for i in range(40)
    ]
    crw = [
        (100 + i, f"click the free deal now and win the prize of the "
                  f"day {i} buy it at the site for {i % 3} offers", "crawl")
        for i in range(40)
    ]
    return spark.createDataFrame(cur + crw, ["doc_id", "text", "origin"])


@pytest.fixture(scope="module")
def fitted(corpus):
    samples = quality_training_counts(
        corpus, "text", F.col("origin") == "curated", "doc_id",
        n_buckets=N_BUCKETS, sample_per_class=30,
    )
    return fit_quality_lr(samples, N_BUCKETS)


def test_fit_separates_curated_from_crawl(corpus, fitted):
    w, b = fitted
    scored = quality_logits(corpus, w, b, "text", "doc_id")
    joined = {r["doc_id"]: r for r in scored.collect()}
    cur_keep = sum(1 for i in range(40) if joined[i]["keep"])
    crw_keep = sum(1 for i in range(40) if joined[100 + i]["keep"])
    # held-out rows included (the sample used 30/40 per class)
    assert cur_keep >= 38
    assert crw_keep <= 2


def test_fit_is_deterministic(corpus):
    a = quality_training_counts(
        corpus, "text", F.col("origin") == "curated", "doc_id",
        n_buckets=N_BUCKETS, sample_per_class=30,
    )
    b = quality_training_counts(
        corpus.repartition(7), "text", F.col("origin") == "curated",
        "doc_id", n_buckets=N_BUCKETS, sample_per_class=30,
    )
    assert a == b  # content-hash selection ignores layout
    assert fit_quality_lr(a, N_BUCKETS) == fit_quality_lr(b, N_BUCKETS)


def _py_features(text: str) -> list[str]:
    import re

    t = re.sub(r"[^a-z0-9']+", " ", text.lower()).strip()
    toks = t.split(" ") if t else []
    return toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(f: str, n: int) -> int:
    return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % n


def test_scoring_bit_exact_vs_python_replay(corpus, fitted):
    """The Spark fold must equal a left-to-right Python float fold —
    the property the DuckDB oracle relies on."""
    w, b = fitted
    rows = quality_logits(corpus, w, b, "text", "doc_id").collect()
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for r in rows[:20]:
        feats = _py_features(texts[r["doc_id"]])
        acc = 0.0
        for f in feats:
            acc = acc + w[_py_bucket(f, N_BUCKETS)]
        want = acc / len(feats) + b if feats else b
        assert r["quality_logit"] == want, r["doc_id"]
        assert r["n_features"] == len(feats)


def test_empty_doc_scores_bias_never_kept(spark, fitted):
    w, b = fitted
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, None)],
                               ["doc_id", "text"])
    got = {r["doc_id"]: r for r in quality_logits(df, w, b).collect()}
    for i in (1, 2, 3):
        assert got[i]["quality_logit"] == b
        assert not got[i]["keep"]


def test_fit_rejects_bad_input():
    with pytest.raises(ValueError):
        fit_quality_lr([], N_BUCKETS)
    with pytest.raises(ValueError):
        fit_quality_lr([(1, [0] * 4)], 8)


def test_corpus_pipeline_model_gate_funnel(spark, corpus, fitted):
    """The optional gate drops crawl-like docs from the funnel and the
    report reflects it."""
    from merchant_classification_spark.pipelines.corpus import prepare_corpus

    docs = corpus.select("doc_id", "text")
    base_out, base_rep = prepare_corpus(
        docs, min_quality=0.0, min_tokens=1, max_top_token_share=1.0
    )
    gated_out, gated_rep = prepare_corpus(
        docs, min_quality=0.0, min_tokens=1, max_top_token_share=1.0,
        quality_model=fitted,
    )
    assert gated_rep["after_filters"] < base_rep["after_filters"]
    kept_ids = {r["id"] for r in gated_out.select("id").collect()}
    # gate keeps curated-like ids (0..39), drops crawl-like (100..139)
    assert all(i < 100 for i in kept_ids)
    # downstream near-dup ladder also collapses templated curated docs,
    # so only a floor: a healthy curated majority survives end-to-end
    assert len(kept_ids) >= 20


def test_gate_never_passes_featureless_docs_positive_bias(spark, fitted):
    """A positive-bias model must not wave empty/non-tokenizable text
    through the gate: quality_keep_col enforces the same n_features > 0
    conjunct as quality_logits' keep (the bare logit>threshold
    comparison silently kept featureless docs whenever bias > tau)."""
    from merchant_classification_spark.functions.quality_model import (
        quality_keep_col,
        quality_logits,
    )

    w, _ = fitted
    b_pos = 5.0  # forced positive bias: logit alone would pass anything
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "!!! ???"),
         (5, "a real document with plenty of ordinary words inside it")],
        ["doc_id", "text"],
    )
    kept = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", quality_keep_col("text", w, b_pos, 0.0).alias("k")
        ).collect()
    }
    assert not kept[1] and not kept[2] and not kept[3] and not kept[4]
    # parity with quality_logits' keep on every row
    ql = {
        r["doc_id"]: r["keep"]
        for r in quality_logits(df, w, b_pos).collect()
    }
    assert kept == ql


def test_quality_gate_works_on_streams(spark, corpus, fitted, tmp_path):
    """The literal-weights logit is a stateless map-only projection, so
    it applies unchanged to a stream — and batch/stream results over the
    same rows are identical (the streaming twin discipline)."""
    import uuid

    from merchant_classification_spark.functions.quality_model import (
        quality_logit_col,
    )

    w, b = fitted
    path = str(tmp_path / "qsrc")
    corpus.select("doc_id", "text").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    batch = spark.read.parquet(path).select(
        "doc_id", quality_logit_col("text", w, b).alias("quality_logit")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(path)
        .select(
            "doc_id", quality_logit_col("text", w, b).alias("quality_logit")
        )
    )
    assert stream.isStreaming
    name = f"qgate_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / f"ckpt-{uuid.uuid4().hex}")
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want  # bit-exact: same literal weights, same fold
