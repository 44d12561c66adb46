"""Does a corpus-fitted BPE feature family move the quality plateau?

Round-5 closed the 0.950/0.871 plateau with the caveat "revisit only if
a new feature family (e.g. real BPE) moves it for free" (README status).
This probe answers it: same corpus, same BEST_CONFIG, three variants —

  * baseline           — word n-grams + fasttext char 3-5-grams
  * +bpe               — baseline plus fitted-BPE subword segments
                         (functions/bpe.bpe_segment via the round-6
                         extra_tokens_col hook; fit on TRAIN only)
  * bpe_instead_chars  — word n-grams + BPE segments, char grams off
  * +unigram           — baseline plus unigram-LM (SentencePiece-style)
                         pieces (functions/unigram_lm, round 8; fit on
                         TRAIN only)
  * unigram_instead_chars — word n-grams + unigram pieces, chars off

Prints one JSON line per variant.  Usage:
    python tools/bpe_quality_probe.py [n_classes] [rows_per_class_max] [only,...]
(the third arg restricts to a comma-separated variant subset, so a new
family can be measured without re-running the committed baselines)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from quality_report import BEST_CONFIG, synth_corpus  # noqa: E402

from merchant_classification_spark.functions.bpe import (  # noqa: E402
    bpe_segment,
    corpus_word_freq,
    fit_bpe,
)
from merchant_classification_spark.ml.classifier import (  # noqa: E402
    NarrativeClassifier,
)
from merchant_classification_spark.ml.evaluate import (  # noqa: E402
    evaluate_per_class,
)
from merchant_classification_spark.pipelines.etl import etl_pipeline  # noqa: E402
from merchant_classification_spark.session import build_session  # noqa: E402

BPE_MERGES = 200
BPE_VOCAB = 8192


def main() -> None:
    n_classes = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    max_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = build_session(app_name="bpe-quality-probe")
    raw = spark.createDataFrame(
        synth_corpus(n_classes, max_rows),
        ["tr_merchant", "tr_description", "tr_amount"],
    ).repartition(32)
    out = etl_pipeline(raw, sample_size=5000, count_threshold=50, seed=7)
    train = out["train"].localCheckpoint()
    test = out["test"].localCheckpoint()

    # fit the subword vocab on TRAIN text only (no test leakage), then
    # attach the fitted segmentation to both splits
    text = "tr_description_clean"
    wf = corpus_word_freq(train, text, BPE_VOCAB)
    merges, _ = fit_bpe(wf, BPE_MERGES)

    def with_bpe(df):
        segs = bpe_segment(spark, df, merges, wf, text_col=text, id_col="tr_id")
        return df.join(
            segs.select(
                segs.doc_id.alias("tr_id"), segs.bpe_tokens.alias("_bpe")
            ),
            "tr_id",
        )

    from pyspark.sql import functions as F

    train_id = train.withColumn("tr_id", F.monotonically_increasing_id())
    test_id = test.withColumn("tr_id", F.monotonically_increasing_id())
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    def wanted(*names):
        return only is None or any(n in only for n in names)

    if wanted("+bpe", "bpe_instead_chars"):
        train_b = with_bpe(train_id).localCheckpoint()
        test_b = with_bpe(test_id).localCheckpoint()
    else:
        train_b = test_b = None

    from merchant_classification_spark.functions.unigram_lm import (
        fit_unigram_lm,
        unigram_segment,
    )

    uni_lp = None
    if wanted("+unigram", "unigram_instead_chars"):
        uni_lp, _ = fit_unigram_lm(
            wf, vocab_size=4096, rounds=4, max_piece_len=8
        )

    def with_uni(df):
        segs = unigram_segment(
            spark, df, uni_lp, wf, text_col=text, id_col="tr_id",
            max_piece_len=8,
        )
        return df.join(
            segs.select(
                segs.doc_id.alias("tr_id"), segs.uni_tokens.alias("_uni")
            ),
            "tr_id",
        )

    if uni_lp is not None:
        train_u = with_uni(train_id).localCheckpoint()
        test_u = with_uni(test_id).localCheckpoint()
    else:
        train_u = test_u = None

    variants = {
        "baseline": (train, test, {}),
        "+bpe": (train_b, test_b, {"extra_tokens_col": "_bpe"}),
        "bpe_instead_chars": (
            train_b,
            test_b,
            {
                "extra_tokens_col": "_bpe",
                "char_ngram_min": 0,
                "char_ngram_max": 0,
            },
        ),
        "+unigram": (train_u, test_u, {"extra_tokens_col": "_uni"}),
        "unigram_instead_chars": (
            train_u,
            test_u,
            {
                "extra_tokens_col": "_uni",
                "char_ngram_min": 0,
                "char_ngram_max": 0,
            },
        ),
    }
    for name, (tr, te, over) in variants.items():
        if not wanted(name):
            continue
        clf = NarrativeClassifier(**{**BEST_CONFIG, **over})
        model = clf.fit(tr)
        _, summary = evaluate_per_class(
            model.transform(te), "tr_merchant", "pr_merchant"
        )
        summary["variant"] = name
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
