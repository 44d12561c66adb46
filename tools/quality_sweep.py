"""Hyper-parameter sweep over the quality-report harness.

Builds the quality corpus + ETL ONCE (same generator and split as
tools/quality_report.py), then fits/evaluates a list of classifier
configs, printing one JSON line per config — the evidence behind
quality_report.BEST_CONFIG. The sweep axes are the reference's fasttext
tuning space (02_merchcat_ml.py:305-323): wordNgrams → ngram_max,
bucket → num_features, epochs → max_iter, lr/complexity → reg_param,
minn/maxn → char_ngram_min/max.

    python tools/quality_sweep.py [n_classes] [rows_per_class_max]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from merchant_classification_spark.pipelines.etl import etl_pipeline
from merchant_classification_spark.session import build_session
from tools.quality_report import _fit_eval, synth_corpus

#: round-5 measured points (full harness corpus, 100 classes):
#:   r4-baseline (word 1-2-grams, 2^16, 40it)      -> 0.941 avg / 0.867 q05
#:   char35-17 (BEST_CONFIG, word+char3-5, 2^17)   -> 0.9495 avg / 0.871 q05
#:   char35-17-80it                                -> 0.9397 / 0.8653 (80
#:     unregularized epochs OVERFIT the label noise; 40 is the knee)
#:   char25-17 (minn=2)                            -> 0.9456 / 0.871
#:   word3-char35-17 (word trigrams added)         -> 0.9463 / 0.8667
#:   char35-17-reg (60it, reg 1e-5)                -> 0.9485 / 0.871
#:   char36-17 (maxn=6)                            -> 0.9475 / 0.871
#: every axis plateaus at ~0.95 avg / ~0.87 q05: the residual gap to the
#: published ~0.97/~0.90 is this corpus's deliberately harsher
#: degradation mix, not a modelling shortfall the tuning axes can
#: reach. Round 11 MEASURED the ceiling (tools/quality_ceiling.py): a
#: generator-aware Bayes-oracle on the identical test split scores
#: 0.9573 avg / 0.90 q05 (mention-free rows ~0 acc, first-word rows
#: 0.15, label noise 0.0069 off the full-mention bucket), so
#: BEST_CONFIG's 0.950 sits 0.7pp under Bayes-optimal.
CONFIGS: list[dict] = [
    {"name": "char35-17-80it", "ngram_max": 2, "num_features": 1 << 17,
     "max_iter": 80, "char_ngram_min": 3, "char_ngram_max": 5},
    {"name": "char25-17", "ngram_max": 2, "num_features": 1 << 17,
     "max_iter": 40, "char_ngram_min": 2, "char_ngram_max": 5},
    {"name": "word3-char35-17", "ngram_max": 3, "num_features": 1 << 17,
     "max_iter": 40, "char_ngram_min": 3, "char_ngram_max": 5},
    {"name": "char35-17-reg", "ngram_max": 2, "num_features": 1 << 17,
     "max_iter": 60, "reg_param": 1e-5,
     "char_ngram_min": 3, "char_ngram_max": 5},
    {"name": "char36-17", "ngram_max": 2, "num_features": 1 << 17,
     "max_iter": 40, "char_ngram_min": 3, "char_ngram_max": 6},
]


def main() -> None:
    n_classes = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    max_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = build_session(app_name="quality-sweep")
    raw = spark.createDataFrame(
        synth_corpus(n_classes, max_rows),
        ["tr_merchant", "tr_description", "tr_amount"],
    ).repartition(32)
    out = etl_pipeline(raw, sample_size=5000, count_threshold=50, seed=7)
    train = out["train"].localCheckpoint()
    test = out["test"].localCheckpoint()
    best = None
    for cfg in CONFIGS:
        cfg = dict(cfg)
        name = cfg.pop("name")
        t0 = time.perf_counter()
        summary = _fit_eval(train, test, **cfg)
        rec = {
            "config": name,
            "avg_acc": round(summary["avg_acc"], 4),
            "q_05": round(summary["q_05"], 4),
            "fit_sec": round(time.perf_counter() - t0, 1),
            **cfg,
        }
        print(json.dumps(rec), flush=True)
        if best is None or rec["avg_acc"] > best["avg_acc"]:
            best = rec
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
