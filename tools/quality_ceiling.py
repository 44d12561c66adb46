"""Bayes-oracle ceiling for the quality harness (round-11 verdict item
#4): the ML gap to the reference's published ~0.97 avg / ~0.90 q05
(02_merchcat_ml.py:328, BASELINE.md) has been flat at ~0.950/0.871
since round 7, and tools/quality_sweep.py's axes all plateau there.
This tool settles WHETHER the residual gap is modelling headroom or
the synthetic corpus's designed-in noise: it scores a GENERATOR-AWARE
oracle predictor on the identical ETL'd test split — a predictor no
fitted model can beat in expectation, because it resolves every
mention mechanism the generator has (full mention, 4-char truncation,
first-word-only, none) with train-split priors for the ambiguous
tiers — and decomposes its errors by mechanism.

The oracle consumes the SAME cleaned text column the classifier
trains on (tr_description_clean, via the identical pure-Python
cleaning kernel for its merchant forms), so the ceiling bounds what
THIS pipeline's feature view can express, not an idealized one.

Usage: python tools/quality_ceiling.py [n_classes] [rows_per_class_max]
Prints one JSON line: oracle avg/q05 + per-mechanism row shares and
accuracies + the fitted BEST_CONFIG numbers for contrast.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from merchant_classification_spark.pipelines.etl import etl_pipeline
from merchant_classification_spark.session import build_session
from tools.quality_report import synth_corpus


def _forms(merchants: list[str]):
    full = {m: m for m in merchants}
    trunc = {m: " ".join(w[:4] for w in m.split()) for m in merchants}
    first = {}
    for m in merchants:
        first.setdefault(m.split()[0], []).append(m)
    return full, trunc, first


def oracle_predict(
    text: str,
    merchants: list[str],
    prior: dict[str, int],
    forms,
) -> tuple[str, str]:
    """(prediction, mechanism-bucket) for one cleaned narrative."""
    full, trunc, first = forms
    t = text or ""
    best = None
    for m in merchants:  # full mention: longest form wins, then prior
        f = full[m]
        if t.startswith(f + " ") or t == f:
            key = (len(f), prior.get(m, 0), m)
            if best is None or key > best[0]:
                best = (key, m)
    if best is not None:
        return best[1], "full"
    for m in merchants:
        f = trunc[m]
        if t.startswith(f + " ") or t == f:
            key = (len(f), prior.get(m, 0), m)
            if best is None or key > best[0]:
                best = (key, m)
    if best is not None:
        return best[1], "truncated"
    tok0 = t.split(" ", 1)[0] if t else ""
    if tok0 in first:
        cands = first[tok0]
        return max(cands, key=lambda m: (prior.get(m, 0), m)), "first_word"
    return max(merchants, key=lambda m: (prior.get(m, 0), m)), "no_mention"


def main() -> None:
    n_classes = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    max_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = build_session(app_name="quality-ceiling")
    raw = spark.createDataFrame(
        synth_corpus(n_classes, max_rows),
        ["tr_merchant", "tr_description", "tr_amount"],
    ).repartition(32)
    out = etl_pipeline(raw, sample_size=5000, count_threshold=50, seed=7)
    train, test = out["train"], out["test"]
    prior = {
        r["tr_merchant"]: int(r["count"])
        for r in train.groupBy("tr_merchant").count().collect()
    }
    merchants = sorted(prior)
    forms = _forms(merchants)

    rows = test.select("tr_merchant", "tr_description_clean").collect()
    scored = []
    for r in rows:
        pred, bucket = oracle_predict(
            r["tr_description_clean"], merchants, prior, forms
        )
        scored.append((r["tr_merchant"], pred, bucket))

    # identical metric path to the fitted model's report
    from merchant_classification_spark.ml.evaluate import evaluate_per_class

    sdf = spark.createDataFrame(
        scored, ["tr_merchant", "pr_merchant", "bucket"]
    )
    _, summary = evaluate_per_class(sdf, "tr_merchant", "pr_merchant")
    buckets = {}
    for label, pred, bucket in scored:
        n, c = buckets.get(bucket, (0, 0))
        buckets[bucket] = (n + 1, c + (1 if pred == label else 0))
    print(
        json.dumps(
            {
                "metric": "quality_bayes_ceiling",
                "n_test_rows": len(scored),
                "oracle_avg_acc": round(summary["avg_acc"], 4),
                "oracle_q_05": round(summary["q_05"], 4),
                "buckets": {
                    b: {
                        "share": round(n / len(scored), 4),
                        "acc": round(c / n, 4),
                    }
                    for b, (n, c) in sorted(buckets.items())
                },
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
