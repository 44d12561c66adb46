"""BASELINE-parity quality report.

Reproduces the reference's headline experiment shape end-to-end at a
meaningful class count: ~100 merchant classes with golden-style narrative
noise (dates, prices, card masks, punctuation), Zipf-skewed class sizes →
full ETL (clean → format → stratified sample → 90/10 split) → train the
MLlib fasttext-parity classifier → evaluate per-class accuracy on the
held-out split. Prints one JSON line with the reference's metric names
(BASELINE.md: avg accuracy ~0.97, q_05 ~0.90).

    python tools/quality_report.py [n_classes] [rows_per_class_max]
"""

from __future__ import annotations

import json
import random
import sys

sys.path.insert(0, ".")

from merchant_classification_spark.ml.classifier import NarrativeClassifier
from merchant_classification_spark.ml.evaluate import evaluate_per_class
from merchant_classification_spark.pipelines.etl import etl_pipeline
from merchant_classification_spark.session import build_session

NOISE = [
    "cd {n4}",
    "deb",
    "{d}sep19",
    "{d}oct21",
    "2021-0{m}-1{d1}",
    "12.{c2} gbp",
    "1{d1}:3{d1}pm",
    "xxxx {n4}",
    "(ref {n4})",
    "paypal *",
    "@",
    "a&b",
]

WORDS = (
    "star north coffee market fresh city home direct prime metro express "
    "united general trading retail food media tech energy store group"
).split()


def synth_corpus(n_classes: int, max_rows: int, seed: int = 17):
    rng = random.Random(seed)
    merchants = []
    while len(set(merchants)) < n_classes:
        merchants.append(
            f"{rng.choice(WORDS)} {rng.choice(WORDS)} {rng.randint(1, 99)}"
        )
    merchants = sorted(set(merchants))[:n_classes]
    rows = []
    for rank, m in enumerate(merchants):
        # Zipf-ish sizes straddling the reference's thresholds (50..max)
        size = max(55, int(max_rows / (1 + rank * 0.15)))
        for _ in range(size):
            toks = [m]
            for _ in range(rng.randint(2, 5)):
                t = rng.choice(NOISE)
                toks.append(
                    t.format(
                        n4=rng.randint(1000, 9999),
                        d=rng.randint(10, 28),
                        d1=rng.randint(0, 9),
                        m=rng.randint(1, 9),
                        c2=rng.randint(10, 99),
                    )
                )
            rng.shuffle(toks[1:])
            rows.append((m, " ".join(toks), float(rng.randint(1, 300))))
    rng.shuffle(rows)
    return rows


def main() -> None:
    n_classes = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    max_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = build_session(app_name="quality-report")
    raw = spark.createDataFrame(
        synth_corpus(n_classes, max_rows),
        ["tr_merchant", "tr_description", "tr_amount"],
    ).repartition(32)
    out = etl_pipeline(raw, sample_size=5000, count_threshold=50, seed=7)
    # hash dim sized to the class count: the multinomial gradient is a
    # dense n_classes x num_features matrix PER aggregation task — 2^16
    # keeps it ~50 MB at 100 classes (2^21 fasttext-parity dims need a
    # cluster-sized heap, not a laptop's)
    clf = NarrativeClassifier(ngram_max=2, num_features=1 << 16, max_iter=40)
    model = clf.fit(out["train"])
    _, summary = evaluate_per_class(
        model.transform(out["test"]), "tr_merchant", "pr_merchant"
    )
    summary["n_classes"] = n_classes
    summary["n_train"] = out["train"].count()
    summary["n_test"] = out["test"].count()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
