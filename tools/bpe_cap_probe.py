"""Measure the BPE vocabulary cap: token-mass coverage + OOV error.

Round-7 items #2/#5: the module docstring used to ASSERT a Zipf coverage
claim ("a 100k cap covers >>99% of token mass") and treat the OOV
char-granularity approximation as qualitatively bounded. This tool
replaces both with committed numbers (results land in SCALING.md under
"BPE cap coverage"):

  * **cap coverage** — at a given sf dir, the fraction of all word
    OCCURRENCES covered by the top-`cap` vocabulary, for a ladder of
    caps. One full word-frequency aggregate (collected — fine at these
    scales; the graded path never does this).
  * **two-level parity** — corpus_word_freq_two_level vs the global fit
    at the graded cap (must be identical).
  * **OOV count error** — n_bpe_tokens under the graded capped scoring
    (OOV words at character granularity) vs a full `encode_word` replay
    over EVERY distinct word (merges applied to tail words too). The
    capped path can only overcount (merges never increase token count),
    so the number reported is the relative overcount of total corpus
    BPE tokens.

Usage: python tools/bpe_cap_probe.py [sf_dir] [--caps 1024,4096,...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from merchant_classification_spark.functions.bpe import (  # noqa: E402
    corpus_word_freq,
    corpus_word_freq_two_level,
    encode_word,
    fit_bpe,
)
from merchant_classification_spark.functions.text_analysis import (  # noqa: E402
    tokens,
)
from merchant_classification_spark.session import build_session  # noqa: E402

BPE_MERGES = 50
BPE_MAX_VOCAB = 4096
BPE_MIN_PAIR_FREQ = 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--caps", default="1024,4096,16384,65536")
    ap.add_argument(
        "--fit-cap",
        type=int,
        default=BPE_MAX_VOCAB,
        help="vocabulary cap for the fit used in the OOV replay "
        "(sub-vocabulary caps put real words OOV, measuring the "
        "char-granularity overcount in a non-degenerate regime)",
    )
    args = ap.parse_args()
    caps = [int(c) for c in args.caps.split(",")]

    from pyspark.sql import functions as F

    spark = build_session(app_name="bpe-cap-probe", shuffle_partitions=32)
    from merchant_classification_spark.sources import load_table

    docs = load_table(spark, args.sf_dir, "documents")

    # full word-frequency table (uncapped) — the ground truth
    t0 = time.time()
    full = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .collect()
    )
    freqs = [(r["word"], int(r["freq"])) for r in full]
    total_occ = sum(f for _, f in freqs)
    n_distinct = len(freqs)
    out: dict = {
        "sf_dir": args.sf_dir,
        "distinct_words": n_distinct,
        "total_word_occurrences": total_occ,
        "coverage": {},
    }
    running = 0
    cap_marks = sorted(caps)
    ci = 0
    for i, (_, f) in enumerate(freqs, 1):
        running += f
        while ci < len(cap_marks) and i == cap_marks[ci]:
            out["coverage"][str(cap_marks[ci])] = round(running / total_occ, 6)
            ci += 1
        if ci >= len(cap_marks):
            break
    for c in cap_marks:
        if str(c) not in out["coverage"]:
            out["coverage"][str(c)] = 1.0  # cap exceeds distinct words
    out["freq_agg_sec"] = round(time.time() - t0, 2)

    # two-level parity at the fit cap
    t0 = time.time()
    g = corpus_word_freq(docs, "text", args.fit_cap)
    two = corpus_word_freq_two_level(docs, "text", args.fit_cap)
    out["two_level_identical"] = g == two
    out["two_level_sec"] = round(time.time() - t0, 2)
    out["fit_cap"] = args.fit_cap

    # OOV overcount: capped scoring vs full encode_word replay
    t0 = time.time()
    merges, wnt = fit_bpe(g, BPE_MERGES, BPE_MIN_PAIR_FREQ)
    capped_total = 0
    true_total = 0
    oov_occ = 0
    for w, f in freqs:
        if w in wnt:
            capped_total += wnt[w] * f
            true_total += wnt[w] * f
        else:
            capped_total += len(w) * f
            true_total += len(encode_word(w, merges)) * f
            oov_occ += f
    out["oov_occurrence_share"] = round(oov_occ / total_occ, 6)
    out["bpe_tokens_capped"] = capped_total
    out["bpe_tokens_full_replay"] = true_total
    out["oov_relative_overcount"] = round(
        (capped_total - true_total) / true_total, 6
    )
    out["replay_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
