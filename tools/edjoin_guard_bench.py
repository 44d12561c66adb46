"""Measure the Ed-Join adversarial auto-guard (VERDICT r5 item #4).

Rebuilds the SCALING.md "Adversarial bound" input shape — fixed-width
keys whose long digit region is position-aligned on a shared 10-char
alphabet (the sf1 aligned-serial case that measured 349 s with gram-only
keys and 74-87 s banded) — and times `edit_distance_pairs` with
`auto_guard` off (q=2, the documented candidate-quadratic plan) vs on
(the density probe escalates q). Also confirms the guard is a no-op on
benign input: `edjoin_autotune` must return the base q on the sf0.1
customer names, whose run therefore executes an unchanged plan.

Usage: python tools/edjoin_guard_bench.py [n_keys] [max_distance]
Prints one JSON line; paste the numbers into SCALING.md.
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from merchant_classification_spark.operators.dedup import (  # noqa: E402
    edit_distance_pairs,
    edjoin_autotune,
)
from merchant_classification_spark.session import build_session  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = build_session(app_name="edjoin-guard-bench")

    rnd = random.Random(11)
    rows = [
        (i, "ID" + "".join(rnd.choice("0123456789") for _ in range(14)))
        for i in range(n)
    ]
    adv = spark.createDataFrame(rows, "doc_id long, s string").repartition(32)
    adv.persist().count()

    q_chosen = edjoin_autotune(adv, "doc_id", "s", k, q=2)

    def run(auto_guard: bool) -> tuple[float, int]:
        t0 = time.perf_counter()
        out = edit_distance_pairs(
            adv, "doc_id", "s", max_distance=k, auto_guard=auto_guard
        )
        c = out.count()
        return round(time.perf_counter() - t0, 1), c

    guarded_s, guarded_n = run(True)
    unguarded_s, unguarded_n = run(False)

    cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    benign_q = edjoin_autotune(cust, "c_custkey", "c_name", k, q=2)

    print(
        json.dumps(
            {
                "n_keys": n,
                "max_distance": k,
                "q_chosen": q_chosen,
                "guarded_sec": guarded_s,
                "unguarded_sec": unguarded_s,
                "pairs_guarded": guarded_n,
                "pairs_unguarded": unguarded_n,
                "outputs_match": guarded_n == unguarded_n,
                "benign_q": benign_q,
            }
        )
    )


if __name__ == "__main__":
    main()
