"""Interleaved A/B: parsed-array literal (old) vs _folded_double_lit
from_json constant (new) on the ANN members — min of N alternated reps
in ONE session (cross-session absolutes drift).

Usage: python tools/ab_folded_lit.py [member ...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
import merchant_classification_spark.operators.similarity as sim
from merchant_classification_spark.session import build_session

REPS = int(os.environ.get("AB_REPS", "4"))
DEFAULT = [
    "ann_lsh",
    "ann_pq",
    "ann_ivf",
    "semantic_dedup",
    "embedding_neardup_lsh",
    "diversity_sample",
]

NEW = sim._folded_double_lit


def old_form(nested, depth):
    def render(x) -> str:
        if isinstance(x, (list, tuple)):
            return "array(" + ",".join(render(y) for y in x) + ")"
        return f"{x!r}D"

    return F.expr(render(nested))


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT
    spark = build_session(app_name="ab-folded-lit")

    def run(name, variant):
        sim._folded_double_lit = old_form if variant == "old" else NEW
        t0 = time.perf_counter()
        force(entry_mod.BRANCH_QUERIES[name](spark, sf_dir))
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        gc.collect()
        jvm = getattr(spark.sparkContext, "_jvm", None)
        if jvm is not None:
            jvm.System.gc()
        return dt

    for name in names:
        run(name, "old")  # warm both codegen paths
        run(name, "new")
        obs = {"old": [], "new": []}
        for _ in range(REPS):
            obs["old"].append(run(name, "old"))
            obs["new"].append(run(name, "new"))
        o, n = min(obs["old"]), min(obs["new"])
        print(
            f"{name:24s} old {o:6.3f}  new {n:6.3f}  ratio {n / o:.2f}   "
            f"(old reps {['%.2f' % x for x in obs['old']]}, "
            f"new reps {['%.2f' % x for x in obs['new']]})"
        )
    sim._folded_double_lit = NEW


if __name__ == "__main__":
    main()
