"""Measure WHERE the ANN members' build cost lives and A/B candidate
fixes for the 4096-node planes-literal re-analysis (VERDICT r11 item 1;
guide §1.2 step 2 — know whether time is parse, per-Dataset analysis,
or execution-side planning before changing anything).

Probes, each timed min-of-N on the live session:

  parse      F.expr(<40 KB nested array SQL>) — py4j + parser
  select     df.select(sigs_from(literal)) — eager Catalyst analysis
  chain      each downstream Dataset op of the lsh_topk pipeline
  fold       is from_json(<json literal>, schema) constant-folded in
             the optimized plan? (decides whether a 1-node string
             literal can replace the 4096-node parsed array)
  exec       noop-forced execution of the signature projection for the
             parsed-array vs from_json forms (bit-identity checked)

Usage: python tools/ann_literal_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from merchant_classification_spark.operators.similarity import (
    _multi_table_signatures,
    _random_hyperplanes,
)
from merchant_classification_spark.session import build_session

DIM, BITS, TABLES, SEED = 64, 4, 16, 42
REPS = 5


def t(fn, reps=REPS):
    obs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        obs.append(time.perf_counter() - t0)
    return min(obs)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="ann-literal-probe")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    print(f"embeddings rows={n}")

    all_planes = [
        _random_hyperplanes(DIM, BITS, SEED + 1000 * tbl)
        for tbl in range(TABLES)
    ]
    planes_sql = (
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array(" + ",".join(f"{x!r}D" for x in p) + ")" for p in tbl
            )
            + ")"
            for tbl in all_planes
        )
        + ")"
    )
    print(f"planes SQL text: {len(planes_sql)} chars")
    print(f"parse F.expr           : {t(lambda: F.expr(planes_sql)):.4f} s")

    sigs = _multi_table_signatures("embedding", DIM, BITS, TABLES, SEED)

    def sel():
        return emb.select(
            F.col("vec_id"), F.posexplode(sigs).alias("table", "bucket")
        )

    print(f"select w/ literal      : {t(sel):.4f} s  (eager analysis)")
    base = sel()
    print(f"  .where on it         : {t(lambda: base.where(F.col('bucket') > 0)):.4f} s")
    b2 = base.where(F.col("bucket") >= 0)
    print(f"  self-join on it      : {t(lambda: b2.join(b2.selectExpr('vec_id as q','table as t2','bucket'), 'bucket')):.4f} s")
    print(f"  dropDuplicates       : {t(lambda: b2.dropDuplicates(['vec_id', 'table'])):.4f} s")

    # control: same shape without the big literal
    small = emb.select(F.col("vec_id"), F.size("embedding").alias("d"))
    print(f"select w/o literal     : {t(lambda: emb.select(F.col('vec_id'), F.size('embedding').alias('d'))):.4f} s")
    print(f"  .where on it         : {t(lambda: small.where(F.col('d') > 0)):.4f} s")

    # --- from_json candidate --------------------------------------------
    planes_json = json.dumps(all_planes)
    fj = F.from_json(
        F.lit(planes_json), "array<array<array<double>>>"
    )
    one = spark.range(1).select(fj.alias("p"))
    plan = one._jdf.queryExecution().optimizedPlan().toString()
    folded = "from_json" not in plan.lower() and "jsontostructs" not in plan.lower()
    print(f"from_json constant-folded in optimized plan: {folded}")
    print(plan[:400])

    def sel_fj():
        return emb.select(F.col("vec_id"), F.posexplode(_sigs_from_planes(fj)).alias("table", "bucket"))

    print(f"select w/ from_json    : {t(sel_fj):.4f} s  (eager analysis)")

    # exec A/B: noop-force both signature projections, compare outputs
    def force(df):
        df.write.mode("overwrite").format("noop").save()

    a = sel()
    b = sel_fj()
    for name, df in (("parsed-array", a), ("from_json", b)):
        force(df)  # warm
        print(f"exec {name:12s}: {t(lambda: force(df), reps=3):.4f} s")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"output diff rows: {diff}")


def _sigs_from_planes(planes_lit):
    from merchant_classification_spark.functions.vectors import (
        to_double_array,
    )

    v = to_double_array("embedding")
    weights = F.expr(
        "array(" + ",".join(f"{1 << i}L" for i in range(BITS)) + ")"
    )

    def sigs_from(vb):
        return F.transform(
            planes_lit,
            lambda tbl: F.aggregate(
                F.zip_with(
                    F.transform(
                        tbl,
                        lambda p: F.aggregate(
                            F.zip_with(vb, p, lambda x, y: x * y),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ),
                    ),
                    weights,
                    lambda d, w: F.when(d > 0, w).otherwise(
                        F.lit(0).cast("long")
                    ),
                ),
                F.lit(0).cast("long"),
                lambda x, y: x.bitwiseOR(y),
            ),
        )

    return F.element_at(F.transform(F.array(v), sigs_from), 1)


if __name__ == "__main__":
    main()
