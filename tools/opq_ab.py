"""OPQ-rotation A/B at the graded ann_pq dial (round-11 verdict item
#5, same discipline as the round-10 residual-PQ A/B): measure
recall@10 avg/min on the sf0.01 embeddings with the EXACT q_ann_pq
configuration, raw vs OPQ-rotated (parametric OPQ — PCA + balanced
eigenvalue allocation, operators/similarity.py fit_opq_rotation).
The rotation is fitted on the same deterministic stride sample as the
quantizers; corpus and queries are rotated with the same matrix, and
the exact-L2 baseline is computed on the RAW vectors (L2 is
rotation-invariant, so the ground-truth neighbor sets are identical —
comparing rotated approx hits against raw exact ids is exact).

Usage: python tools/opq_ab.py [sf_dir]   (default /root/testdata/sf0.01)
Prints one JSON line; adopt-on-evidence rule: flip the ann_pq default
only if min recall beats the raw tier's.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from merchant_classification_spark.operators.similarity import (
        brute_force_topk_l2,
        fit_opq_rotation,
        pq_topk_portable,
        rotate_vectors,
        with_recall_at_k,
    )
    from merchant_classification_spark.session import build_session
    from merchant_classification_spark.sources.tables import load_table

    spark = build_session()
    emb = load_table(spark, sf_dir, "embeddings")
    dial = dict(
        k=entry.ANN_K,
        n_centroids=entry.IVF_N_CENTROIDS,
        n_probe=entry.PQ_N_PROBE,
        n_subspaces=entry.PQ_N_SUBSPACES,
        n_codes=entry.PQ_N_CODES,
        fit_target=entry.IVF_FIT_TARGET,
        max_iter=entry.IVF_ITERS,
        refine_factor=entry.PQ_REFINE,
        encoder="arrow",
    )

    def qs_of(df):
        return df.where(F.col("vec_id") < entry.N_ANN_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

    exact = brute_force_topk_l2(emb, qs_of(emb), k=entry.ANN_K).persist()
    exact.count()

    def recalls(data):
        rec = with_recall_at_k(
            pq_topk_portable(data, qs_of(data), **dial), exact
        )
        rows = rec.select("query_id", "recall_at_k").distinct().collect()
        vals = [r["recall_at_k"] for r in rows]
        return round(sum(vals) / len(vals), 4), round(min(vals), 4)

    raw_avg, raw_min = recalls(emb)
    R = fit_opq_rotation(
        emb, entry.PQ_N_SUBSPACES, fit_target=entry.IVF_FIT_TARGET
    )
    rotated = rotate_vectors(emb, R, "embedding").persist()
    rotated.count()
    opq_avg, opq_min = recalls(rotated)
    print(
        json.dumps(
            {
                "metric": "opq_ab_recall_at_k",
                "sf_dir": sf_dir,
                "k": entry.ANN_K,
                "raw": {"avg": raw_avg, "min": raw_min},
                "opq": {"avg": opq_avg, "min": opq_min},
                "adopt": opq_min > raw_min,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
