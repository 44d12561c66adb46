"""A/B/C measurement for the bounded literal-table lookup (round 8).

The perplexity screens probe a driver-fitted str→double table at every
token/pair position. Three candidate encodings, same values by
construction:

  A. ``create_map`` literal + ``try_element_at`` — the round-7 shape;
     ``GetMapValue`` on a literal map is an O(V) linear scan per probe
     (the repo's own measured Catalyst trap, SNIPPETS/SCALING).
  B. crc32-bucketed nested-array literals (``functions/lookup.py``) —
     O(V/B) probe, stays map-only. The round-8 default.
  C. broadcast join on the exploded pairs + sorted-struct refold —
     the "vocabulary too large to inline" shape the docstrings name.

Usage: python tools/ab_lookup.py [sf_dir] [reps]
Prints one JSON line per variant with the median wall seconds of the
bigram-perplexity scoring pass at the graded table sizes (top_k=24,
top_k2=256), after asserting all three variants return IDENTICAL
(doc_id, n_tokens, n_backoff, logprob_sum) rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, functions as F

from merchant_classification_spark.functions.text_analysis import (
    _BIGRAM_SEP,
    bigram_backoff_model,
    bigram_perplexity_scores,
    tokens,
)
from merchant_classification_spark.session import build_session


def scores_create_map(df, uni_model, bigram_model, oov_lp, log_alpha):
    """Variant A: the round-7 create_map encoding, kept verbatim for the
    measurement (two map probes per pair position, O(V) scans)."""
    ukv: list[Column] = []
    for t, lp in uni_model:
        ukv += [F.lit(t), F.lit(float(lp))]
    umap = F.create_map(*ukv) if ukv else F.create_map()
    bkv: list[Column] = []
    for k, lp in bigram_model:
        bkv += [F.lit(k), F.lit(float(lp))]
    bmap = F.create_map(*bkv) if bkv else F.create_map()
    oov = F.lit(float(oov_lp))
    la = F.lit(float(log_alpha))

    def uni(x):
        return F.coalesce(F.try_element_at(umap, x), oov)

    def stats(t):
        s1 = F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0)))
        s2 = F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))
        pair_lps = F.zip_with(
            s1, s2,
            lambda a, b: F.coalesce(
                F.try_element_at(bmap, F.concat(a, F.lit(_BIGRAM_SEP), b)),
                la + uni(b),
            ),
        )
        flags = F.zip_with(
            s1, s2,
            lambda a, b: F.try_element_at(
                bmap, F.concat(a, F.lit(_BIGRAM_SEP), b)
            ).isNull(),
        )
        first = uni(F.element_at(t, 1))
        return F.struct(
            F.size(t).alias("n"),
            F.when(F.size(t) > 0, F.aggregate(pair_lps, first, lambda a, x: a + x))
            .otherwise(F.lit(0.0)).alias("lp_sum"),
            F.size(F.filter(flags, lambda x: x)).alias("n_backoff"),
        )

    bound = df.select(
        "doc_id",
        F.element_at(F.transform(F.array(tokens("text")), stats), 1).alias("_s"),
    )
    s = F.col("_s")
    return bound.select(
        "doc_id",
        s["n"].cast("int").alias("n_tokens"),
        s["n_backoff"].cast("int").alias("n_backoff"),
        s["lp_sum"].alias("logprob_sum"),
    )


def scores_broadcast_join(spark, df, uni_model, bigram_model, oov_lp, log_alpha):
    """Variant C: explode pairs, broadcast-join both model dims, refold
    in position order (array_sort on (pos, lp) structs), union the
    first-token unigram seed as pos 0 — the same left-to-right IEEE
    order, so sums are bit-identical."""
    oov = float(oov_lp)
    la = float(log_alpha)
    uni_dim = spark.createDataFrame(
        [(t, float(lp)) for t, lp in uni_model], "w string, ulp double"
    )
    bi_dim = spark.createDataFrame(
        [(k.split(_BIGRAM_SEP)[0], k.split(_BIGRAM_SEP)[1], float(lp))
         for k, lp in bigram_model],
        "w1 string, w2 string, blp double",
    )
    toks = df.select("doc_id", tokens("text").alias("t"))
    base = toks.select(
        "doc_id", F.size("t").alias("n_tokens"), F.col("t")
    ).persist()
    pairs = base.select(
        "doc_id",
        F.posexplode(
            F.zip_with(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("pos", "p"),
    ).select("doc_id", (F.col("pos") + 1).alias("pos"), "p.w1", "p.w2")
    firsts = base.where(F.size("t") > 0).select(
        "doc_id", F.lit(0).alias("pos"), F.element_at("t", 1).alias("w2")
    )
    firsts_lp = (
        firsts.join(F.broadcast(uni_dim), firsts.w2 == uni_dim.w, "left")
        .select("doc_id", "pos",
                F.coalesce("ulp", F.lit(oov)).alias("lp"),
                F.lit(False).alias("backoff"))
    )
    pair_lp = (
        pairs.join(F.broadcast(bi_dim), ["w1", "w2"], "left")
        .join(F.broadcast(uni_dim), pairs.w2 == uni_dim.w, "left")
        .select(
            "doc_id", "pos",
            F.coalesce(
                "blp", F.lit(la) + F.coalesce("ulp", F.lit(oov))
            ).alias("lp"),
            F.col("blp").isNull().alias("backoff"),
        )
    )
    folded = (
        firsts_lp.unionByName(pair_lp)
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "lp"))
            ).alias("seq"),
            F.sum(F.when(F.col("backoff") & (F.col("pos") > 0), 1)
                  .otherwise(0)).cast("int").alias("n_backoff"),
        )
        .select(
            "doc_id", "n_backoff",
            F.aggregate(
                "seq", F.lit(0.0), lambda a, x: a + x["lp"]
            ).alias("logprob_sum"),
        )
    )
    out = (
        base.select("doc_id", "n_tokens")
        .join(folded, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.coalesce("n_backoff", F.lit(0)).alias("n_backoff"),
            F.coalesce("logprob_sum", F.lit(0.0)).alias("logprob_sum"),
        )
    )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session()
    from merchant_classification_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    uni, bi, oov, la = bigram_backoff_model(docs, "text", 24, 256, 0.4)

    variants = {
        "A_create_map": lambda: scores_create_map(docs, uni, bi, oov, la),
        "B_bucketed_arrays": lambda: bigram_perplexity_scores(
            docs, uni, bi, oov, la
        ).select("doc_id", "n_tokens", "n_backoff", "logprob_sum"),
        "C_broadcast_join": lambda: scores_broadcast_join(
            spark, docs, uni, bi, oov, la
        ),
    }

    # equality first: every variant must return identical rows
    ref = None
    for name, build in variants.items():
        rows = sorted(map(tuple, build().collect()))
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"{name} diverges from A"
    print(json.dumps({"identical_rows": len(ref), "variants": len(variants)}))

    def force(d):
        d.write.mode("overwrite").format("noop").save()

    for name, build in variants.items():
        force(build())  # warm-up (codegen/JIT)
        ts = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(build())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(json.dumps({
            "variant": name,
            "median_sec": round(ts[len(ts) // 2], 3),
            "reps": ts and [round(x, 3) for x in ts],
            "sf_dir": sf_dir,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
