"""Sampling/split invariant tests (FIXTURES.md §6 — not DuckDB-
reproducible, so checked by seeded invariants instead of an oracle)."""

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.operators.sampling import (
    class_counts_fractions,
    class_percentile_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """Classes straddling the thresholds: big (2000), mid (300), small (60)."""
    rows = (
        [("big", i) for i in range(2000)]
        + [("mid", i) for i in range(300)]
        + [("small", i) for i in range(60)]
    )
    return spark.createDataFrame(rows, ["cls", "v"]).repartition(8)


def test_capped_fractions(skewed):
    fr = class_counts_fractions(skewed, "cls", sample_size=500, min_count=100)
    assert "small" not in fr  # below threshold → dropped
    assert fr["mid"] == 1.0  # 500/300 capped at 1
    assert abs(fr["big"] - 0.25) < 1e-12


def test_capped_sampler_sizes(skewed):
    out = stratified_sample(skewed, "cls", sample_size=500, min_count=100, seed=1)
    counts = {r.cls: r.cnt for r in out.groupBy("cls").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"big", "mid"}
    assert counts["mid"] == 300
    assert 380 <= counts["big"] <= 620  # binomial(2000, .25) ± 5σ


def test_oversample_floor(skewed):
    fr = class_counts_fractions(
        skewed, "cls", sample_size=100, oversample_floor=100
    )
    # small class (60 rows): rate bumped to min(1, 100/60 + .05) = 1.0
    assert fr["small"] == 1.0


def test_fixed_sampler_exact_cap(skewed):
    out = stratified_sample(skewed, "cls", sample_size=50, fixed=True, seed=2)
    counts = {r.cls: r.cnt for r in out.groupBy("cls").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"big": 50, "mid": 50, "small": 50}


def test_sampler_deterministic(skewed):
    a = stratified_sample(skewed, "cls", sample_size=500, min_count=100, seed=9)
    b = stratified_sample(skewed, "cls", sample_size=500, min_count=100, seed=9)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_partition_and_fraction(skewed):
    train, test = class_percentile_split(skewed, "cls", test_fraction=0.1, seed=5)
    n_train, n_test, n_all = train.count(), test.count(), skewed.count()
    assert n_train + n_test == n_all
    # disjoint: no (cls, v) appears in both
    overlap = train.select("cls", "v").intersect(test.select("cls", "v")).count()
    assert overlap == 0
    # per-class test fraction ≈ 0.10 for the big class
    big_test = test.where(F.col("cls") == "big").count()
    assert 150 <= big_test <= 250  # 2000 * 0.1 ± tolerance

    # same seed → same split
    train2, test2 = class_percentile_split(skewed, "cls", test_fraction=0.1, seed=5)
    assert test2.count() == n_test
    assert test2.select("cls", "v").exceptAll(test.select("cls", "v")).count() == 0


def test_hash_sample_partition_stable(tables):
    """The hash sampler keeps the SAME rows under any partitioning —
    the property rand(seed) lacks (per-partition-index seeding) — and
    approximates the requested fraction."""
    from merchant_classification_spark.operators.sampling import hash_sample

    docs = tables["documents"].select("doc_id", "text")
    a = {
        r.doc_id
        for r in hash_sample(docs.repartition(1), ["doc_id"], 0.3).collect()
    }
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(17), ["doc_id"], 0.3).collect()
    }
    assert a == b and a
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n
    # independent salts give (near-)independent samples
    c = {
        r.doc_id
        for r in hash_sample(docs, ["doc_id"], 0.3, salt="other").collect()
    }
    assert c != a
    # disjoint percentile ranges compose without a second pass
    from pyspark.sql import functions as F

    from merchant_classification_spark.operators.sampling import hash_percentile

    p = hash_percentile(["doc_id"])
    lo = {r.doc_id for r in docs.where(p < F.lit(0.3)).collect()}
    hi = {r.doc_id for r in docs.where(p >= F.lit(0.3)).collect()}
    assert lo == a and not (lo & hi) and len(lo) + len(hi) == n


def test_hash_split_disjoint_exhaustive_stable(tables):
    from merchant_classification_spark.operators.sampling import hash_split

    docs = tables["documents"].select("doc_id", "text")
    train, test = hash_split(docs, ["doc_id"], test_fraction=0.2)
    tr = {r.doc_id for r in train.collect()}
    te = {r.doc_id for r in test.collect()}
    assert not (tr & te)
    assert len(tr) + len(te) == docs.count()
    # membership is stable when the corpus grows: the same doc lands on
    # the same side after adding rows (no window rank to shift it)
    bigger = docs.unionByName(
        docs.selectExpr("doc_id + 1000000 AS doc_id", "text")
    )
    _, test2 = hash_split(bigger, ["doc_id"], test_fraction=0.2)
    te2 = {r.doc_id for r in test2.collect() if r.doc_id < 1000000}
    assert te2 == te


def _es_replay(ids, weights, k, salt=""):
    """Pure-Python Efraimidis–Spirakis replay of weighted_hash_sample."""
    import hashlib

    keyed = []
    for i, w in zip(ids, weights):
        if not w > 0:
            continue
        h = int(
            hashlib.md5(f"{salt}\x1f{i}".encode()).hexdigest()[:15], 16
        )
        u = (h % (1 << 54)) / float(1 << 54)
        keyed.append((u ** (1.0 / w), i))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return [i for _, i in keyed[:k]]


def test_weighted_hash_sample_matches_python_replay(spark):
    from merchant_classification_spark.operators.sampling import (
        weighted_hash_sample,
    )

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = (
        weighted_hash_sample(df, ["id"], "w", 25, salt="s1")
        .orderBy("sample_rank")
        .collect()
    )
    want = _es_replay([r[0] for r in rows], [r[1] for r in rows], 25, "s1")
    assert [r.id for r in got] == want
    assert [r.sample_rank for r in got] == list(range(1, 26))


def test_weighted_hash_sample_properties(spark):
    from merchant_classification_spark.operators.sampling import (
        hash_percentile,
        weighted_hash_sample,
    )

    rows = [(i, 1.0 if i % 3 else -1.0, "g%d" % (i % 2)) for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "w", "g"])
    # non-positive weights are never sampled
    got = weighted_hash_sample(df, ["id"], "w", 60)
    assert got.where("w <= 0").count() == 0
    # all-equal weights degrade to the unweighted hash-rank order
    eq = df.where("w > 0").withColumn("w", F.lit(1.0))
    s = weighted_hash_sample(eq, ["id"], "w", 10, salt="z").collect()
    byp = (
        eq.withColumn("p", hash_percentile(["id"], salt="z"))
        .orderBy(F.col("p").desc(), "id")
        .limit(10)
        .collect()
    )
    assert [r.id for r in sorted(s, key=lambda r: r.sample_rank)] == [
        r.id for r in byp
    ]
    # grouped draw: k per group, ranks restart
    per = weighted_hash_sample(df, ["id"], "w", 5, by=["g"]).collect()
    from collections import Counter

    c = Counter(r.g for r in per)
    assert c == {"g0": 5, "g1": 5}
    # heavier rows dominate the draw: two items, weight ratio 10^6 —
    # across 30 salts the heavy item must win almost always
    heavy = spark.createDataFrame(
        [(0, 1e6), (1, 1.0)], ["id", "w"]
    )
    wins = sum(
        weighted_hash_sample(heavy, ["id"], "w", 1, salt=str(s)).first().id
        == 0
        for s in range(30)
    )
    assert wins >= 27


def test_budget_mix_fills_each_source_budget(spark):
    from merchant_classification_spark.operators.sampling import budget_mix

    rows = [
        (f"{s}-{i}", f"src{s}", 100) for s in range(3) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n"])
    got = budget_mix(
        df, ["doc_id"], "source", "n", 500, {"src0": 900}
    ).collect()
    from collections import defaultdict

    by = defaultdict(list)
    for r in got:
        by[r.source].append(r)
    # budgets fill to (budget, budget + max_doc]: 900 -> 9 docs, 500 -> 5
    assert {s: len(v) for s, v in by.items()} == {
        "src0": 9, "src1": 5, "src2": 5
    }
    for s, v in by.items():
        assert sorted(r.mix_rank for r in v) == list(range(1, len(v) + 1))
        assert max(r.cum_size for r in v) == len(v) * 100
    # membership is stable when the corpus grows: the admitted set of a
    # source only changes at the percentile frontier — with the SAME
    # budget, a superset corpus admits a subset/superset-compatible
    # prefix, never an interior swap
    bigger = spark.createDataFrame(
        rows + [(f"x-{i}", "src1", 100) for i in range(10)],
        ["doc_id", "source", "n"],
    )
    small_ids = {r.doc_id for r in got if r.source == "src1"}
    big = budget_mix(
        bigger, ["doc_id"], "source", "n", 500, {"src0": 900}
    ).collect()
    big_ranks = {
        r.doc_id: r.mix_rank for r in big if r.source == "src1"
    }
    # every admitted old doc that still makes the cut keeps its relative
    # order; new docs only push the frontier
    common = [d for d in big_ranks if d in small_ids]
    old_order = sorted(
        common,
        key=lambda d: [r.mix_rank for r in got if r.doc_id == d][0],
    )
    new_order = sorted(common, key=lambda d: big_ranks[d])
    assert old_order == new_order


def test_hash_percentile_null_keys_distinct(spark):
    """NULL key columns must not collide with concatenation-ambiguous
    values: concat_ws silently SKIPS NULLs, so without the \\x00null
    sentinel ('a\\x1fb', NULL) and ('a', 'b') hash identically."""
    from merchant_classification_spark.operators.sampling import hash_percentile

    df = spark.createDataFrame(
        [("a\x1fb", None), ("a", "b"), (None, "a\x1fb"), (None, None)],
        ["x", "y"],
    )
    ps = [r.p for r in df.select(hash_percentile(["x", "y"]).alias("p")).collect()]
    assert len(set(ps)) == 4
    # non-null values are unchanged by the sentinel wrapper (oracle
    # replays keep matching): replay the documented md5 construction
    import hashlib

    df2 = spark.createDataFrame([("doc-1",)], ["doc_id"])
    got = df2.select(hash_percentile(["doc_id"], salt="s").alias("p")).first().p
    h = int(hashlib.md5("s\x1fdoc-1".encode()).hexdigest()[:15], 16)
    assert got == (h % (1 << 54)) / float(1 << 54)


def test_stratified_hash_sample_invariants(tables):
    """Per-class yield ≈ sample_size, membership is partitioning-stable,
    min_count drops small classes, cap keeps whole small classes."""
    from merchant_classification_spark.operators.sampling import (
        stratified_hash_sample,
    )

    orders = tables["orders"]
    got = stratified_hash_sample(
        orders, "o_orderpriority", ["o_orderkey"], sample_size=100, salt="t"
    )
    from collections import Counter

    per = Counter(r.o_orderpriority for r in got.collect())
    counts = Counter(r.o_orderpriority for r in orders.collect())
    for k, n in per.items():
        target = min(100, counts[k])
        assert 0.6 * target <= n <= 1.5 * target, (k, n, target)
    # partitioning-stable membership
    a = {r.o_orderkey for r in got.collect()}
    b = {
        r.o_orderkey
        for r in stratified_hash_sample(
            orders.repartition(13),
            "o_orderpriority",
            ["o_orderkey"],
            sample_size=100,
            salt="t",
        ).collect()
    }
    assert a == b
    # sample_size >= class size keeps the whole class (rate capped at 1)
    all_kept = stratified_hash_sample(
        orders, "o_orderpriority", ["o_orderkey"], sample_size=10**9
    )
    assert all_kept.count() == orders.count()
    # min_count drops classes below the threshold
    some = stratified_hash_sample(
        orders,
        "o_orderpriority",
        ["o_orderkey"],
        sample_size=100,
        min_count=10**9,
    )
    assert some.count() == 0
    # oversample floor bumps small-class rates
    floored = stratified_hash_sample(
        orders,
        "o_orderpriority",
        ["o_orderkey"],
        sample_size=1,
        oversample_floor=20,
        salt="t",
    )
    perf = Counter(r.o_orderpriority for r in floored.collect())
    for k in counts:
        assert perf.get(k, 0) >= 5, (k, perf.get(k, 0))


def test_temperature_rates_math():
    from merchant_classification_spark.operators.sampling import (
        temperature_rates,
    )

    counts = {"a": 800, "b": 150, "c": 50}
    # alpha=1: natural proportions -> every source keeps the same rate
    r1 = temperature_rates(counts, 1.0, 500)
    assert all(abs(v - 0.5) < 1e-12 for v in r1.values())
    # alpha=0: uniform source targets -> each source targets total/3
    r0 = temperature_rates(counts, 0.0, 300)
    assert abs(r0["a"] - 100 / 800) < 1e-12
    assert abs(r0["c"] - 1.0) < 1e-12  # capped: target 100 > 50 rows
    # alpha=0.5 flattens: the small source's rate exceeds the big one's
    rh = temperature_rates(counts, 0.5, 300)
    assert rh["c"] > rh["b"] > rh["a"]
    import pytest as _pt

    with _pt.raises(ValueError):
        temperature_rates({}, 0.5, 10)
    with _pt.raises(ValueError):
        temperature_rates(counts, -1.0, 10)
    with _pt.raises(ValueError):
        temperature_rates(counts, 0.5, 0)
    # a None source key must raise a NAMED error, not an opaque
    # str-vs-None sort TypeError deep inside the rate math
    with _pt.raises(ValueError, match="None source"):
        temperature_rates({"a": 10, None: 5}, 0.5, 10)


def test_temperature_mix_drops_null_sources(spark):
    from merchant_classification_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, "big" if i < 900 else ("small" if i < 1000 else None))
            for i in range(1100)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    out = temperature_mix(df, ["doc_id"], "source", 0.5, 400, salt="n")
    # NULL-source rows never reach the rate fit (no TypeError) and are
    # never admitted; the non-null behavior matches the NULL-free frame
    assert out.where(F.col("source").isNull()).count() == 0
    clean = temperature_mix(
        df.where(F.col("source").isNotNull()),
        ["doc_id"], "source", 0.5, 400, salt="n",
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, clean.collect())
    )


def test_temperature_mix_rebalances_and_is_stable(spark):
    from merchant_classification_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, "big" if i < 1600 else "small") for i in range(1800)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mix(df, ["doc_id"], "source", 0.3, 600, salt="t")
    got = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    # natural share: big 89% / small 11%; alpha=0.3 pulls the mix toward
    # parity — small's admitted share must rise far above its natural one
    tot = sum(by.values())
    assert by["small"] / tot > 0.3
    assert 0.7 * 600 < tot < 1.3 * 600  # expectation targeting
    # membership is a pure row function: repartitioning changes nothing
    again = temperature_mix(
        df.repartition(13), ["doc_id"], "source", 0.3, 600, salt="t"
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, out.collect())
    )
