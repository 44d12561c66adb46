"""Dedup operator tests: exact, fingerprint, MinHash LSH, SimHash,
n-gram Jaccard, and representative assignment."""

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.operators.dedup import (
    assign_representatives,
    exact_dedup,
    fingerprint_dedup,
    minhash_candidate_pairs,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
    simhash_dedup_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the river bank tomorrow"
OTHER = "completely different content about spark query engines and parquet files"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, NEAR),  # near dup of 0
        (3, OTHER),
        (4, "word " * 2),  # shorter than shingle size
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = exact_dedup(docs, ["text"], "doc_id").orderBy("keep_id").collect()
    assert [(r.keep_id, r.dup_count) for r in out] == [(0, 2), (2, 1), (3, 1), (4, 1)]


def test_fingerprint_dedup_order_invariant(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha alpha"), (2, "delta x")],
        ["doc_id", "text"],
    )
    out = fingerprint_dedup(df, "text", "doc_id").orderBy("keep_id").collect()
    assert [(r.keep_id, r.dup_count) for r in out] == [(0, 2), (2, 1)]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["text"])
    got = df.select(shingles("text", 3).alias("sh")).collect()
    assert got[0].sh == ["a b c", "b c d"]
    assert got[1].sh == ["a b"]  # short doc → whole text as one shingle


def test_minhash_finds_near_duplicates(docs):
    pairs = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup always survives
    assert (0, 2) in got and (1, 2) in got  # near dup
    assert all(3 not in p and 4 not in p for p in got)


def test_minhash_jaccard_is_exact_on_verify(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.1).collect()
    }
    assert pairs[(0, 1)] == 1.0


def test_ngram_jaccard_ground_truth(docs):
    got = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_simhash_near_duplicates(docs):
    sims = {
        r.doc_id: r.s
        for r in docs.select("doc_id", simhash64("text").alias("s")).collect()
    }
    assert sims[0] == sims[1]
    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_dedup_pairs(docs, "doc_id", "text", max_hamming=8).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs
    assert (0, 3) not in pairs


def test_assign_representatives_chain(spark):
    ids = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    # chain 0-1-2, pair 3-4, singleton 5
    pairs = spark.createDataFrame([(1, 2), (0, 1), (3, 4)], ["id_a", "id_b"])
    got = {
        r.doc_id: r.rep for r in assign_representatives(ids, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_minhash_on_documents_table(tables):
    """Smoke the full LSH pipeline on the real documents table."""
    docs = tables["documents"]
    pairs = minhash_candidate_pairs(docs, "doc_id", "text", num_hashes=32, bands=8)
    n = pairs.count()
    assert n < docs.count() ** 2 / 10  # LSH actually prunes

def test_ngram_jaccard_pathological_giant_doc(spark):
    """A single 50k-shingle document must stream through the prefix stage.

    The prefix is selected with a window row_number over (df_count,
    shingle) — constant memory per posting row — instead of a per-doc
    collect_list aggregation buffer, so one multi-MB outlier document
    cannot OOM an executor. The giant doc shares no vocabulary with the
    near-dup pair, so the verified output is exactly that pair.
    """
    import random

    rng = random.Random(7)
    giant = " ".join(f"w{rng.randrange(10**9)}" for _ in range(50_000 + 2))
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "alpha beta gamma delta epsilon zeta eta iota"
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, giant)], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, max_df=None
        ).collect()
    }
    assert set(got) == {(0, 1)}
    # 6 3-shingles each, 5 shared -> 5/7
    assert abs(got[(0, 1)] - 5 / 7) < 1e-12

def test_edit_distance_pairs_exact_vs_naive(spark):
    """Prefix-filtered edit-distance join must equal the naive quadratic."""
    from pyspark.sql import functions as F

    from merchant_classification_spark.operators.dedup import edit_distance_pairs

    names = [
        "Customer#000000017",
        "Customer#000000018",  # sub of last digit: ed=1
        "Customer#0000000017",  # one inserted zero: ed=1 vs doc 0
        "Customer#000000999",
        "ab",                  # short-string block
        "b",                   # ed("ab","b")=1
        "zz",
        "Supplier#000000017",  # ed vs Customer twin > 1
    ]
    df = spark.createDataFrame(list(enumerate(names)), ["doc_id", "name"])
    got = {
        (r.id_a, r.id_b): r.edit_dist
        for r in edit_distance_pairs(df, "doc_id", "name", max_distance=1).collect()
    }
    l = df.select(F.col("doc_id").alias("id_a"), F.col("name").alias("na"))
    r_ = df.select(F.col("doc_id").alias("id_b"), F.col("name").alias("nb"))
    naive = {
        (row.id_a, row.id_b): row.d
        for row in l.crossJoin(r_)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("d", F.levenshtein("na", "nb").cast("long"))
        .where(F.col("d") <= 1)
        .collect()
    }
    assert got == naive
    assert (0, 1) in got and (0, 2) in got and (4, 5) in got


def test_edit_distance_pairs_k2_table(tables):
    """k=2 on the real customer table still matches the naive join."""
    from pyspark.sql import functions as F

    from merchant_classification_spark.operators.dedup import edit_distance_pairs

    cust = tables["customer"].select("c_custkey", "c_name")
    got = (
        edit_distance_pairs(cust, "c_custkey", "c_name", max_distance=2)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("id_a") + F.col("id_b") + F.col("edit_dist")).alias("chk"),
        )
        .collect()[0]
    )
    l = cust.select(F.col("c_custkey").alias("id_a"), F.col("c_name").alias("na"))
    r = cust.select(F.col("c_custkey").alias("id_b"), F.col("c_name").alias("nb"))
    naive = (
        l.crossJoin(r)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("na", "nb").cast("long"))
        .where(F.col("edit_dist") <= 2)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("id_a") + F.col("id_b") + F.col("edit_dist")).alias("chk"),
        )
        .collect()[0]
    )
    assert (got.n, got.chk) == (naive.n, naive.chk) and got.n > 0


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------


def _poly_hash(s: str) -> int:
    from merchant_classification_spark.operators.dedup import (
        WINNOW_BASE,
        WINNOW_MASK,
    )

    acc = 0
    for ch in s:
        acc = (acc * WINNOW_BASE + ord(ch)) & WINNOW_MASK
    return acc


def _winnow_py(text: str, k: int = 8, w: int = 4) -> set[int]:
    """Independent pure-Python replay of winnow_fingerprints
    (Rabin–Karp code-point fold, same base/mask constants)."""
    if len(text) >= k:
        hs = [_poly_hash(text[i : i + k]) for i in range(len(text) - k + 1)]
    else:
        hs = [_poly_hash(text)]
    if len(hs) >= w:
        return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}
    return {min(hs)}


def test_winnow_matches_python_replay(tables):
    from merchant_classification_spark.operators.dedup import winnow_fingerprints

    docs = tables["documents"].limit(50)
    got = {
        r.doc_id: set(r.fps)
        for r in docs.select(
            "doc_id", winnow_fingerprints("text", 8, 4).alias("fps")
        ).collect()
    }
    want = {r.doc_id: _winnow_py(r.text) for r in docs.collect()}
    assert got == want


def test_winnow_shared_substring_guarantee(spark):
    # any shared substring of length >= k + w - 1 (= 11) must yield at
    # least one shared fingerprint (the winnowing local-sampling bound)
    from merchant_classification_spark.operators.dedup import winnow_fingerprints

    shared = "identical-run-of-text-long-enough-to-fingerprint"
    df = spark.createDataFrame(
        [(0, "PREFIX AAA " + shared), (1, shared + " ZZZ OTHER SUFFIX")],
        ["doc_id", "text"],
    )
    rows = df.select(
        "doc_id", winnow_fingerprints("text", 8, 4).alias("fps")
    ).collect()
    fps = {r.doc_id: set(r.fps) for r in rows}
    assert fps[0] & fps[1]


def test_winnow_short_text_edge(spark):
    from merchant_classification_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame([(0, "ab"), (1, "abcdefgh"), (2, "")], ["doc_id", "t"])
    rows = df.select(
        "doc_id", winnow_fingerprints("t", 8, 4).alias("fps")
    ).collect()
    by_id = {r.doc_id: r.fps for r in rows}
    assert len(by_id[0]) == 1 and len(by_id[1]) == 1 and len(by_id[2]) == 1
    assert by_id[0] == [_winnow_py("ab").pop()]


def test_winnow_pairs_moss_join(spark):
    from merchant_classification_spark.operators.dedup import winnow_pairs

    plag = (
        "students often copy this exact paragraph verbatim into their "
        "submissions hoping nobody runs a fingerprint join over the corpus"
    )
    df = spark.createDataFrame(
        [
            (0, "intro words. " + plag + " closing words."),
            (1, "different opener; " + plag),
            (2, "entirely unrelated essay about distributed joins and shuffles"),
        ],
        ["doc_id", "text"],
    )
    got = winnow_pairs(df, "doc_id", "text", min_shared=2).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(0, 1)]
    assert got[0].shared_fps >= 2


def test_remove_boilerplate_scrubs_repeated_spans(spark):
    from merchant_classification_spark.operators.dedup import remove_boilerplate

    banner = "accept all cookies"  # 3 tokens — exactly one span
    rows = [
        (0, banner + " alpha bravo charlie"),
        (1, banner + " delta echo foxtrot"),
        (2, banner + " golf hotel india"),
        (3, "juliett kilo lima mike november oscar"),
        (4, banner),  # scrubbed to emptiness
        (5, ""),  # zero tokens: n_spans 0, survives with ''
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r
        for r in remove_boilerplate(
            df, "doc_id", "text", span_tokens=3, min_docs=3
        ).collect()
    }
    assert len(got) == 6
    assert got[0].clean_text == "alpha bravo charlie"
    assert got[1].clean_text == "delta echo foxtrot"
    assert got[2].clean_text == "golf hotel india"
    assert got[0].n_spans == 2 and got[0].n_removed == 1
    # doc 3 shares no span: untouched
    assert got[3].clean_text == "juliett kilo lima mike november oscar"
    assert got[3].n_removed == 0
    # doc 4 was only the banner: emptied but still present
    assert got[4].clean_text == "" and got[4].n_removed == 1
    assert got[5].n_spans == 0 and got[5].clean_text == ""


def test_remove_boilerplate_intra_doc_repeats_dont_count(spark):
    from merchant_classification_spark.operators.dedup import remove_boilerplate

    # the span repeats 3x WITHIN one doc but appears in only 2 distinct
    # docs — below min_docs=3, so nothing is scrubbed
    span = "one two three"
    df = spark.createDataFrame(
        [(0, " ".join([span] * 3)), (1, span + " four five six")],
        ["doc_id", "text"],
    )
    got = remove_boilerplate(df, "doc_id", "text", span_tokens=3, min_docs=3)
    assert {r.n_removed for r in got.collect()} == {0}


def test_remove_boilerplate_hashed_matches_raw(tables):
    from merchant_classification_spark.operators.dedup import remove_boilerplate

    docs = tables["documents"]
    a = remove_boilerplate(
        docs, "doc_id", "text", span_tokens=3, min_docs=2, hashed=True
    )
    b = remove_boilerplate(
        docs, "doc_id", "text", span_tokens=3, min_docs=2, hashed=False
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.where(F.col("n_removed") > 0).count() > 0


def test_winnow_arrow_kernel_bit_identical(tables):
    from merchant_classification_spark.operators.dedup import (
        winnow_fingerprint_rows,
    )

    docs = tables["documents"].select("doc_id", "text")
    nat = winnow_fingerprint_rows(docs, "doc_id", "text")
    arr = winnow_fingerprint_rows(docs, "doc_id", "text", kernel="arrow")
    assert nat.exceptAll(arr).count() == 0
    assert arr.exceptAll(nat).count() == 0


def test_winnow_arrow_kernel_edge_rows(spark):
    from merchant_classification_spark.operators.dedup import (
        winnow_fingerprint_rows,
    )

    # null -> single NULL fp, empty -> [0], short (< k) -> whole fold,
    # non-BMP unicode -> code-point parity (utf-32 == F.ascii == ord)
    edge = spark.createDataFrame(
        [(0, None), (1, ""), (2, "ab"), (3, "abcdefg"), (4, "é中文🎉 test")],
        ["doc_id", "text"],
    )

    def key(r):
        return (r[0], r[1] is None, r[1])

    nat = sorted(winnow_fingerprint_rows(edge, "doc_id", "text").collect(), key=key)
    arr = sorted(
        winnow_fingerprint_rows(edge, "doc_id", "text", kernel="arrow").collect(),
        key=key,
    )
    assert [tuple(r) for r in nat] == [tuple(r) for r in arr]
    assert (0, None) in [tuple(r) for r in nat]


def test_winnow_pairs_arrow_kernel_same_pairs(spark):
    from merchant_classification_spark.operators.dedup import winnow_pairs

    plag = (
        "students often copy this exact paragraph verbatim into their "
        "submissions hoping nobody runs a fingerprint join over the corpus"
    )
    df = spark.createDataFrame(
        [
            (0, "intro words. " + plag + " closing words."),
            (1, "different opener; " + plag),
            (2, "entirely unrelated essay about distributed joins and shuffles"),
        ],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple, winnow_pairs(df, "doc_id", "text", min_shared=2).collect()))
    b = sorted(
        map(
            tuple,
            winnow_pairs(
                df, "doc_id", "text", min_shared=2, kernel="arrow"
            ).collect(),
        )
    )
    assert a == b and [(r[0], r[1]) for r in a] == [(0, 1)]


def test_winnow_arrow_kernel_empty_partitions_and_string_ids(spark):
    from merchant_classification_spark.operators.dedup import (
        winnow_fingerprint_rows,
    )

    # 8 partitions, 1 row: most arrow batches are empty — must not break
    # the declared schema (empty pa.array would infer the null type)
    df = spark.createDataFrame(
        [(0, "hello world fingerprints")], ["doc_id", "text"]
    ).repartition(8)
    assert winnow_fingerprint_rows(df, "doc_id", "text", kernel="arrow").count() == 7
    # non-long id types pass through with their arrow type preserved
    df2 = spark.createDataFrame(
        [("a", "hello world fingerprints")], ["doc_id", "text"]
    ).repartition(4)
    out = winnow_fingerprint_rows(df2, "doc_id", "text", kernel="arrow")
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    assert out.count() == 7


def test_unknown_hash_scheme_raises():
    """Scheme dispatch must fail loudly on typos instead of silently
    falling back to the non-portable xxh64 construction."""
    import pytest

    from merchant_classification_spark.operators.dedup import (
        lsh_band_hashes,
        minhash_signature,
    )

    with pytest.raises(ValueError, match="unknown hash scheme"):
        minhash_signature("sh", scheme="md-5")
    with pytest.raises(ValueError, match="unknown hash scheme"):
        lsh_band_hashes("sig", 4, 16, scheme="MD5")


def test_unknown_hash_scheme_raises_pipelines(spark):
    import pytest

    from merchant_classification_spark.operators.dedup import (
        minhash_dedup_pairs,
        simhash_dedup_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="unknown hash scheme"):
        minhash_dedup_pairs(df, "doc_id", "text", scheme="xxhash")
    with pytest.raises(ValueError, match="unknown hash scheme"):
        simhash_dedup_pairs(df, "doc_id", "text", scheme="sha1")


def test_assign_representatives_doubling_matches_propagation(spark):
    """A/B: pointer-doubling produces label-for-label the same fixed
    point as plain propagation, and converges in O(log d) rounds where
    propagation needs O(d) — a 60-node chain resolves under a 7-round
    budget with doubling (coverage ≥ 2^7 > 60) but NOT with propagation
    (7 rounds reach ≤ 7 hops)."""
    import random

    from merchant_classification_spark.operators.dedup import (
        assign_representatives_doubling,
    )

    # random sparse graph: identical labels between the two variants
    rng = random.Random(5)
    n = 60
    ids = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    a = {
        r.doc_id: r.rep
        for r in assign_representatives(ids, pairs, max_iterations=50).collect()
    }
    b = {
        r.doc_id: r.rep
        for r in assign_representatives_doubling(ids, pairs).collect()
    }
    assert a == b and len(a) == n

    # deep chain: doubling converges within 7 rounds, propagation can't
    m = 60
    cids = spark.createDataFrame([(i,) for i in range(m)], ["doc_id"])
    cpairs = spark.createDataFrame(
        [(i, i + 1) for i in range(m - 1)], ["id_a", "id_b"]
    )
    deep = {
        r.doc_id: r.rep
        for r in assign_representatives_doubling(
            cids, cpairs, max_iterations=7
        ).collect()
    }
    assert set(deep.values()) == {0}
    shallow = {
        r.doc_id: r.rep
        for r in assign_representatives(
            cids, cpairs, max_iterations=7
        ).collect()
    }
    assert set(shallow.values()) != {0}  # O(d) variant not converged yet


def _naive_substring_dedup(rows, k):
    """Pure-Python replay of exact_substring_dedup for the fuzz check."""
    import re

    def toks(s):
        c = re.sub(r"[^a-z0-9']+", " ", (s or "").lower()).strip()
        return c.split(" ") if c else []

    docs = [(i, toks(t)) for i, t in rows]
    first = {}
    for i, t in sorted(docs):
        for p in range(len(t) - k + 1):
            g = " ".join(t[p : p + k])
            first.setdefault(g, (i, p))
    out = {}
    for i, t in sorted(docs):
        drop = set()
        for p in range(len(t) - k + 1):
            g = " ".join(t[p : p + k])
            if first[g] != (i, p):
                drop.update(range(p, p + k))
        kept = [w for j, w in enumerate(t) if j not in drop]
        out[i] = (" ".join(kept), len(t), len(t) - len(kept))
    return out


def test_exact_substring_dedup_semantics(spark):
    """Lee-et-al exact substring dedup: cross-doc later occurrence
    scrubbed, first kept; within-doc repeats scrubbed; short / empty /
    NULL docs untouched."""
    from merchant_classification_spark.operators.dedup import (
        exact_substring_dedup,
    )

    rows = [
        (1, "a b c d e f g h i j"),
        (2, "x a b c d e f g h y"),  # shares doc 1's 8-gram at pos 1
        (3, "p q r s t u v w p q r s t u v w"),  # self-repeat at pos 8
        (4, "one two three"),  # < k tokens: no grams, kept
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in exact_substring_dedup(df, "doc_id", "text", k=8).collect()
    }
    assert got == _naive_substring_dedup(rows, 8)
    assert got[1] == ("a b c d e f g h i j", 10, 0)  # first occurrence kept
    assert got[2] == ("x y", 10, 8)
    assert got[3] == ("p q r s t u v w", 16, 8)
    assert got[4] == ("one two three", 3, 0)
    assert got[5] == ("", 0, 0)
    assert got[6] == ("", 0, 0)


def test_exact_substring_dedup_vs_naive_fuzz(spark):
    """Deterministic pseudo-random corpus with planted repeats vs the
    pure-Python replay — all rows, all columns."""
    import random

    from merchant_classification_spark.operators.dedup import (
        exact_substring_dedup,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(30):
        n = rng.randint(0, 25)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant verbatim cross-doc runs so the dup path is exercised
    rows[10] = (10, rows[3][1] + " " + rows[5][1])
    rows[20] = (20, "u v " + rows[3][1] + " z")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in exact_substring_dedup(df, "doc_id", "text", k=4).collect()
    }
    assert got == _naive_substring_dedup(rows, 4)
    assert any(v[2] > 0 for v in got.values())  # the dup path actually ran


def test_exact_substring_dedup_validates_k(spark):
    from merchant_classification_spark.operators.dedup import (
        exact_substring_dedup,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        exact_substring_dedup(df, "doc_id", "text", k=1)


def test_lsh_params_s_curve():
    """The S-curve solver picks textbook factorizations: more rows per
    band as the threshold rises, more bands when misses are penalized,
    and the budget is never exceeded."""
    from merchant_classification_spark.operators.dedup import lsh_params

    assert lsh_params(0.5, 64) == (16, 4)
    b_lo, r_lo = lsh_params(0.5, 64)
    b_hi, r_hi = lsh_params(0.9, 64)
    assert r_hi > r_lo and b_hi < b_lo  # steeper curve at high threshold
    # recall bias: penalizing misses moves toward more bands, fewer rows
    b_rec, r_rec = lsh_params(0.9, 64, fn_weight=5.0)
    assert b_rec >= b_hi and r_rec <= r_hi
    for nh in (16, 64, 128):
        b, r = lsh_params(0.7, nh)
        assert 1 <= b * r <= nh
    import pytest as _p

    for bad in (0.0, 1.0, -1.0):
        with _p.raises(ValueError):
            lsh_params(bad)
    with _p.raises(ValueError):
        lsh_params(0.5, 0)
    with _p.raises(ValueError):
        lsh_params(0.5, 64, fn_weight=0.0)


def _aligned_serials(n):
    # the SCALING.md "Adversarial bound" shape: fixed-width keys over a
    # shared 10-char alphabet, digits aligned at the same positions
    return [f"ID{str(i).zfill(12)}" for i in range(n)]


def _aligned_keys(n):
    # the round-5 sf1 adversarial shape: fixed-width keys whose LONG
    # digit region varies but stays position-aligned on a shared
    # 10-char alphabet — true matches are rare, candidates quadratic
    import random

    rnd = random.Random(7)
    return [
        "ID" + "".join(rnd.choice("0123456789") for _ in range(14))
        for _ in range(n)
    ]


def test_edjoin_density_probe_separates_adversarial_from_benign():
    from merchant_classification_spark.operators.dedup import (
        edjoin_density_probe,
    )

    adv = _aligned_keys(1500)
    d2 = edjoin_density_probe(adv, q=2, max_distance=2)
    assert d2 > 0.05  # every prefix gram frequent AND co-banded
    # a larger q over the dense field thins the buckets below threshold
    assert edjoin_density_probe(adv, q=4, max_distance=2) < 0.05


def test_edjoin_autotune_benign_keeps_base_q(spark, tables):
    from merchant_classification_spark.operators.dedup import edjoin_autotune

    assert (
        edjoin_autotune(tables["customer"], "c_custkey", "c_name", 2, q=2)
        == 2
    )


def test_edjoin_autotune_escalates_on_aligned_serials(spark):
    from merchant_classification_spark.operators.dedup import edjoin_autotune

    df = spark.createDataFrame(
        list(enumerate(_aligned_keys(1500))), ["doc_id", "s"]
    )
    q = edjoin_autotune(df, "doc_id", "s", max_distance=2, q=2)
    assert q > 2  # escalated off the dense gram size


def test_edjoin_autotune_warns_when_no_viable_escape(spark):
    import warnings

    from merchant_classification_spark.operators.dedup import edjoin_autotune

    # 7-char aligned serials: q=4,k=2 needs len >= 12, so q cannot
    # escalate — the guard must warn and fall back to the best viable q
    df = spark.createDataFrame(
        [(i, str(i).zfill(7)) for i in range(1200)], ["doc_id", "s"]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        q = edjoin_autotune(df, "doc_id", "s", max_distance=2, q=2)
    assert q == 2
    assert any("candidate-dense" in str(x.message) for x in w)


def test_edit_distance_pairs_auto_guard_output_identical(spark):
    from pyspark.sql import functions as F

    from merchant_classification_spark.operators.dedup import (
        edit_distance_pairs,
    )

    # adversarial-shaped input, small enough to verify naively
    df = spark.createDataFrame(
        list(enumerate(_aligned_serials(300))), ["doc_id", "s"]
    )
    got = {
        (r.id_a, r.id_b): r.edit_dist
        for r in edit_distance_pairs(
            df, "doc_id", "s", max_distance=2, auto_guard=True
        ).collect()
    }
    l = df.select(F.col("doc_id").alias("id_a"), F.col("s").alias("na"))
    r_ = df.select(F.col("doc_id").alias("id_b"), F.col("s").alias("nb"))
    naive = {
        (row.id_a, row.id_b): row.d
        for row in l.crossJoin(r_)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("d", F.levenshtein("na", "nb").cast("long"))
        .where(F.col("d") <= 2)
        .collect()
    }
    assert got == naive and len(naive) > 0


def test_minhash_default_banding_derives_from_solver(spark, tables):
    from merchant_classification_spark.operators.dedup import (
        lsh_params,
        minhash_dedup_pairs,
    )

    docs = tables["documents"]
    b, r = lsh_params(0.6, 64, 2.0)
    assert (b, r) != (16, 4)  # the solver actually moved the default
    auto = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.6)
    # explicit solver banding must reproduce the default exactly; the
    # legacy 16x4 split uses num_hashes // bands, so pin rows via the
    # solver's b where divisible
    got = sorted((x.id_a, x.id_b) for x in auto.collect())
    assert len(got) > 0
    # determinism: the derived default is stable call-to-call
    again = sorted(
        (x.id_a, x.id_b)
        for x in minhash_dedup_pairs(
            docs, "doc_id", "text", threshold=0.6
        ).collect()
    )
    assert got == again


# ---------------------------------------------------------------------------
# cross-source duplication matrix
# ---------------------------------------------------------------------------


def test_dup_pair_source_matrix(spark):
    from merchant_classification_spark.operators.dedup import (
        dup_pair_source_matrix,
    )

    docs = spark.createDataFrame(
        [
            (1, "web"),
            (2, "books"),
            (3, "web"),
            (4, "wiki"),
            (5, "books"),
        ],
        "doc_id int, source string",
    )
    pairs = spark.createDataFrame(
        [
            (1, 2, 0.9),   # web-books
            (2, 3, 0.7),   # books-web  -> same unordered cell
            (1, 3, 0.65),  # web-web
            (4, 5, 0.8),   # books-wiki
        ],
        "id_a int, id_b int, jaccard_sim double",
    )
    got = {
        (r["source_lo"], r["source_hi"]): r
        for r in dup_pair_source_matrix(
            pairs, docs, "doc_id", "source"
        ).collect()
    }
    assert set(got) == {("books", "web"), ("web", "web"), ("books", "wiki")}
    bw = got[("books", "web")]
    assert bw["n_pairs"] == 2
    assert bw["min_sim"] == 0.7 and bw["max_sim"] == 0.9
    ww = got[("web", "web")]
    assert ww["n_pairs"] == 1 and ww["min_sim"] == 0.65
    assert got[("books", "wiki")]["n_pairs"] == 1
