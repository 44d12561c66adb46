"""Property-based fuzzing (hypothesis) for the lossless-pruning operators.

Each property compares the pruned operator against its naive definition on
randomized inputs — the strongest possible check that the blocking filters
(q-gram prefix, length band; chunk arithmetic) never drop or invent rows.
One Spark job per example is slow, so each property runs a small number of
maximally-nasty examples (short strings, repeated grams, shared prefixes).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# alphabets chosen to force gram collisions and shared prefixes
_word = st.text(alphabet="ab0", min_size=0, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=6).map(" ".join)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(names=st.lists(st.text(alphabet="ab01", min_size=0, max_size=7), min_size=2, max_size=8))
def test_edit_distance_pairs_always_matches_naive(spark, names):
    from merchant_classification_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(list(enumerate(names)), ["doc_id", "s"])
    got = {
        (r.id_a, r.id_b, r.edit_dist)
        for r in edit_distance_pairs(df, "doc_id", "s", max_distance=1).collect()
    }
    l = df.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    r_ = df.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    naive = {
        (row.id_a, row.id_b, row.d)
        for row in l.crossJoin(r_)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("d", F.levenshtein("sa", "sb").cast("long"))
        .where(F.col("d") <= 1)
        .collect()
    }
    assert got == naive


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=2, max_size=7),
    threshold=st.sampled_from([0.34, 0.5, 0.75]),
)
def test_ngram_jaccard_pairs_always_matches_naive(spark, docs, threshold):
    """PPJoin prefix + length pruning is lossless: output pairs equal the
    naive all-pairs exact Jaccard over the same shingle sets."""
    from merchant_classification_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingles,
    )

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=threshold, shingle_size=2, max_df=None
        ).collect()
    }
    sets = {
        r.doc_id: set(r.sh)
        for r in df.select(
            "doc_id", shingles(F.col("text"), 2).alias("sh")
        ).collect()
    }
    naive = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            u = sets[a] | sets[b]
            j = len(sets[a] & sets[b]) / len(u) if u else 0.0
            if j >= threshold:
                naive[(a, b)] = j
    assert got == naive


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=8),
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=0, max_size=10
    ),
)
def test_assign_representatives_matches_union_find(spark, n, edges):
    """Min-label propagation converges to the connected-component minimum
    for arbitrary graphs (chains, stars, cycles, self-loops)."""
    from merchant_classification_spark.operators.dedup import (
        assign_representatives,
    )

    edges = [(a % n, b % n) for a, b in edges]
    ids_df = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs_df = spark.createDataFrame(
        edges or [(0, 0)], ["id_a", "id_b"]
    )  # (0,0) self-loop = no-op edge for the empty case
    got = {
        r.doc_id: r.rep
        for r in assign_representatives(ids_df, pairs_df, max_iterations=16).collect()
    }
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: min(j for j in range(n) if find(j) == find(i)) for i in range(n)}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=1, max_size=5),
    window=st.integers(min_value=1, max_value=5),
    stride=st.integers(min_value=1, max_value=5),
)
def test_chunking_invariants(spark, docs, window, stride):
    from merchant_classification_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    rows = chunk_documents(df, "doc_id", "text", window=window, stride=stride).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        n = chunks[0].n_tokens
        # chunk ids contiguous from 0; starts follow the stride grid
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.start_token == c.chunk_id * stride + 1
            assert c.start_token <= n  # never an empty chunk past the end
            assert 1 <= c.n_chunk_tokens <= window
            # each chunk is as long as the document allows
            assert c.start_token + c.n_chunk_tokens - 1 == min(
                c.start_token + window - 1, n
            )
            # re-splitting the chunk text yields exactly its token count
            assert len(c.chunk_text.split(" ")) == c.n_chunk_tokens
        # chunk count is minimal: one more stride step would start past
        # the end OR the last chunk already reaches the end
        last = chunks[-1]
        assert (
            last.start_token + last.n_chunk_tokens - 1 == n
            or last.start_token + stride > n
        )
        # overlapping/contiguous strides must cover the whole document
        if stride <= window:
            assert last.start_token + last.n_chunk_tokens - 1 == n


# ---------------------------------------------------------------------------
# maintenance operators: diff/merge round-trip and dense-id fuzz
# ---------------------------------------------------------------------------

_cell = st.one_of(st.none(), st.text(alphabet="xyz", min_size=0, max_size=2))
_table = st.dictionaries(
    st.integers(min_value=0, max_value=9), _cell, min_size=0, max_size=8
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=_table, new=_table)
def test_snapshot_diff_merge_roundtrip_fuzz(spark, old, new):
    """For ANY pair of snapshots (nullable values, disjoint/overlapping
    keys): applying diff's upserts+deletes to `old` reproduces `new`."""
    from merchant_classification_spark.operators.maintenance import (
        merge_upsert,
        snapshot_diff,
    )

    schema = "k: long, v: string"
    old_df = spark.createDataFrame(sorted(old.items()), schema)
    new_df = spark.createDataFrame(sorted(new.items()), schema)
    diff = snapshot_diff(old_df, new_df, "k")
    # merge_upsert's coalesce keeps the target value on NULL updates, so
    # value→NULL transitions must apply as delete+insert; the general
    # rebuild therefore replaces every changed key outright:
    changed = diff.select("k")
    survivors = old_df.join(changed, "k", "left_anti")
    replacements = diff.where(F.col("change_type") != "delete").select("k", "v")
    rebuilt = survivors.unionByName(replacements)
    assert {(r.k, r.v) for r in rebuilt.collect()} == set(new.items())
    # and the classifications themselves are definitionally right
    for row in diff.collect():
        if row.change_type == "insert":
            assert row.k not in old and row.k in new
        elif row.change_type == "delete":
            assert row.k in old and row.k not in new
        else:
            assert old[row.k] != new[row.k]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=30
    )
)
def test_dense_ids_fuzz_matches_sort_order(spark, vals):
    """Dense ids equal the position in the sorted (val, tiebreak) order
    for ANY distribution — duplicates, negatives, single bucket."""
    from merchant_classification_spark.operators.ids import dense_ids

    rows = list(enumerate(vals))  # (tiebreak, val)
    df = spark.createDataFrame([(v, i) for i, v in rows], "v: long, t: long")
    out = dense_ids(df, ["v", "t"], buckets=4)
    got = [(r.v, r.t) for r in out.orderBy("dense_id").collect()]
    assert got == sorted((v, i) for i, v in rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=1, max_size=7),
    span=st.sampled_from([1, 2, 3]),
    min_docs=st.sampled_from([2, 3]),
)
def test_remove_boilerplate_matches_naive(spark, docs, span, min_docs):
    """The hashed span-frequency scrub equals the naive Python
    definition: segment every doc into fixed spans, count distinct-doc
    frequency, drop spans at/above the threshold, reassemble in order."""
    from collections import Counter

    from merchant_classification_spark.operators.dedup import remove_boilerplate

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.clean_text, r.n_spans, r.n_removed)
        for r in remove_boilerplate(
            df, "doc_id", "text", span_tokens=span, min_docs=min_docs
        ).collect()
    }

    def segment(text):
        toks = [t for t in text.lower().split() if t]
        return [
            " ".join(toks[i : i + span]) for i in range(0, len(toks), span)
        ]

    seg = {i: segment(t) for i, t in rows}
    freq = Counter()
    for spans in seg.values():
        for s_ in set(spans):
            freq[s_] += 1
    for i, spans in seg.items():
        kept = [s_ for s_ in spans if freq[s_] < min_docs]
        assert got[i] == (
            " ".join(kept),
            len(spans),
            len(spans) - len(kept),
        ), (i, spans)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(
        st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=12,
    ),
    k=st.sampled_from([1, 3, 8]),
    salt=st.sampled_from(["", "a", "z9"]),
)
def test_weighted_hash_sample_fuzz_matches_replay(spark, weights, k, salt):
    import hashlib

    from merchant_classification_spark.operators.sampling import (
        weighted_hash_sample,
    )

    rows = list(enumerate(weights))
    df = spark.createDataFrame(rows, ["id", "w"])
    got = [
        r.id
        for r in weighted_hash_sample(df, ["id"], "w", k, salt=salt)
        .orderBy("sample_rank")
        .collect()
    ]
    keyed = []
    for i, w in rows:
        h = int(hashlib.md5(f"{salt}\x1f{i}".encode()).hexdigest()[:15], 16)
        u = (h % (1 << 54)) / float(1 << 54)
        keyed.append((u ** (1.0 / w), i))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    assert got == [i for _, i in keyed[:k]]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    masses=st.lists(
        st.integers(min_value=1, max_value=1000), min_size=1, max_size=12
    ),
    p=st.sampled_from([0.25, 0.5, 0.9, 1.0]),
)
def test_coverage_select_fuzz_minimal_prefix(spark, masses, p):
    """The kept set is exactly the minimal prefix of the (mass desc,
    item) order whose cumulative mass reaches p of the total."""
    from merchant_classification_spark.operators.relational import coverage_select

    rows = [("g", i, m) for i, m in enumerate(masses)]
    df = spark.createDataFrame(rows, ["g", "item", "m"])
    got = sorted(
        r.item for r in coverage_select(df, ["g"], ["item"], "m", p).collect()
    )
    order = sorted(rows, key=lambda r: (-r[2], r[1]))
    total = sum(masses)
    kept, cum = [], 0
    for _, i, m in order:
        if cum < p * total:
            kept.append(i)
            cum += m
    assert got == sorted(kept)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
    ),
    bins=st.sampled_from([1, 3, 7]),
)
def test_equidepth_bins_fuzz_balance(spark, vals, bins):
    """Bin sizes differ by at most one, total row count is preserved,
    and boundaries follow the sorted order."""
    from merchant_classification_spark.operators.relational import equidepth_bins

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = equidepth_bins(df, "v", bins, ["id"]).collect()
    sizes = [r.n_rows for r in got]
    assert sum(sizes) == len(vals)
    assert max(sizes) - min(sizes) <= 1
    svals = sorted(vals)
    # reconstruct expected bins from the rank rule
    n = len(vals)
    import collections

    exp = collections.defaultdict(list)
    for rk, v in enumerate(svals):
        exp[rk * bins // n].append(v)
    for r in got:
        assert r.lo == min(exp[r.bin]) and r.hi == max(exp[r.bin])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=50), min_size=1, max_size=14
    ),
    budget=st.sampled_from([30, 100, 400]),
)
def test_budget_mix_fuzz_matches_replay(spark, sizes, budget):
    """budget_mix equals the pure-Python definition: per source, admit
    ids in hash-percentile order while the size sum BEFORE each id is
    under the budget."""
    import hashlib

    rows = [(i, "s%d" % (i % 3), sz) for i, sz in enumerate(sizes)]
    from merchant_classification_spark.operators.sampling import budget_mix

    df = spark.createDataFrame(rows, ["doc_id", "source", "sz"])
    got = {
        (r.source, r.doc_id): (r.cum_size, r.mix_rank)
        for r in budget_mix(
            df, ["doc_id"], "source", "sz", budget, salt="fz"
        ).collect()
    }

    def u(i):
        h = int(hashlib.md5(f"fz\x1f{i}".encode()).hexdigest()[:15], 16)
        return (h % (1 << 54)) / float(1 << 54)

    want = {}
    for src in {r[1] for r in rows}:
        members = sorted(
            (r for r in rows if r[1] == src), key=lambda r: (u(r[0]), r[0])
        )
        cum = 0
        for rank, (i, _, sz) in enumerate(members, start=1):
            if cum < budget:
                want[(src, i)] = (cum + sz, rank)
            cum += sz
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    train=st.lists(_doc, min_size=1, max_size=6),
    ev=st.lists(_doc, min_size=1, max_size=3),
)
def test_remove_contaminated_spans_fuzz_matches_naive(spark, train, ev):
    """Span removal equals the naive Python definition: mark every
    position covered by a ±pad window around an eval-colliding n-gram,
    then emit maximal clean runs."""
    from merchant_classification_spark.operators.decontaminate import (
        remove_contaminated_spans,
    )

    n, pad, minf = 2, 1, 1
    tdf = spark.createDataFrame(list(enumerate(train)), ["doc_id", "text"])
    edf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(ev)], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.frag_id): (r.n_frag_tokens, r.fragment)
        for r in remove_contaminated_spans(
            tdf, edf, "doc_id", "text", n=n, pad=pad, min_fragment_tokens=minf
        ).collect()
    }

    def grams(toks):
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    egrams = set()
    for t in ev:
        egrams |= grams(t.split(" "))
    want = {}
    for i, t in enumerate(train):
        toks = t.split(" ")
        dirty = set()
        for g in range(len(toks) - n + 1):
            if " ".join(toks[g : g + n]) in egrams:
                lo = max(g - pad, 0)
                hi = g + n - 1 + pad
                dirty |= set(range(lo, hi + 1))
        frags, cur = [], []
        for p, tok in enumerate(toks):
            if p in dirty:
                if cur:
                    frags.append(cur)
                cur = []
            else:
                cur.append(tok)
        if cur:
            frags.append(cur)
        fid = 0
        for fr in frags:
            if len(fr) >= minf:
                fid += 1
                want[(i, fid)] = (len(fr), " ".join(fr))
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=1, max_size=8), k=st.sampled_from([2, 3]))
def test_exact_substring_dedup_always_matches_naive(spark, docs, k):
    """First-occurrence-wins substring removal equals the pure-Python
    definition on gram-collision-heavy inputs (3-char alphabet forces
    shared k-grams within and across documents)."""
    from tests.test_dedup import _naive_substring_dedup

    from merchant_classification_spark.operators.dedup import (
        exact_substring_dedup,
    )

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in exact_substring_dedup(df, "doc_id", "text", k=k).collect()
    }
    assert got == _naive_substring_dedup(rows, k)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=1, max_size=8))
def test_dsir_features_match_python(spark, docs):
    """The bound-lambda feature expression equals the plain-Python
    unigram+bigram definition on arbitrary token streams (the expression
    rewrites for performance must never change the feature list)."""
    import re

    from merchant_classification_spark.functions.text_analysis import (
        _dsir_features,
    )

    def feats(s):
        c = re.sub(r"[^a-z0-9']+", " ", (s or "").lower()).strip()
        t = c.split(" ") if c else []
        return t + [f"{a}_{b}" for a, b in zip(t, t[1:])]

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r.doc_id: r.f
        for r in df.select("doc_id", _dsir_features("text").alias("f")).collect()
    }
    assert got == {i: feats(t) for i, t in enumerate(docs)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=0, max_size=8),
    top_k=st.integers(min_value=1, max_value=6),
    top_k2=st.integers(min_value=1, max_value=8),
)
def test_bigram_backoff_fit_matches_pure_python(spark, docs, top_k, top_k2):
    """The round-11 single-pass bigram fit must equal a pure-Python
    replay of the contract on arbitrary corpora: add-one unigram table
    over the top_k tokens (count desc, token asc), bigram table of the
    top_k2 (count desc, pair asc) pairs whose FIRST word is in the
    unigram top-k, scores log(c(w1w2)/c(w1)) — the guard that the
    combined NULL-tagged explode counts exactly what two passes did."""
    import math
    import re
    from collections import Counter

    from merchant_classification_spark.functions.text_analysis import (
        _BIGRAM_SEP,
        bigram_backoff_model,
    )

    def toks(text):
        cleaned = re.sub(r"[^a-z0-9']+", " ", (text or "").lower()).strip()
        return cleaned.split(" ") if cleaned else []

    uni_c: Counter = Counter()
    bi_c: Counter = Counter()
    for d in docs:
        t = toks(d)
        uni_c.update(t)
        bi_c.update(zip(t, t[1:]))
    n_tot, v = sum(uni_c.values()), len(uni_c)
    denom = float(n_tot + v + 1)
    top = sorted(uni_c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    want_uni = [(w, math.log((c + 1) / denom)) for w, c in top]
    prev = dict(top)
    top_bi = sorted(
        ((p, c) for p, c in bi_c.items() if p[0] in prev),
        key=lambda kv: (-kv[1], kv[0]),
    )[:top_k2]
    want_bi = [
        (a + _BIGRAM_SEP + b, math.log(c / prev[a])) for (a, b), c in top_bi
    ]

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)] or [(0, None)],
        "doc_id long, text string",
    )
    uni, bi, oov, la = bigram_backoff_model(
        df, "text", top_k=top_k, top_k2=top_k2, alpha=0.4
    )
    assert uni == want_uni
    assert bi == want_bi
    assert oov == math.log(1.0 / denom)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cuts=st.lists(
        st.integers(min_value=1, max_value=59), min_size=0, max_size=3, unique=True
    ),
    replay=st.integers(min_value=0, max_value=3),
)
def test_pq_index_append_any_split_matches_full_encode(spark, cuts, replay):
    """Incremental-index contract under arbitrary batch splits: cut 60
    vectors at any boundaries, land each slice as its own batch
    partition (replaying one slice again at random — the retry
    hazard), and the merged layout must equal the one-shot encode."""
    import random as _random
    import tempfile

    from merchant_classification_spark.operators.similarity import (
        _fit_pq_codebooks,
        _deterministic_kmeans,
        deterministic_fit_sample,
        pq_encode,
        pq_index_append,
        read_pq_index,
    )

    rng = _random.Random(5)
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fit = deterministic_fit_sample(df, 32)
    coarse = _deterministic_kmeans(fit, 4, 5)
    books = _fit_pq_codebooks(fit, 2, 4, 5)

    bounds = [0] + sorted(cuts) + [60]
    with tempfile.TemporaryDirectory() as index_path:
        from pyspark.sql import functions as F

        slices = list(zip(bounds, bounds[1:]))
        for bid, (lo, hi) in enumerate(slices):
            part = df.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            pq_index_append(part, coarse, books, index_path, batch_id=bid)
        rb = replay % len(slices)
        lo, hi = slices[rb]
        pq_index_append(
            df.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            coarse, books, index_path, batch_id=rb,
        )
        merged = {
            r["vec_id"]: (r["cell"], list(r["codes"]))
            for r in read_pq_index(spark, index_path).collect()
        }
    full = {
        r["vec_id"]: (r["cell"], list(r["codes"]))
        for r in pq_encode(df, coarse, books).collect()
    }
    assert merged == full
