"""Text-analysis operators for training-data pipelines (north-star surface).

Language ID, quality scoring, token counting, and document fingerprinting —
each a pure native-Spark column expression over the `documents` table, so
the whole stage is one codegen'd projection that scales linearly with no
shuffle at all.

Determinism contract: every score is built from integer counts combined in
a FIXED expression order, so Spark and any SQL oracle computing the same
expression produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword sets for the n-gram/stopword-ratio heuristic;
# deliberately small so the oracle SQL can inline them
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "que"),
    "de": ("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"),
}
LANG_ORDER = tuple(LANG_STOPWORDS)  # fixed tie-break order


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the lowercased, punctuation-stripped text.

    NULL-safe: null text behaves as empty text (empty array) so downstream
    dedup/analysis operators never silently drop rows through explode.
    Empty/blank text yields an empty array (split('') would yield ['']).
    """
    safe = F.coalesce(_as_col(col).cast("string"), F.lit(""))
    cleaned = F.trim(F.regexp_replace(F.lower(safe), r"[^a-z0-9']+", " "))
    return F.when(cleaned == "", F.array().cast("array<string>")).otherwise(
        F.split(cleaned, " ")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count (int)."""
    return F.size(tokens(col))


def subword_count(col: Column | str) -> Column:
    """BPE-ish unit count: word fragments of ≤4 chars plus standalone
    punctuation — a deterministic proxy for LLM token counts (int).

    ``\\w{1,4}`` approximates subword pieces; punctuation counts one each.
    """
    return F.regexp_count(_as_col(col), F.lit(r"\w{1,4}|[^\w\s]"))


def stopword_hits(
    col: Column | str, lang: str, tokens_col: Column | None = None
) -> Column:
    """Number of tokens that are stopwords of `lang` (int, with repeats).

    Pass `tokens_col` (a pre-computed ``tokens(...)`` column) when scoring
    several languages over one text — otherwise each call re-tokenizes,
    multiplying the regex cost by the number of languages.
    """
    toks = tokens(col) if tokens_col is None else tokens_col
    stopset = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stopset, t)))


def lang_id(
    col: Column | str,
    tokens_col: Column | None = None,
    hits: dict[str, Column] | None = None,
) -> Column:
    """Heuristic language ID: argmax stopword-hit rate over LANG_ORDER,
    'und' (undetermined) when no stopword of any language appears.

    Pass ``hits`` (lang → already-materialized ``stopword_hits`` column)
    when those counts exist as real columns anyway: referencing them
    keeps each interpreted stopword filter evaluated ONCE — Catalyst's
    CollapseProject declines to inline the non-cheap HOF into its
    multiple use sites here, where inlining the expression directly
    would re-run every filter inside each comparison branch (measured
    2.3× on the lang-profile probe at sf0.1)."""
    toks = tokens(col) if tokens_col is None else tokens_col
    n = F.size(toks)
    if hits is None:
        hits = {
            lang: stopword_hits(col, lang, tokens_col=toks)
            for lang in LANG_ORDER
        }
    best = F.lit("und")
    best_hits = F.lit(0)
    # strict > with in-order iteration: the FIRST language in LANG_ORDER
    # reaching the maximum hit count wins ties
    for lang in LANG_ORDER:
        is_better = hits[lang] > best_hits
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_hits = F.when(is_better, hits[lang]).otherwise(best_hits)
    return F.when(n == 0, F.lit("und")).otherwise(best)


def quality_score(
    col: Column | str, tokens_col: Column | None = None
) -> Column:
    """Document quality in [0,1] from deterministic integer ratios:

        0.4 * clamp(n_tokens/100)            (enough content)
      + 0.3 * (1 - punct_chars/chars)        (not symbol soup)
      + 0.3 * (1 - digit_chars/chars)        (not a number dump)

    All counts are ints; the combination order is fixed, so the double
    result is reproducible bit-for-bit by any engine evaluating the same
    expression. Pass ``tokens_col`` to reuse an existing tokenization
    (otherwise this re-tokenizes for the content term).
    """
    c = _as_col(col)
    n_chars = F.length(c)
    n_tok = (
        F.size(tokens_col) if tokens_col is not None else token_count(col)
    ).cast("double")
    punct = F.length(F.regexp_replace(c, r"[\w\s]+", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]+", ""))
    content = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    safe_chars = F.when(n_chars == 0, F.lit(1)).otherwise(n_chars).cast("double")
    punct_term = F.lit(1.0) - punct.cast("double") / safe_chars
    digit_term = F.lit(1.0) - digits.cast("double") / safe_chars
    return (
        F.lit(0.4) * content + F.lit(0.3) * punct_term + F.lit(0.3) * digit_term
    )


def bigrams(tokens_col: Column) -> Column:
    """Adjacent token bigrams WITH repeats (array<string>) — unlike
    ``dedup.shingles`` this keeps duplicates, because repetition counting
    is the point. Empty array for texts of < 2 tokens.

    The token array is bound through a one-element-array lambda (same
    pattern as ``dedup.shingles``): a raw ``tokens(col)`` argument would
    otherwise be inlined by CollapseProject into every ``element_at`` of
    the position lambda — O(tokens) re-tokenizations per row.
    """

    def _bg(t: Column) -> Column:
        n = F.size(t)
        return F.when(n < 2, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ),
            )
        )

    return F.element_at(F.transform(F.array(tokens_col), _bg), 1)


def top_count(arr: Column) -> Column:
    """Highest occurrence count of any element in the array (int; null
    for empty arrays).

    Sort + one run-length scan: O(n log n) per row inside codegen, vs the
    naive distinct×filter formulation which is O(n·distinct) — quadratic
    on high-diversity documents (the common case in a web corpus). `arr`
    must be a plain column reference (pre-materialize expensive exprs).
    """
    srt = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.when(
        F.size(arr) > 0, F.aggregate(srt, init, step, lambda acc: acc["best"])
    )


def repetition_scores(
    df, text_col: str, id_col: str = "doc_id"
):
    """Gopher-style repetition quality signals per document:

      * ``distinct_ratio``    — distinct tokens / tokens (low = repetitive)
      * ``top_token_share``   — most frequent token's share of all tokens
      * ``top_bigram_share``  — most frequent bigram's share of all bigrams

    All ratios are exact integer divisions in a fixed order (bit-exact in
    any engine); degenerate docs (0 tokens / <2 tokens) yield NULLs.
    One shuffle-free codegen projection; tokenize-once via materialized
    columns.
    """
    t = tokens(F.col(text_col))
    out = (
        df.select(F.col(id_col), t.alias("_t"))
        .withColumn("_bg", bigrams(F.col("_t")))
        .select(
            id_col,
            F.size("_t").alias("n_tokens"),
            F.size(F.array_distinct("_t")).alias("n_distinct"),
            top_count(F.col("_t")).alias("_topt"),
            F.size("_bg").alias("_nbg"),
            top_count(F.col("_bg")).alias("_topbg"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_distinct",
            F.when(
                F.col("n_tokens") > 0, F.col("n_distinct") / F.col("n_tokens")
            ).alias("distinct_ratio"),
            F.when(F.col("n_tokens") > 0, F.col("_topt") / F.col("n_tokens")).alias(
                "top_token_share"
            ),
            F.when(F.col("_nbg") > 0, F.col("_topbg") / F.col("_nbg")).alias(
                "top_bigram_share"
            ),
        )
    )
    return out


def fingerprint(col: Column | str) -> Column:
    """Canonical content fingerprint: md5 over the sorted distinct token
    set — invariant to token order and repetition, so permuted/near-
    boilerplate duplicates collide. Portable across engines (md5 is md5).
    """
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col))))
    return F.md5(canon)
