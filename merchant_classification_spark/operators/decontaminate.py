"""Train/eval n-gram decontamination — LLM-training-data hygiene.

The standard pre-training hygiene step (popularized by the GPT-3 paper's
13-gram eval-overlap filter): any training document sharing at least one
word n-gram with a held-out evaluation set is flagged (and typically
dropped) so downstream eval numbers aren't inflated by memorized leakage.

The reference repo has no equivalent (it is a classification pipeline);
this operator belongs to the engine's beyond-reference corpus toolkit
alongside `operators/dedup.py`.

Scale shape (the 100 TB story):
  * each side is reduced to DISTINCT word n-grams per document map-side
    (split → slice → concat_ws → array_distinct), so the shuffle carries
    one row per distinct gram, never per token;
  * grams are equi-join keys — one hash shuffle on the gram string (or
    its xxhash64 when `hash_grams`), no cross product anywhere;
  * the eval side is usually tiny (benchmarks, test sets) and gets
    `F.broadcast`, making the whole operator a map-side semi-join over
    the training corpus;
  * output is per-document overlap counts, so the final aggregate
    shuffles (doc_id) — bounded by the contaminated subset only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(text_col: Column | str, n: int) -> Column:
    """Distinct space-joined word n-grams (array<string>) of a text column.

    Documents with fewer than ``n`` whitespace tokens produce an empty
    array — too short to carry an n-gram, hence never contaminated.
    The token array is bound through a one-element-array lambda so it is
    tokenized once per row, not once per gram position (the Catalyst
    higher-order-function inlining trap — see `dedup.shingles`).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col

    def grams(t: Column) -> Column:
        k = F.size(t) - (n - 1)
        return F.when(k >= 1, F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            )
        )).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(F.split(c, " ")), grams), 1)


def ngram_overlap_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    broadcast_eval: bool = True,
    hash_grams: bool = False,
) -> DataFrame:
    """Per-training-document eval-overlap counts.

    Returns (id_col, n_overlap) for every training document that shares
    ≥1 distinct word ``n``-gram with ANY eval document; clean documents
    are absent. ``n_overlap`` counts the document's distinct
    contaminated grams — a leakage-severity signal (1 shared 5-gram is
    usually a collision; 50 means the eval answer is verbatim inside).

    ``hash_grams=True`` joins on xxhash64(gram) instead of the gram
    string — 8-byte shuffle keys instead of ~6-word strings; the
    standard trade at corpus scale (a 64-bit collision flags one extra
    doc, it never unflags one).
    """
    key = (
        (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: c)
    )
    t_grams = train.select(
        F.col(id_col),
        F.explode(word_ngrams(text_col, n)).alias("gram"),
    ).select(id_col, key(F.col("gram")).alias("gram"))
    e_grams = (
        eval_df.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .select(key(F.col("gram")).alias("gram"))
        .distinct()
    )
    if broadcast_eval:
        e_grams = F.broadcast(e_grams)
    return (
        t_grams.join(e_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    broadcast_eval: bool = True,
    hash_grams: bool = True,
) -> DataFrame:
    """Drop every training document sharing an ``n``-gram with the eval
    set; returns the surviving training rows (all original columns).

    Left-anti join on the flagged ids — one extra shuffle on ``id_col``
    bounded by the contaminated subset.
    """
    flagged = ngram_overlap_report(
        train,
        eval_df,
        id_col,
        text_col,
        n=n,
        broadcast_eval=broadcast_eval,
        hash_grams=hash_grams,
    ).select(id_col)
    return train.join(flagged, id_col, "left_anti")
