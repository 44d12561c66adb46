"""Deduplication operators for 100 TB training-data pipelines.

Four families, cheapest to most semantic:

  * exact        — hash groupBy on the raw content (one shuffle)
  * fingerprint  — groupBy on a canonical token-set fingerprint (one shuffle)
  * MinHash+LSH  — shingle → minhash signature → banded bucket join →
                   exact-Jaccard verify (near-duplicates)
  * SimHash      — 64-bit sign-of-weighted-bit-sums signature; Hamming-ball
                   candidates via band buckets

Everything is native DataFrame code (higher-order functions + xxhash64);
there is no Python in any hot path. Scale shape: signatures are computed
map-side (no shuffle); candidate generation shuffles only (band_hash) keys,
which are near-uniform by construction — LSH is self-salting. The verify
stage re-joins shingle sets only for candidate pairs (tiny vs n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from merchant_classification_spark.functions.text_analysis import tokens


# ---------------------------------------------------------------------------
# exact + fingerprint dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """One row per distinct content: keeper id (min) + duplicate count.

    Scale: a single hash aggregate; with very long content, pre-hash with
    ``xxhash64(content)`` + a 128-bit md5 tiebreak to shrink shuffle bytes.
    """
    return (
        df.groupBy(*content_cols)
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("keep_id", "dup_count")
    )


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Dedup on the order/repetition-invariant token-set fingerprint."""
    from merchant_classification_spark.functions.text_analysis import fingerprint

    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the text (array<string>).

    Texts shorter than n tokens contribute their full token string as the
    single shingle so they can still be compared.
    """
    toks = tokens(col)
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


def minhash_signature(shingle_col: Column | str, num_hashes: int = 64) -> Column:
    """MinHash signature: array<long> of length `num_hashes`.

    Hash family: xxhash64 seeded by the hash index (xxhash64(i, shingle)).
    min over the shingle set per index approximates a random permutation's
    first element — the classic Broder construction, all map-side.
    """
    col = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(col, lambda s: F.xxhash64(i, s))),
    )


def lsh_band_hashes(sig_col: Column | str, bands: int, rows_per_band: int) -> Column:
    """Hash each band (contiguous rows_per_band slice) of the signature:
    array<long> of length `bands`. Two docs sharing ANY band hash are
    candidates; P(candidate) ≈ 1-(1-j^r)^b for Jaccard j.
    """
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(b, F.slice(sig, b * rows_per_band + 1, rows_per_band)),
    )


def jaccard(a: Column | str, b: Column | str) -> Column:
    """Exact Jaccard similarity of two string-array columns (double)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    inter = F.size(F.array_intersect(ca, cb)).cast("double")
    union = F.size(F.array_union(ca, cb)).cast("double")
    return F.when(union == 0.0, F.lit(0.0)).otherwise(inter / union)


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) via banded MinHash LSH,
    carrying both shingle sets for the verify stage.

    Plan shape: map-side signature + band hashes → explode bands (b rows
    per doc) → shuffle on band_hash → self-join within buckets → distinct
    pairs. Band hashes are uniform, so the shuffle has no skew; the
    explode factor is `bands`, constant.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("doc_id"), shingles(text_col, shingle_size).alias("sh")
    ).withColumn("sig", minhash_signature("sh", num_hashes))
    banded = base.select(
        "doc_id",
        "sh",
        F.posexplode(lsh_band_hashes("sig", bands, rows_per_band)).alias(
            "band", "band_hash"
        ),
    )
    left = banded.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh").alias("sh_a"),
        "band",
        "band_hash",
    )
    right = banded.select(
        F.col("doc_id").alias("id_b"),
        F.col("sh").alias("sh_b"),
        "band",
        "band_hash",
    )
    pairs = (
        left.join(right, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_size: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Verified near-duplicate pairs: LSH candidates filtered by EXACT
    n-gram Jaccard ≥ threshold → (id_a, id_b, jaccard_sim)."""
    pairs = minhash_candidate_pairs(
        df, id_col, text_col, shingle_size, num_hashes, bands
    )
    return (
        pairs.withColumn("jaccard_sim", jaccard("sh_a", "sh_b"))
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_size: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for ALL pairs sharing at least one
    shingle (inverted-index join — no LSH approximation, for moderate
    corpora or as ground truth for the MinHash path).

    Scale: explodes shingles (inverted index) and joins on shingle; a
    stopword-like shingle creates a hot key — cap posting-list length by
    filtering the most frequent shingles (df > limit) like a search engine
    drops stopwords.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"), shingles(text_col, shingle_size).alias("sh")
    )
    inv = base.select("doc_id", "sh", F.explode("sh").alias("shingle"))
    # drop ultra-frequent shingles (posting lists > 1000) to bound the join
    freq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_count"))
    inv = inv.join(F.broadcast(freq.where(F.col("df_count") <= 1000)), "shingle")
    l = inv.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"), "shingle")
    r = inv.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"), "shingle")
    pairs = (
        l.join(r, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("jaccard_sim", jaccard("sh_a", "sh_b"))
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )
    return pairs


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash of the token multiset (long).

    Charikar's construction, fully native: per token take xxhash64, add
    +1/-1 to a 64-slot counter array per bit, sign of each slot is the
    output bit. `aggregate` keeps the counter array in registers — one
    pass over tokens, no shuffle.
    """
    toks = tokens(col)
    zero = F.array_repeat(F.lit(0).cast("long"), 64)

    def add_token(acc: Column, t: Column) -> Column:
        h = F.xxhash64(t)
        return F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(63)),
            lambda a, j: a + F.when(F.getbit(h, j) == 1, 1).otherwise(-1),
        )

    counters = F.aggregate(toks, zero, add_token)
    # bit j weight as a literal lookup (1<<63 wraps to long min)
    pow2 = F.array(
        *[F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long") for j in range(64)]
    )
    bits = F.zip_with(
        counters,
        F.sequence(F.lit(1), F.lit(64)),
        lambda c, j: F.when(c > 0, F.element_at(pow2, j)).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a.bitwiseOR(b))


def hamming64(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with SimHash Hamming distance ≤ max_hamming.

    Candidates come from 4×16-bit band buckets (pigeonhole: distance ≤ 3
    guarantees at least one identical band), verified by exact bit_count.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"), simhash64(text_col).alias("sim")
    )
    banded = base.select(
        "doc_id",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sim"), b * 16).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band", "band_val"),
    )
    l = banded.select(
        F.col("doc_id").alias("id_a"), F.col("sim").alias("sim_a"), "band", "band_val"
    )
    r = banded.select(
        F.col("doc_id").alias("id_b"), F.col("sim").alias("sim_b"), "band", "band_val"
    )
    return (
        l.join(r, ["band", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64("sim_a", "sim_b"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# representative assignment (connected components over duplicate pairs)
# ---------------------------------------------------------------------------


def assign_representatives(
    ids: DataFrame, pairs: DataFrame, max_iterations: int = 10
) -> DataFrame:
    """Map every id to its duplicate-cluster representative (min id in the
    connected component) by iterative min-label propagation.

    `ids` must have column `doc_id`; `pairs` columns `id_a`, `id_b`.
    Converges in O(component diameter) joins — duplicate clusters are
    short chains in practice; `max_iterations` bounds pathological chains,
    and convergence is checked each round so typical data stops early.
    """
    edges = (
        pairs.select("id_a", "id_b")
        .union(pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")))
        .distinct()
    )
    labels = ids.select("doc_id", F.col("doc_id").alias("rep"))
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.id_b == labels.doc_id)
            .groupBy("id_a")
            .agg(F.min("rep").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.id_a, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("rep"), F.coalesce(F.col("nmin"), F.col("rep"))
                ).alias("rep"),
            )
        )
        new_labels = new_labels.persist()
        changed = (
            new_labels.join(labels.withColumnRenamed("rep", "old_rep"), "doc_id")
            .where(F.col("rep") != F.col("old_rep"))
            .limit(1)
            .count()
        )
        labels.unpersist() if hasattr(labels, "unpersist") else None
        labels = new_labels
        if changed == 0:
            break
    return labels
