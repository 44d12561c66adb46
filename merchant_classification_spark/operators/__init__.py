from merchant_classification_spark.operators.dedup import (
    assign_representatives,
    exact_dedup,
    fingerprint_dedup,
    jaccard,
    minhash_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
    simhash_dedup_pairs,
)
from merchant_classification_spark.operators.grouped_apply import grouped_linear_fit
from merchant_classification_spark.operators.multimodal import (
    decode_image_meta,
    sample_frames,
)
from merchant_classification_spark.operators.relational import (
    accuracy_report,
    class_histogram,
    group_topk,
    histogram_bins,
    percentiles,
)
from merchant_classification_spark.operators.sampling import (
    class_percentile_split,
    hash_percentile,
    hash_sample,
    hash_split,
    stratified_sample,
    with_class_percentile,
)
from merchant_classification_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    hyperplane_signature,
    ivf_topk,
    lsh_topk,
)

__all__ = [
    "accuracy_report",
    "assign_representatives",
    "brute_force_topk",
    "class_histogram",
    "class_percentile_split",
    "hash_percentile",
    "hash_sample",
    "hash_split",
    "decode_image_meta",
    "embedding_neardup_pairs",
    "exact_dedup",
    "fingerprint_dedup",
    "group_topk",
    "grouped_linear_fit",
    "histogram_bins",
    "hyperplane_signature",
    "ivf_topk",
    "jaccard",
    "lsh_topk",
    "minhash_candidate_pairs",
    "minhash_dedup_pairs",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "percentiles",
    "sample_frames",
    "shingles",
    "simhash64",
    "simhash_dedup_pairs",
    "stratified_sample",
    "with_class_percentile",
]
