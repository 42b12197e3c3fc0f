"""Training-data pipeline extensions: dedup, similarity, text."""

from iotdatapipeline_spark.analytics.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_set,
)
from iotdatapipeline_spark.analytics.similarity import (
    cosine,
    dot,
    ivf_assign,
    knn_bruteforce,
    l2_norm,
    neardup_pairs,
    sq_l2_distance,
)
from iotdatapipeline_spark.analytics.text import (
    LANG_STOPWORDS,
    TOKEN_REGEX,
    fingerprint,
    langid_pred,
    langid_scores,
    n_tokens,
    n_words,
    simhash16,
    stopword_hits,
    word_shingles,
    words,
)

__all__ = [
    "exact_dedup_groups",
    "jaccard_pairs",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "shingle_set",
    "cosine",
    "dot",
    "ivf_assign",
    "knn_bruteforce",
    "l2_norm",
    "neardup_pairs",
    "sq_l2_distance",
    "LANG_STOPWORDS",
    "TOKEN_REGEX",
    "fingerprint",
    "langid_pred",
    "langid_scores",
    "n_tokens",
    "n_words",
    "simhash16",
    "stopword_hits",
    "word_shingles",
    "words",
]
