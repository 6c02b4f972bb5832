from .text import (
    norm_text,
    token_count,
    fingerprint_md5,
    prefix_fingerprint,
    quality_score,
    lang_id,
    tfidf_top_terms,
)
from .dedup import (
    connected_components,
    exact_dedup_groups,
    shingles,
    jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
)
from .similarity import (
    cosine_topk,
    embed_neardup_pairs,
    ivf_ann_topk,
    kmeans_centroids,
    lsh_ann_topk,
)

__all__ = [
    "connected_components",
    "norm_text",
    "token_count",
    "fingerprint_md5",
    "prefix_fingerprint",
    "quality_score",
    "lang_id",
    "tfidf_top_terms",
    "exact_dedup_groups",
    "shingles",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "cosine_topk",
    "embed_neardup_pairs",
    "ivf_ann_topk",
    "lsh_ann_topk",
]
