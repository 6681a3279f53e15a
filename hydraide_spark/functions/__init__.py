from ..query.filters import (
    cosine_similarity,
    dot_product,
    geo_column,
    haversine_km,
    l2_norm,
    phrase_column,
)
from .text import (
    fingerprint,
    lang_id,
    quality_score,
    shingles,
    token_count,
    tokenize,
    word_index,
)
from .vector import cosine_topk, lsh_bucket_expr, lsh_topk
from .dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_neardup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
)

__all__ = [
    "cosine_similarity",
    "cosine_topk",
    "dot_product",
    "embedding_neardup_pairs",
    "exact_dedup",
    "fingerprint",
    "geo_column",
    "haversine_km",
    "l2_norm",
    "lang_id",
    "lsh_bucket_expr",
    "lsh_topk",
    "minhash_neardup_pairs",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "phrase_column",
    "quality_score",
    "shingles",
    "simhash64",
    "token_count",
    "tokenize",
    "word_index",
]
