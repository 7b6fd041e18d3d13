from .hashing import stable_hash64, stable_hash_bucket
from .text import tokenize, query_snippet, char_ngrams, token_shingles
from .vectors import dot_product, l2_norm, l2_normalize, cosine_similarity, pad_or_truncate

__all__ = [
    "stable_hash64",
    "stable_hash_bucket",
    "tokenize",
    "query_snippet",
    "char_ngrams",
    "token_shingles",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "cosine_similarity",
    "pad_or_truncate",
]
