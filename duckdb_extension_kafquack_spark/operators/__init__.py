"""North-star operators (dedup, similarity, text, multimodal) + join helpers.

Importing this package registers their suite entries (see ..suite.REGISTRY).
"""

from . import dedup, joins, multimodal, pipeline, similarity, skew, text  # noqa: F401

from .dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from .multimodal import blobs_from_documents, decode_features
from .similarity import cosine_topk, embedding_near_duplicates, lsh_topk
from .text import fingerprints, language_id, quality_scores, token_counts

__all__ = [
    "exact_duplicates",
    "minhash_near_duplicates",
    "simhash_signatures",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "lsh_topk",
    "embedding_near_duplicates",
    "language_id",
    "quality_scores",
    "token_counts",
    "fingerprints",
    "blobs_from_documents",
    "decode_features",
]
