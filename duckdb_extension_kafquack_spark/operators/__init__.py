"""North-star operators (dedup, similarity, text, multimodal) + join helpers.

Importing this package registers their suite entries (see ..suite.REGISTRY).
"""

from . import curation, dedup, events, joins, multimodal, pipeline, similarity, sketch, skew, text  # noqa: F401

from .dedup import (
    containment_pairs,
    connected_components,
    dup_span_coverage,
    exact_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from .similarity import embedding_outliers
from .sketch import (
    bloom_bitmap_words,
    bloom_build,
    bloom_probe,
    bloom_probe_bitmap,
    cms_build,
    cms_estimate,
    kmv_bottomk,
)
from .joins import asof_join, asof_join_pandas, interval_join
from .multimodal import blobs_from_documents, decode_features
from .pipeline import curate
from .similarity import cosine_topk, embedding_near_duplicates, ivf_topk, lsh_topk
from .skew import salted_agg, salted_join
from .text import (
    bigram_surprisal_scores,
    fingerprints,
    language_id,
    ngram_novelty_by_source,
    oov_rates,
    quality_rank_normalized,
    quality_scores,
    source_overlap_matrix,
    tfidf_top_terms,
    token_counts,
    vocabulary,
)

__all__ = [
    "exact_duplicates",
    "minhash_near_duplicates",
    "simhash_signatures",
    "simhash_near_pairs",
    "ngram_jaccard_pairs",
    "connected_components",
    "cosine_topk",
    "lsh_topk",
    "ivf_topk",
    "embedding_near_duplicates",
    "language_id",
    "quality_scores",
    "token_counts",
    "fingerprints",
    "vocabulary",
    "tfidf_top_terms",
    "blobs_from_documents",
    "decode_features",
    "asof_join",
    "asof_join_pandas",
    "interval_join",
    "salted_agg",
    "salted_join",
    "curate",
    "dup_span_coverage",
    "containment_pairs",
    "bloom_bitmap_words",
    "bloom_build",
    "bloom_probe_bitmap",
    "bloom_probe",
    "cms_build",
    "cms_estimate",
    "kmv_bottomk",
    "embedding_outliers",
    "ngram_novelty_by_source",
    "oov_rates",
    "bigram_surprisal_scores",
    "quality_rank_normalized",
    "source_overlap_matrix",
]
