"""Deduplication operators for training-data pipelines (SURVEY.md
section 7.5): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup. All pure DataFrame compositions - shuffles on
hash keys, no Python in the hot path - so they scale with executors.
"""

from .exact import exact_dedup_groups, dedup_documents
from .ngram import token_ngrams, ngram_jaccard_pairs, exact_neardup_groups
from .minhash import minhash_signatures, minhash_lsh_pairs, minhash_neardup_groups
from .simhash import simhash_docs, simhash_near_pairs
from .embedding import embedding_neardup_lsh, embedding_neardup_pairs
from .components import connected_components, neardup_groups
from .substring import duplicated_ngram_spans

__all__ = [
    "duplicated_ngram_spans",
    "connected_components",
    "neardup_groups",
    "exact_dedup_groups",
    "dedup_documents",
    "token_ngrams",
    "ngram_jaccard_pairs",
    "exact_neardup_groups",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_neardup_groups",
    "simhash_docs",
    "simhash_near_pairs",
    "embedding_neardup_lsh",
    "embedding_neardup_pairs",
]
