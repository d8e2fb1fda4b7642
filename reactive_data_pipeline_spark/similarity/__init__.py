"""Similarity search over embedding columns (SURVEY.md section 7.5):
brute-force cosine top-k as the exact baseline, hyperplane-LSH bucketed
search as the scale path."""

from .brute import knn_brute
from .lsh import hyperplanes, with_lsh_bucket, knn_lsh

__all__ = ["knn_brute", "hyperplanes", "with_lsh_bucket", "knn_lsh"]
