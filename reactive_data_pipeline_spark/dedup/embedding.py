"""Embedding-cosine near-duplicate pairs.

Exact mode compares all pairs (broadcast-nested-loop on ``id_a < id_b``)
with norms computed once per row - correct at correctness-harness scale
and the oracle-checkable ground truth. The scale path is
``similarity.lsh``'s hyperplane bucketing: same verification, candidates
from an equi join on the bucket key instead of all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm
from ..operators.relational import ensure_parallelism


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (vec_a < vec_b) with cosine >= threshold.

    Columns: vec_a, vec_b, cos_sim (rounded 6dp).
    """
    # The non-broadcast side's partition count is the parallelism of the
    # nested-loop join; a single-file input must not serialize N^2/2 dot
    # products onto one core.
    emb = ensure_parallelism(emb)
    sides = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), l2_norm(vec_col).alias("nrm")
    )
    a = sides.select(F.col("id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = sides.select(F.col("id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = dot("va", "vb") / (F.col("na") * F.col("nb"))
    return pairs.filter(cos >= threshold).select(
        "vec_a", "vec_b", F.round(cos, 6).alias("cos_sim")
    )
