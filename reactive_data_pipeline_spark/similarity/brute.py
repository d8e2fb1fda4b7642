"""Brute-force cosine top-k (exact ANN baseline).

The query vector rides along as a broadcast single-row DataFrame (no
driver collect), cosine is a JVM higher-order-function expression, and
the top-k plans as TakeOrderedAndProject - so the full scan is one pass,
embarrassingly parallel, with k rows per partition surviving to the
merge. This is the correct *exact* shape at any scale; LSH (similarity.
lsh) trades recall for scan fraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..operators.relational import top_k


def knn_brute(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k most-cosine-similar rows to the row with ``query_id``
    (excluded from results). Columns: vec_id, cos_sim."""
    q = emb.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__q"))
    scored = (
        emb.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine(vec_col, "__q"), 6).alias("cos_sim"),
        )
    )
    return top_k(scored, [F.desc("cos_sim"), F.asc("vec_id")], k)
