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


def knn_batch(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k per query for a whole query SET - the realistic batch
    retrieval workload (a single-query top-k is the degenerate case).

    Columns: query_id, vec_id, cos_sim, rank (1..k per query_id, total
    order: cos desc, vec_id asc).

    Shape at scale: the query set broadcasts (query batches are KBs-MBs
    against a TB corpus), every corpus partition scores all queries
    locally (BroadcastNestedLoopJoin - a *deliberate* one: it IS the
    dense score matrix, linear in corpus x queries with zero corpus
    shuffle), then one exchange keyed query_id ranks the per-query
    top-k. The shuffle carries only (query, candidate, score) triples -
    never vectors. For huge query sets, chunk the queries and union, or
    move to the bucketed LSH/IVF paths (similarity.lsh / similarity.ivf)
    which prune candidates before scoring."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q")
    )
    scored = (
        emb.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("vec_id"),
            F.round(cosine(vec_col, "__q"), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
