"""Arrow-vectorized (pandas_udf) cosine scorer - the Python-side twin of
similarity.brute.

Exists to (a) provide the sanctioned fast Python hot path for scorers
that outgrow SQL expressions (a real reranker/model scorer drops into
``cos_batch``'s slot), and (b) prove the Arrow path is value-correct:
the catalog query using this scorer shares knn_brute_cosine's DuckDB
oracle, so the numpy batch math is held to the same value-hash standard
as the JVM expression (6dp rounding absorbs the last-bit difference
between numpy's SIMD/pairwise summation and a sequential fold).

Plan shape is identical to knn_brute: broadcast 1-row query vector,
one ArrowEvalPython stage over the scan, TakeOrderedAndProject top-k.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..operators.relational import top_k


@lru_cache(maxsize=1)
def cos_batch():
    """Batched cosine over two array columns (one numpy matmul per Arrow
    batch - no per-row Python). Built lazily: pandas_udf registration
    needs an active session."""

    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return pandas_udf(DoubleType())(_cos)


def knn_pandas(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors via the Arrow batch scorer. Columns:
    vec_id, cos_sim (same schema/oracle as knn_brute)."""
    q = emb.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__q"))
    scored = (
        emb.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cos_batch()(F.col(vec_col), F.col("__q")), 6).alias("cos_sim"),
        )
    )
    return top_k(scored, [F.desc("cos_sim"), F.asc("vec_id")], k)
