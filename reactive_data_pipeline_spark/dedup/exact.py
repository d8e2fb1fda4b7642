"""Exact deduplication by normalized-content hash.

Scale shape: one shuffle on the normalized text (hash partitioning);
map-side partial aggregation collapses per-partition duplicates before
the exchange. At 100 TB you'd group on the md5/xxhash of the text rather
than the text itself to cap shuffle width - both are exposed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, normalize_ws


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized content: deterministic keeper
    (min id), copy count, and content fingerprint."""
    return (
        docs.select(F.col(id_col), normalize_ws(text_col).alias("__norm"))
        .groupBy("__norm")
        .agg(F.min(id_col).alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keeper_doc_id", "n_copies", F.md5(F.col("__norm")).alias("fingerprint"))
    )


def dedup_documents(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly the keeper row per content group (semi join back on
    the deterministic min-id keeper - unlike dropDuplicates, stable across
    runs and partitionings)."""
    keepers = (
        docs.select(F.col(id_col), normalize_ws(text_col).alias("__norm"))
        .groupBy("__norm")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(keepers, id_col, "left_semi")
