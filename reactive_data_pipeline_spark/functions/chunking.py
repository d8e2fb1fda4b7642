"""Document chunking + sequence packing - the text-side operators a
training-data pipeline runs after dedup/quality filtering (SURVEY.md
section 7.5 family).

* :func:`chunk_documents` - split each document into fixed-size token
  windows with overlap (1 -> N rows, pure JVM: tokens -> slice indexes
  via ``sequence`` -> explode). The chunk is re-joined to text so the
  output is directly trainable.
* :func:`pack_bins` - assign chunks to training bins of ~``bin_tokens``
  tokens with a deterministic running-sum rule: bin = floor(cumulative
  tokens before this chunk / bin_tokens) within an ordered partition.
  This is the distributable form of sequence packing - exact first-fit
  is inherently sequential, while the running-sum rule is a window
  function (one sort per partition key) with a bounded overflow per bin
  (< max chunk size), which is the standard large-scale compromise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text): overlapping token
    windows; stride = chunk_tokens - overlap; last partial window kept."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    with_t = docs.select(F.col(id_col), tokens(text_col).alias("__t"))
    n_chunks = F.greatest(
        F.ceil((F.size("__t") - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    exploded = with_t.select(
        id_col,
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        F.col("__t").alias("__toks"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens)
    return exploded.select(
        id_col,
        "chunk_idx",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def pack_bins(
    chunks: DataFrame,
    bin_tokens: int = 128,
    part_col: Column | None = None,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tok_col: str = "n_tokens",
) -> DataFrame:
    """Add ``bin_id``: floor(running token count before this chunk /
    bin_tokens) over a deterministic (doc_id, chunk_idx) order.

    ``part_col`` optionally partitions the packing (e.g. by a hash bucket
    so each executor packs independently at scale; default packs the
    whole frame as one ordered sequence - fine for correctness tests,
    partition it in production)."""
    order = [F.col(id_col), F.col(idx_col)]
    w = (
        Window.partitionBy(part_col).orderBy(*order)
        if part_col is not None
        else Window.orderBy(*order)
    )
    before = F.coalesce(
        F.sum(tok_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return chunks.withColumn(
        "bin_id", F.floor(before / F.lit(bin_tokens)).cast("long")
    )
