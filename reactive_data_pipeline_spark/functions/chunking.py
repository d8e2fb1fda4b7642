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
  The DEFAULT packs within ``num_buckets`` deterministic hash-residue
  buckets (every bucket sorts and packs independently, one keyed
  exchange) and composes a globally-unique
  ``bin_id = local_bin * num_buckets + bucket`` - so the plan scales
  out instead of serializing the whole corpus through a single
  unpartitioned ``WindowExec`` (the ``num_buckets=None`` opt-in keeps
  that global form for tiny correctness fixtures only).
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
    num_buckets: int | None = 32,
    bucket_col: Column | None = None,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tok_col: str = "n_tokens",
    keep_bucket: bool = False,
) -> DataFrame:
    """Add ``bin_id``: floor(running token count before this chunk /
    bin_tokens) over a deterministic (doc_id, chunk_idx) order WITHIN a
    deterministic hash-residue bucket.

    Default semantics (``num_buckets=B``): each chunk lands in bucket
    ``pmod(doc_id, B)``; each bucket independently sorts its chunks by
    (doc_id, chunk_idx) and runs the running-sum rule to get a
    ``local_bin``; the emitted ``bin_id = local_bin * B + bucket`` is
    globally unique (bucket < B) without needing any bound on bins per
    bucket. The physical plan is ONE keyed exchange on the bucket plus a
    per-partition sort - every executor packs its residue class in
    parallel, which is the shape that survives a 100 TB corpus. The
    trade is per-bucket instead of corpus-global chunk adjacency and up
    to B partially-filled tail bins - noise at scale, and the rule stays
    exactly reproducible in any engine (the DuckDB oracles compute the
    same residue + window).

    ``bucket_col`` overrides the bucket expression - in production with
    string or skewed ids pass e.g. ``F.pmod(F.xxhash64(id_col), B)``
    (engine-specific hash, so the modulo default is what the
    cross-engine oracles pin).

    ``num_buckets=None`` opts into the legacy corpus-global ordered
    window (single-partition ``WindowExec`` - correctness fixtures
    only, never production).

    ``keep_bucket=True`` exposes the bucket as a ``bucket`` column so
    downstream aggregations that decompose by bucket (e.g. the shard
    manifest, when the shard count divides ``num_buckets``) can run
    inside the window's existing hash partitioning instead of
    re-shuffling the chunk set."""
    order = [F.col(id_col), F.col(idx_col)]
    if num_buckets is None:
        w = Window.orderBy(*order)
        before = F.coalesce(
            F.sum(tok_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        return chunks.withColumn(
            "bin_id", F.floor(before / F.lit(bin_tokens)).cast("long")
        )
    bucket = (
        bucket_col
        if bucket_col is not None
        else F.pmod(F.col(id_col).cast("long"), F.lit(num_buckets))
    )
    bucketed = chunks.withColumn("__bucket", bucket.cast("long"))
    w = Window.partitionBy("__bucket").orderBy(*order)
    before = F.coalesce(
        F.sum(tok_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    local_bin = F.floor(before / F.lit(bin_tokens))
    packed = bucketed.withColumn(
        "bin_id",
        (local_bin * F.lit(num_buckets) + F.col("__bucket")).cast("long"),
    )
    if keep_bucket:
        return packed.withColumnRenamed("__bucket", "bucket")
    return packed.drop("__bucket")
