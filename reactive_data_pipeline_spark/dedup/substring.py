"""Substring-level duplication analysis: which TOKEN SPANS of each
document are duplicated elsewhere in the corpus.

Document-level dedup (exact.py / minhash.py) removes whole near-copies;
the remaining corpus still carries repeated boilerplate *inside*
otherwise-unique documents (headers, license blocks, navigation text).
The published remedy (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better") removes substrings that occur more than
once in the corpus. The exact suffix-array construction is a
single-machine algorithm; the distributable form used here is its
fixed-n approximation: a token n-gram occurring under more than
``min_count`` distinct starts marks all ``n`` positions it covers as
duplicated, and per-document coverage is the union length of those
(overlapping) intervals.

Scale shape (the whole point of the fixed-n form):

1. explode each doc into (pos, md5(gram)) starts — the md5 caps the
   shuffle key at 32 bytes regardless of gram text length (same
   fingerprint-not-text rule as exact.py);
2. ONE exchange keyed on the gram fingerprint: a count-over-window
   marks duplicated starts without a separate aggregate+join;
3. ONE exchange keyed on doc_id: interval union via the classic
   sorted-starts rule — each marked start contributes
   ``min(n, pos - prev_marked_pos)`` covered tokens — then one
   per-doc aggregate (partial map-side).

No self-join, no all-pairs anything: cost is O(total tokens) rows
through two token-scale keyed exchanges; the final join-back of the
per-doc coverage onto the per-doc totals moves one row per document
(metadata-sized, not token-sized). Gram-frequency skew (a boilerplate
gram repeated millions of times) is bounded because the count window
only needs the per-key count, which AQE handles with skew-split;
positions never join against positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def duplicated_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-substring report:

    ``(doc_id, n_tokens, n_dup_starts, dup_covered_tokens, dup_ratio)``

    where a "dup start" is a position whose n-gram occurs at
    ``>= min_count`` starts corpus-wide and ``dup_covered_tokens`` is
    the union length of the n-token intervals those starts cover."""
    if n < 1 or min_count < 2:
        raise ValueError("need n >= 1 and min_count >= 2")
    t = docs.select(F.col(id_col), tokens(text_col).alias("__t"))
    per_doc = t.select(id_col, F.size("__t").alias("n_tokens"))
    # Filter BEFORE the explode: sequence(a, b) with b < a generates a
    # descending range, so short docs must never reach it.
    starts = (
        t.filter(F.size("__t") >= n)
        .select(
            id_col,
            F.size("__t").alias("n_tokens"),
            F.explode(F.sequence(F.lit(1), F.size("__t") - (n - 1))).alias("pos"),
            F.col("__t").alias("__toks"),
        )
    )
    keyed = starts.select(
        id_col,
        "n_tokens",
        "pos",
        F.md5(F.concat_ws(" ", F.slice("__toks", F.col("pos"), n))).alias("__gk"),
    )
    cnt_w = Window.partitionBy("__gk")
    marked = keyed.withColumn("__c", F.count(F.lit(1)).over(cnt_w)).filter(
        F.col("__c") >= min_count
    )
    seq_w = Window.partitionBy(id_col).orderBy("pos")
    contrib = F.least(
        F.lit(n), F.col("pos") - F.coalesce(F.lag("pos").over(seq_w), F.col("pos") - n)
    )
    covered = (
        marked.withColumn("__contrib", contrib)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_dup_starts"),
            F.sum("__contrib").cast("long").alias("dup_covered_tokens"),
        )
    )
    # Both sides are doc_id-keyed aggregates, so the join reuses their
    # hash partitioning - no third exchange.
    return (
        per_doc.join(covered, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_dup_starts", F.lit(0)).cast("long").alias("n_dup_starts"),
            F.coalesce("dup_covered_tokens", F.lit(0))
            .cast("long")
            .alias("dup_covered_tokens"),
            F.round(
                F.coalesce("dup_covered_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
    )
