"""Corpus-curation operators a training-data pipeline runs before
training: benchmark-contamination checking, stratified domain mixing,
and PII scrubbing (SURVEY.md section 7.5 family, rounding out the
quality/dedup/chunking set).

Scale shapes:

* contamination - the benchmark/eval set is tiny next to the training
  corpus (MBs vs TBs), so its distinct gram set BROADCASTS and the
  check is a narrow map-side join over the exploded corpus grams: no
  wide shuffle of the corpus, linear in corpus grams.
* domain mixing - pure per-row predicate (deterministic hash residue
  against a per-stratum target rate joined from a broadcast dim); no
  shuffle at all until the caller aggregates.
* PII scrub - per-row regexp_replace, whole-stage codegen, linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dedup.ngram import token_ngrams


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram overlap with a benchmark/eval corpus - the
    standard decontamination primitive (drop or flag training docs that
    leak eval data).

    Returns (doc_id, n_grams, n_contaminated, contamination_ratio) for
    every training doc that has at least one n-gram (docs shorter than
    ``n`` tokens carry no signal and are dropped by the explode on both
    engines). The benchmark side is reduced to its DISTINCT gram set
    and broadcast: eval suites are small by construction, so the
    corpus-side scan never shuffles.
    """
    bench_grams = (
        benchmark.select(F.explode(token_ngrams(text_col, n)).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus = docs.select(
        F.col(id_col), F.explode(token_ngrams(text_col, n)).alias("gram")
    )
    return (
        corpus.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_grams",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_grams"), 6).alias(
                "contamination_ratio"
            ),
        )
    )


def stratified_keep(
    df: DataFrame,
    rate: Column,
    key: Column | str,
    modulus: int = 1000,
) -> Column:
    """Deterministic keep-predicate for stratified down-sampling: keep a
    row iff ``hash_residue(key) < rate * modulus``.

    The residue is a fixed multiplicative hash of the key - reproducible
    across engines, runs, and partitionings (unlike ``sample()``), so a
    re-run selects the identical subset: required for resumable corpus
    builds. ``rate`` may be any per-row expression (typically joined
    from a broadcast per-domain weights dim)."""
    residue = (F.col(key) if isinstance(key, str) else key) * F.lit(1000003) % F.lit(
        modulus
    )
    return residue < rate * modulus


def scrub_digit_runs(col: Column | str, replacement: str = "<ID>") -> Column:
    """Mask every digit run (account numbers, phone-shaped tokens) with
    ``replacement`` - the minimal PII-scrub primitive. Pure JVM regex."""
    return F.regexp_replace(col, "[0-9]+", replacement)


def digit_count(col: Column | str) -> Column:
    """Number of digit characters (the masked-character count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, "[0-9]", ""))
