"""N-gram Jaccard near-duplicate detection (exact, inverted-index form).

The classic exact near-dup algorithm: explode each document's distinct
token n-grams, self-join on the gram (an inverted-index join), count
shared grams per pair, compute Jaccard. This is the *exact* counterpart
that MinHash+LSH approximates; at web scale you run LSH first and this
only on candidates (dedup.minhash does exactly that).

Scale notes: the gram join shuffles on the gram value; very frequent
grams (stopword-only n-grams) create skew and quadratic pair blowup, so
production runs drop grams above a document-frequency cap - exposed as
``max_doc_freq``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.text import tokens
from ..operators.relational import ensure_parallelism


def token_ngrams(text: Column | str, n: int) -> Column:
    """Distinct word n-grams of the normalized text (JVM-side
    transform/sequence; no UDF). n=1 yields the distinct token set."""
    t = tokens(text)
    if n == 1:
        return F.array_distinct(t)
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(0)))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)])
    return F.array_distinct(F.when(F.size(t) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    ))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 1,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All pairs (doc_a < doc_b) with n-gram-set Jaccard >= threshold.

    Columns: doc_a, doc_b, jaccard (rounded to 6dp).
    """
    # Persisted: the inverted-index self-join re-executes this subtree for
    # both aliases; one shingle pass instead of two.
    grams = (
        ensure_parallelism(docs)
        .select(F.col(id_col).alias("doc"), token_ngrams(text_col, n).alias("g"))
        .select("doc", F.size("g").alias("n_grams"), F.explode("g").alias("gram"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if max_doc_freq is not None:
        df_w = Window.partitionBy("gram")
        grams = grams.withColumn("__df", F.count(F.lit(1)).over(df_w)).filter(
            F.col("__df") <= max_doc_freq
        ).drop("__df")
    a, b = grams.alias("a"), grams.alias("b")
    pairs = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.n_grams").alias("na"),
            F.col("b.n_grams").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared").cast("double") / (F.col("na") + F.col("nb") - F.col("shared"))
    return pairs.filter(jac >= threshold).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )
