"""Broadcastable Bloom filter built and probed entirely JVM-side - the
100 TB decontamination path (SURVEY.md section 7.5 curation family).

`functions.curation.contamination_overlap` broadcasts the eval suite's
DISTINCT gram set and joins; that is exact, but the broadcast grows with
the eval corpus (every gram string ships to every executor). A Bloom
filter compresses the same membership test into a fixed ``m``-bit array
(e.g. 2^27 bits = 16 MB covers ~10M grams at k=5 under 1% FP) with ZERO
false negatives - so bloom-flagging is a strict superset of true
contamination and safe to use as the drop predicate (over-dropping a few
clean docs is the standard trade; the contract query in queries/llm2.py
pins both properties against the exact oracle).

Everything stays inside whole-stage codegen:

* build - explode ``k`` seeds per key, ``pmod(xxhash64(seed, key), m)``
  bit positions, ``bit_or`` partial-aggregated into 64-bit words, then
  one 1-row DataFrame holding the dense ``array<long>`` (W = m/64
  words). No Python, no driver-side loop; the only data reaching the
  driver is nothing - the words array broadcasts as a 1-row DF.
* probe - ``forall`` over the same ``k`` seeds testing
  ``shiftright(words[p DIV 64], p % 64) & 1``. A narrow map over the
  corpus: no shuffle, no UDF.

Unlike ``DataFrame.stat.bloomFilter`` (which materializes the filter as
a driver-side py4j object), the filter here never leaves the cluster
plan, so it composes into a single Catalyst job and streams through
``foreachBatch`` untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    k: int = 5,
    out_col: str = "bloom_words",
) -> DataFrame:
    """1-row DataFrame ``(out_col: array<long>)`` - the dense bit array
    (length ``num_bits/64``) with every key's ``k`` hash bits set.

    ``num_bits`` must be a multiple of 64. Size it to the KEY set, not
    the corpus: bits ~= 10x distinct keys keeps the per-probe FP rate
    under ~1% at k=5 (eval suites are MBs against a TB corpus, so even
    2^30 bits = 128 MB broadcasts comfortably).
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    pos = keys.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed"),
        F.col(key_col).alias("__k"),
    ).select(F.pmod(F.xxhash64("seed", "__k"), F.lit(num_bits)).alias("p"))
    set_bits = pos.select(
        (F.col("p") / 64).cast("long").alias("w"),
        F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("bit"),
    )
    # Seed a zero row per word index BEFORE aggregating, so the result
    # of bit_or is already dense: sort-by-index then project, with no
    # per-element map lookup (a map_from_entries + element_at assembly
    # is O(W) per lookup on Spark's array-backed maps = O(W^2) total -
    # measured 14s for 2^20 bits vs ~0.3s for this shape).
    zeros = keys.sparkSession.range(n_words).select(
        F.col("id").alias("w"), F.lit(0).cast("long").alias("bit")
    )
    words = (
        set_bits.unionByName(zeros).groupBy("w").agg(F.bit_or("bit").alias("word"))
    )
    return words.agg(
        F.array_sort(F.collect_list(F.struct("w", "word"))).alias("__e")
    ).select(F.transform("__e", lambda s: s["word"]).alias(out_col))


def bloom_might_contain(
    words_col: str,
    key_sql: str,
    num_bits: int = 1 << 20,
    k: int = 5,
) -> Column:
    """Boolean membership probe against a :func:`bloom_build` word array.

    ``words_col`` / ``key_sql`` are SQL fragments (column names or
    expressions) because the probe is one ``forall`` lambda - the seeded
    rehash must textually match the build side (`xxhash64(seed, key)`
    over ``seq 0..k-1``). True => possibly present (FP rate set by
    sizing); False => DEFINITELY absent.
    """
    # hash once per seed (transform), then test the bit (forall) - the
    # naive single-lambda form would evaluate xxhash64 twice per seed
    # (word index + bit offset), doubling the dominant cost.
    return F.expr(
        f"forall(transform(sequence(0, {k - 1}), "
        f"s -> pmod(xxhash64(s, {key_sql}), CAST({num_bits} AS BIGINT))), "
        f"p -> (shiftright(element_at({words_col}, CAST(p DIV 64 AS INT) + 1), "
        f"CAST(p % 64 AS INT)) & 1) = 1)"
    )
