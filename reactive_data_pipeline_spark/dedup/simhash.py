"""SimHash near-duplicate detection.

Token-frequency weighted SimHash: every token occurrence votes +1/-1
per bit; the sign of the per-bit vote sum becomes the fingerprint bit.
Two token-hash keyings (round-11: the md5 keying graduates the catalog
entry from rows-only to an exact cross-engine oracle):

* ``xxhash64`` - 63-bit (bits 0..62; bit 63 skipped so the packed value
  stays a positive SQL BIGINT under ANSI arithmetic - one lost bit is
  immaterial for similarity). Fastest (one JVM hash), engine-specific.
* ``md5`` - 60-bit (the top 15 hex chars of ``md5(token)`` parsed as an
  integer). md5 is bit-identical in every engine, so a DuckDB twin can
  recompute the IDENTICAL fingerprints, banded candidate set, and
  verified pair set - the catalog query is value-hash oracle-checked
  with this keying. Slightly slower per token (md5 vs xxhash) but the
  operator is aggregation-bound, not hash-bound.

Candidate search blocks on fingerprint bands (any pair at Hamming
distance <= 3 shares at least one of four bands exactly), then verifies
with ``bit_count(xor)``; exactness of the banding is keying-independent.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.text import tokens
from ..operators.relational import ensure_parallelism

SIMHASH_BITS = 63
_BAND_BITS = 16
_BANDS = 4  # covers bits 0..63; top band has 15 live bits

#: keying -> (fingerprint bits, band width). 4 bands always; Hamming<=3
#: exactness needs only bands >= hamming+1 (pigeonhole).
KEYINGS: dict[str, tuple[int, int]] = {"xxhash64": (63, 16), "md5": (60, 15)}


def _token_hash(tok: str, keying: str) -> Column:
    """Per-token integer hash under the chosen keying (see module doc)."""
    if keying == "xxhash64":
        return F.xxhash64(tok)
    if keying == "md5":
        # 15 hex chars = 60 bits < 2^63: conv's decimal string casts to
        # BIGINT losslessly. DuckDB twin: ('0x' || substring(md5(t),1,15))::BIGINT.
        return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown simhash keying {keying!r} (want one of {sorted(KEYINGS)})")


def simhash_docs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", keying: str = "xxhash64"
) -> DataFrame:
    """(doc_id, simhash): one aggregation pass - explode tokens, per-bit
    conditional-sum votes (all map-side partial), pack the signs."""
    bits, _ = KEYINGS[keying]
    docs = ensure_parallelism(docs)  # the bit-votes/token are CPU-bound map work
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok"))
    h = _token_hash("tok", keying)
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(h.bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    packed = reduce(
        lambda acc, j: acc
        + F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long")),
        range(bits),
        F.lit(0).cast("long"),
    )
    return votes.select("doc_id", packed.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    keying: str = "xxhash64",
) -> DataFrame:
    """Pairs (doc_a < doc_b) with Hamming(simhash) <= max_hamming.

    Exact for max_hamming <= 3 by the pigeonhole band argument; larger
    radii would need more/permuted bands.

    SCALE SHAPE (round 6, the embedding-LSH saturation lesson applied
    to its fixed-band sibling): banding per DOCUMENT lets an
    exact-duplicate mass - m documents sharing one fingerprint, the
    most common real-corpus dup structure - multiply the band
    self-join by m^2 across all four bands before dedup. So the
    blocking here runs on DISTINCT fingerprints (dedup-before-blocking
    moved inside the operator): the banded join's input is the
    fingerprint vocabulary, same-fingerprint document cliques are
    emitted directly (they ARE the hamming-0 output, bounded by true
    output size), and cross-fingerprint pairs expand through two
    fingerprint-keyed joins, also output-bounded. Output is identical
    to per-document banding (pinned in tests/test_dedup_similarity.py).
    Remaining saturation edge: the 16-bit band space holds 65,536
    buckets, so at >>10^5 DISTINCT fingerprints the cross-fp candidate
    join grows ~bands * F^2 / 2^16 - at that scale use the
    permuted-table decomposition (Manku et al., WWW'07) with more
    tables over wider prefixes; the band constants live at the top of
    this module.
    """
    _, band_bits = KEYINGS[keying]
    # Both sides of the banded self-join re-execute this subtree (explode +
    # per-bit vote aggregation); persist the tiny (id, hash) relation.
    sh = simhash_docs(docs, text_col=text_col, id_col=id_col, keying=keying).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    fps = sh.select("simhash").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    fbands = fps.select(
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("bv"),
                    )
                    for i in range(_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("simhash", "bk.band", "bk.bv")
    fa, fb = fbands.alias("fa"), fbands.alias("fb")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    near_fp = (
        fa.join(
            fb,
            (F.col("fa.band") == F.col("fb.band"))
            & (F.col("fa.bv") == F.col("fb.bv"))
            & (F.col("fa.simhash") < F.col("fb.simhash")),
        )
        .select(F.col("fa.simhash").alias("sh_a"), F.col("fb.simhash").alias("sh_b"))
        .distinct()
        .filter(ham <= max_hamming)
    )
    da = sh.select(F.col("simhash").alias("sh_a"), F.col("doc_id").alias("da"))
    db = sh.select(F.col("simhash").alias("sh_b"), F.col("doc_id").alias("db"))
    cross = (
        near_fp.join(da, "sh_a")
        .join(db, "sh_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            ham.alias("hamming"),
        )
    )
    wa, wb = sh.alias("wa"), sh.alias("wb")
    within = wa.join(
        wb,
        (F.col("wa.simhash") == F.col("wb.simhash"))
        & (F.col("wa.doc_id") < F.col("wb.doc_id")),
    ).select(
        F.col("wa.doc_id").alias("doc_a"),
        F.col("wb.doc_id").alias("doc_b"),
        F.lit(0).cast("integer").alias("hamming"),
    )
    return cross.unionByName(within)
