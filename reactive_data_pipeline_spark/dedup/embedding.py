"""Embedding-cosine near-duplicate pairs.

Exact mode compares all pairs (broadcast-nested-loop on ``id_a < id_b``)
with norms computed once per row - correct at correctness-harness scale
and the oracle-checkable ground truth. The scale path is
``embedding_neardup_lsh``: banded random-hyperplane signatures, an equi
join on the (band, bucket) key for candidates, then the SAME exact
cosine verification - the minhash_lsh_pairs shape applied to dense
vectors, linear in data + candidates instead of O(N^2).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.storagelevel import StorageLevel

from ..functions.vectors import dot, l2_norm
from ..operators.relational import ensure_parallelism

DEFAULT_SEED = 42


def md5_plane_component(tag: str) -> float:
    """Deterministic pseudo-random double in [-1, 1) derived from md5 -
    the ONLY hash Spark, DuckDB, and hashlib compute identically. The
    top 15 hex chars (60 bits) convert exactly to int64; dividing by
    2^59 is an exact power-of-two scale, so Python, a DuckDB
    ``('0x'||substring(md5(s),1,15))::BIGINT / 2^59 - 1.0``, and the
    literal shipped to Spark are the SAME IEEE double bit pattern
    (pinned in tests). Sign-LSH only reads the sign of <v, p>, so the
    uniform-cube (rather than Gaussian) direction distribution costs a
    little angular uniformity but nothing an oracle can see; recall is
    still held by embedding_recall_contract's measured floor."""
    return int(hashlib.md5(tag.encode()).hexdigest()[:15], 16) / (1 << 59) - 1.0


def md5_planes(num_bands: int, bits_per_band: int, dim: int) -> list[tuple[int, int, list[float]]]:
    """(band, weight=2^bit, plane) rows for the SQL-reproducible
    signature path; the DuckDB twin regenerates the identical rows from
    the same ``plane:{band}:{bit}:{i}`` tags."""
    return [
        (band, 1 << bit, [md5_plane_component(f"plane:{band}:{bit}:{i}") for i in range(dim)])
        for band in range(num_bands)
        for bit in range(bits_per_band)
    ]


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (vec_a < vec_b) with cosine >= threshold.

    Columns: vec_a, vec_b, cos_sim (rounded 6dp).
    """
    # The non-broadcast side's partition count is the parallelism of the
    # nested-loop join; a single-file input must not serialize N^2/2 dot
    # products onto one core.
    emb = ensure_parallelism(emb)
    sides = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), l2_norm(vec_col).alias("nrm")
    )
    a = sides.select(F.col("id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = sides.select(F.col("id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = dot("va", "vb") / (F.col("na") * F.col("nb"))
    return pairs.filter(cos >= threshold).select(
        "vec_a", "vec_b", F.round(cos, 6).alias("cos_sim")
    )


def embedding_neardup_lsh(
    emb: DataFrame,
    threshold: float = 0.5,
    bits_per_band: int = 8,
    num_bands: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = DEFAULT_SEED,
    dim: int = 64,
    max_bucket: int | None = None,
    signatures: str = "matmul",
) -> DataFrame:
    """Banded sign-LSH near-dup pairs: same output contract as
    ``embedding_neardup_pairs`` (vec_a < vec_b, exact cosine >=
    threshold, rounded 6dp) but candidates come from an equi join on
    (band, bucket) keys instead of the all-pairs nested loop.

    Shape (the minhash_lsh_pairs pipeline for dense vectors):

    1. signatures - ``num_bands * bits_per_band`` fixed seeded
       hyperplanes; per band the packed sign bits form a bucket id.
       Computed as ONE numpy matmul per Arrow batch (a pandas_udf: 256+
       dot products per row is matrix work, where interpreted Catalyst
       HOFs would evaluate 16k lambda steps per row).
    2. explode to (id, band_key), self-join on the key with id_a < id_b,
       distinct - linear in data + bucket collisions.
    3. verify candidates with the exact JVM-side cosine, so output pairs
       are never false positives; recall is the banding collision
       probability 1-(1-p^b)^B with p = 1 - theta/pi.

    Parameter regimes (collision math + measured on the driver corpus):
    production near-dup dedup (threshold ~0.9) wants
    ``bits_per_band=12, num_bands=24`` -> ~98% recall while passing
    ~0.6% of random pairs. The defaults here (8, 32) are tuned for this
    corpus's much looser 0.5 tail - uniform-on-the-sphere vectors with
    NO planted duplicates, the worst case for any geometric blocking -
    giving ~0.85 recall at ~7x candidate reduction
    (tests/test_dedup_similarity.py pins both regimes).

    SCALE GUARDS (measured, round 6 - the 40x-volume bench): a band has
    only ``2^bits_per_band`` buckets, so once N outgrows the key space
    every bucket holds ~N/2^bits members and step 2 degenerates to
    ~num_bands * N^2 / 2^bits candidate rows ON ANY DATA - at 80k
    vectors the uncapped (8, 32) regime built ~10^9 candidate rows and
    filled 70 GB of disk with sort spill. Two levers:

    * Size ``bits_per_band`` ~ log2(N/target_bucket) so expected bucket
      occupancy stays O(1) - the deployment-owned sizing rule (raising
      bits lowers per-band true-pair collision p^b, so ``num_bands``
      must rise to hold recall at 1-(1-p^b)^B; at loose thresholds the
      p-gap between true and random pairs is narrow and this gets
      expensive - tight-threshold dedup (~0.9) is what sign-LSH is for).
    * ``max_bucket`` - drop (band, bucket) groups larger than this
      before the self-join, bounding candidates by ~N*B*max_bucket/2
      regardless of N. Oversized buckets on high-entropy data are
      low-information bands; true near-dup cliques bigger than the cap
      (mirror corpora) should be collapsed by exact/fingerprint dedup
      BEFORE geometric blocking, same composition rule as the minhash
      pipeline's dedup-before-LSH. None (default) preserves exhaustive
      banding for the contract/recall paths at check scales.

    ``signatures`` picks the band-key computation (round-12 graduation,
    the simhash ``keying`` pattern):

    * ``"matmul"`` (default) - seeded Gaussian hyperplanes, ONE numpy
      matmul per Arrow batch. The throughput path; numpy's pairwise
      summation order is not SQL-reproducible, so this form carries a
      rows-only driver check (quality held by embedding_recall_contract).
    * ``"sql"`` - md5-derived hyperplanes (``md5_planes``) evaluated as
      a broadcast B-row band table (each band row nests its b
      (weight, plane) structs) cross-joined to the vectors; per
      (vector, band) row the bucket is one ``aggregate`` fold over the
      structs, each dot an explicit-0.0-init sequential ``aggregate``
      fold, bucket bits recombined by exact integer (order-free)
      addition. Every intermediate is bit-reproducible in DuckDB
      (``list_reduce`` with the same fold order + the same md5 planes),
      so the WHOLE pipeline - signatures, banding, candidate join,
      exact-cosine verification - is hash-checked end to end. Work is
      identical asymptotically (N*B*b dots); the constant is
      interpreted-HOF vs BLAS, which is why the matmul form remains the
      deployment default.
    """
    emb = ensure_parallelism(emb)
    sides = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), l2_norm(vec_col).alias("nrm")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_bands, n_bits = num_bands, bits_per_band
    if signatures == "sql":
        # ONE-row broadcast plane table (optimization round 13, guide
        # sections 2.3/2.4; round 12 had already folded the original
        # (B*b)-row crossJoin down to B rows): ALL bands nest into a
        # single row - array<struct<band, planes>> - so the join
        # inflation disappears entirely (the build side is 1 row) and
        # each vector computes its B band keys in one ``transform``
        # producing ``array<long>`` + ``explode``, exactly the shape of
        # the matmul path. The arithmetic is UNCHANGED expression for
        # expression: per band the bucket is the same sequential
        # ``aggregate`` fold over the same b (w, plane) structs (each
        # dot the same explicit-0.0-init fold as functions.vectors.dot),
        # and the band offset is the same exact integer addition - so
        # every bk is bit-identical to the round-12 form's and the
        # DuckDB twin is untouched (collect-compared + parity-proven).
        # Plane values stay DATA, not expression tree: a fully-literal
        # per-row projection was measured (round 12) at ~27s of py4j
        # Column construction per build.
        spark = emb.sparkSession
        plane_rows = md5_planes(num_bands, bits_per_band, dim)
        band_rows = [
            (band, [(w, plane) for b2, w, plane in plane_rows if b2 == band])
            for band in range(num_bands)
        ]
        planes_df = spark.createDataFrame(
            [(band_rows,)],
            "bands array<struct<band: int, "
            "planes: array<struct<w: long, plane: array<double>>>>>",
        )
        keys = F.transform(
            F.col("bands"),
            lambda bs: F.aggregate(
                bs["planes"],
                F.lit(0).cast("long"),
                lambda acc, s: acc
                + F.when(dot("v", s["plane"]) > 0, s["w"]).otherwise(
                    F.lit(0).cast("long")
                ),
            )
            + (bs["band"].cast("long") * F.lit(1 << n_bits)),
        )
        buckets = (
            sides.select("id", "v")
            .crossJoin(F.broadcast(planes_df))
            .select("id", F.explode(keys).alias("bk"))
        )
    elif signatures == "matmul":
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((num_bands * bits_per_band, dim))
        planes /= np.linalg.norm(planes, axis=1, keepdims=True)
        weights = (1 << np.arange(bits_per_band)).astype(np.int64)

        @pandas_udf("array<long>")
        def band_keys(v: pd.Series) -> pd.Series:
            x = np.vstack(v.to_numpy())  # (batch, dim)
            bits = (x @ planes.T) > 0  # (batch, B*b)
            buckets = bits.reshape(len(x), n_bands, n_bits) @ weights  # (batch, B)
            keys = buckets + (np.arange(n_bands, dtype=np.int64) << n_bits)
            return pd.Series(list(keys))

        buckets = sides.select(
            "id", F.explode(band_keys(F.col("v").cast("array<double>"))).alias("bk")
        )
    else:
        raise ValueError(f"unknown signatures mode {signatures!r}")
    if max_bucket is not None:
        # One bk-keyed window pass - the same shuffle key the self-join
        # needs anyway, and no broadcast whose size would track the
        # bucket-key space (num_bands * 2^bits grows with auto-sized
        # bits; a bk partition is never larger than the hottest bucket).
        from pyspark.sql import Window

        buckets = (
            buckets.withColumn("__bn", F.count(F.lit(1)).over(Window.partitionBy("bk")))
            .filter(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    # Persist the EXPLODED (and, when capped, already cap-filtered)
    # bucket keys: both join aliases consume this subtree, and without
    # the persist the signature pass runs twice (matmul A/B at sf0.1:
    # 2.3s -> 1.6s). Persisting AFTER the max_bucket window
    # (optimization round 12) means the cap's exchange + window run
    # once instead of once per join side (plan: two Window+Exchange
    # branches -> one), and the cached partitioning (hashpartitioning
    # on bk, established by the window) feeds both sides of the
    # candidate self-join with no further exchange. At corpus scale
    # this is also the canonical materialization point - signatures are
    # 8-byte keys, far smaller than the vectors.
    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    a, b = buckets.alias("a"), buckets.alias("b")
    # The dedup exchange is a USER repartition on the distinct keys
    # (optimization round 13, guide section 2.5): the downstream
    # verification is compute-bound (one interpreted 64-dim dot fold
    # per candidate) on BYTE-tiny rows, so AQE's byte-based partition
    # coalescing was folding the whole verify onto 1-2 tasks (measured
    # 1.5s on 2 tasks at sf0.1). An explicit repartition pins the
    # parallelism AQE cannot see it needs; dropDuplicates reuses the
    # same partitioning, so the exchange count is unchanged vs the old
    # ``.distinct()`` and the partition count equals what the shuffle
    # conf would have given pre-AQE.
    par = emb.sparkSession.sparkContext.defaultParallelism
    cand = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
        .repartition(par, "vec_a", "vec_b")
        .dropDuplicates()
    )
    va = sides.select(F.col("id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    vb = sides.select(F.col("id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    verified = cand.join(va, "vec_a").join(vb, "vec_b")
    cos = dot("va", "vb") / (F.col("na") * F.col("nb"))
    return verified.filter(cos >= threshold).select(
        "vec_a", "vec_b", F.round(cos, 6).alias("cos_sim")
    )
