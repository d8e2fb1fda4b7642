"""Training-shard export: the last step of the corpus pipeline.

After quality/dedup/chunk/pack (``queries.llm.training_data_pipeline``)
the corpus leaves the engine as N deterministic shards plus a manifest
- the contract a trainer's data loader consumes. Requirements at scale:

* **deterministic placement** - shard = bin residue, so a re-run (or a
  resumed run) produces byte-identical shard membership; no
  ``sample()``/round-robin nondeterminism.
* **bounded shard size** - one writer task per shard via
  ``repartition(n, shard)``; within a shard rows are sorted
  (doc_id, chunk_idx) so downstream sequential reads are ordered and
  parquet row-group stats stay selective.
* **verifiable** - the manifest carries per-shard row/token counts and
  an order-insensitive content fingerprint (bit_xor of per-row
  xxhash64 - commutative, overflow-free under ANSI mode, and exact
  because (doc_id, chunk_idx) rows are unique); ``verify_export``
  recomputes it from the written files, catching partial/corrupt
  writes before a training job does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_COL = "shard"
_MANIFEST = "_manifest"


def assign_shards(chunks: DataFrame, n_shards: int) -> DataFrame:
    """Add the deterministic shard id: ``bin_id mod n_shards``. Bins are
    contiguous token-packed units, so residue placement spreads them
    round-robin across shards with no shuffle-order dependence."""
    return chunks.withColumn(SHARD_COL, F.pmod(F.col("bin_id"), F.lit(n_shards)))


def shard_manifest(sharded: DataFrame) -> DataFrame:
    """Per-shard stats + order-insensitive content fingerprint."""
    row_hash = F.xxhash64(*[c for c in sharded.columns if c != SHARD_COL])
    return sharded.groupBy(SHARD_COL).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.bit_xor(row_hash).alias("fingerprint"),
    )


def export_training_shards(
    chunks: DataFrame, path: str, n_shards: int = 8
) -> DataFrame:
    """Write ``path/shard=K/`` parquet shards + ``path/_manifest``;
    returns the manifest. One writer task per shard; rows sorted
    (doc_id, chunk_idx) within each."""
    sharded = assign_shards(chunks, n_shards)
    (
        sharded.repartition(n_shards, SHARD_COL)
        .sortWithinPartitions(SHARD_COL, "doc_id", "chunk_idx")
        .write.partitionBy(SHARD_COL)
        .mode("overwrite")
        .parquet(path)
    )
    manifest = shard_manifest(sharded)
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/{_MANIFEST}")
    return manifest


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/{_MANIFEST}")


def verify_export(spark: SparkSession, path: str) -> bool:
    """Recompute the manifest from the written shards and compare to the
    stored one - the integrity gate a resumable corpus build runs before
    handing shards to a trainer."""
    written = spark.read.parquet(path).withColumn(
        SHARD_COL, F.col(SHARD_COL).cast("long")
    )
    recomputed = shard_manifest(written)
    stored = read_manifest(spark, path)
    return (
        recomputed.exceptAll(stored).isEmpty()
        and stored.exceptAll(recomputed).isEmpty()
    )
