"""Streaming exact dedup: maintain the content-fingerprint registry of
a growing corpus as documents arrive.

The batch twin is ``dedup.exact.exact_dedup_groups``; here the same
(fingerprint -> keeper, copy count) relation is a streaming aggregation
whose state IS the dedup registry - new files shift only the groups
they touch. Complete-output mode re-emits the whole registry per
trigger, which is exactly what the correctness harness wants (the
materialized table equals the batch aggregate over everything seen -
the stream-batch equivalence invariant).

Scale notes: the aggregation state is hash-partitioned on the
fingerprint across the state store (RocksDB-backed on a real cluster),
so the registry shards horizontally; the sequential-rewrite cost of
complete mode is the harness convenience, and the production sink is
update mode + an idempotent keeper merge (min-id is monotone, so
re-merging a batch is a no-op - same contract as
``reactive.merge_ticker_meta_batch``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.text import fingerprint_md5
from ..sources.registry import read_stream


def dedup_registry_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """The streaming dedup-registry aggregation over a document stream:
    one row per distinct normalized content with deterministic min-id
    keeper and copy count (same columns as ``exact_dedup_groups``)."""
    docs = read_stream(spark, src_dir, "documents")
    return docs.groupBy(fingerprint_md5("text").alias("fingerprint")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def streaming_dedup_run(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the dedup registry as a Structured Streaming job: file-stream
    ``src_dir``, maintain the registry, materialize it to ``out_path``
    parquet on every trigger. ``available_now=True`` drains what exists
    and stops (the backfill/equivalence mode)."""
    registry = dedup_registry_stream(spark, src_dir)

    def _sink(batch: DataFrame, _batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(out_path)

    writer = (
        registry.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.trigger(processingTime="1 second").start()
