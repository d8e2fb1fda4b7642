"""Shared guards for the streaming merge sinks and query runners.

Both derived-table merge sinks (`reactive.merge_ticker_meta_batch`,
`dedup.merge_dedup_registry_batch`) follow the same shape: read the
touched partitions of the existing table, union the batch's partials,
monotone re-aggregate, dynamic-overwrite those partitions. The read has
exactly one benign failure mode - the table does not exist yet (first
batch) - and every other failure (IO error, permissions, corrupt
footer) MUST propagate: treating a transient read error as "empty
table" would make the subsequent partition overwrite rewrite the
touched partitions from the batch alone, silently deleting the
existing rows for untouched keys that live in those partitions.
Failing the micro-batch instead lets the checkpoint retry it.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def await_finished(q: StreamingQuery, timeout: int = 300) -> None:
    """Block until the availableNow query terminates; on timeout, stop
    it and raise a DESCRIPTIVE error instead of letting the caller read
    a partially-built output table (which would surface downstream as
    an opaque hash mismatch in the correctness gate)."""
    if q.awaitTermination(timeout):
        return
    try:
        q.stop()
    finally:
        raise TimeoutError(
            f"streaming query {q.name or q.id} still running after "
            f"{timeout}s - output table is incomplete; not reading it"
        )


def existing_or_empty(
    spark: SparkSession,
    path: str,
    like: DataFrame | None = None,
    prune: Column | None = None,
    schema: str | None = None,
) -> DataFrame:
    """The existing derived table at ``path`` (partition-pruned by
    ``prune``), or an empty frame with ``like``'s schema (or the
    explicit ``schema`` DDL) IFF the table genuinely does not exist yet
    (``PATH_NOT_FOUND``). Any other read error propagates so the
    micro-batch fails and retries."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    try:
        existing = reader.parquet(path)
    except AnalysisException as e:
        cond = e.getCondition() if hasattr(e, "getCondition") else e.getErrorClass()
        if cond != "PATH_NOT_FOUND":
            raise
        empty_schema = schema if schema is not None else like.schema
        return spark.createDataFrame([], empty_schema)
    return existing.filter(prune) if prune is not None else existing
