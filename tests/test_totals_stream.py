"""transformWithStateInPandas running-totals tests (streaming/totals.py).

The modern state API's Python protocol needs ``protobuf``; this sandbox
has no installs, so the execution tests gate on it (the Kafka-leg
pattern) and run the full stream==batch equivalence wherever it exists.
The construction-level contract (plan builds, schema, state shape) is
asserted everywhere.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reactive_data_pipeline_spark.sources import read_table
from reactive_data_pipeline_spark.streaming.totals import (
    TOTALS_OUT,
    latest_totals,
    user_totals_run,
    user_totals_stream,
)

from .conftest import SF_DIR


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_totals_stream_builds_with_contract_schema(spark):
    """The transformWithState plan constructs against a streaming
    source and carries the declared output schema (no execution - the
    state server only spins up at query start)."""
    ev = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(
            (F.col("value") % 10).alias("user_id"),
            (F.col("value") / 7.0).alias("value"),
        )
    )
    totals = user_totals_stream(ev)
    assert totals.isStreaming
    assert [(f.name, f.dataType) for f in totals.schema.fields] == [
        (f.name, f.dataType) for f in TOTALS_OUT.fields
    ]


def _batch_totals(spark):
    return (
        read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                "value_sum_micro"
            ),
        )
    )


@pytest.mark.slow
def test_totals_stream_equals_batch(spark, tmp_path):
    """Full stream==batch equivalence through the modern state API -
    exact (int64 fixed-point), not approximate. Skips where the
    protobuf state-server dependency is absent."""
    if not _protobuf_available():
        pytest.skip("protobuf missing: transformWithState server cannot start here")
    src = tmp_path / "ev"
    src.mkdir()
    os.symlink(
        os.path.join(SF_DIR, "events.parquet"), str(src / "events.parquet")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = user_totals_run(spark, str(src), out, ckpt, available_now=True)
    q.awaitTermination(180)
    assert not q.isActive
    got = latest_totals(spark.read.parquet(out))
    batch = _batch_totals(spark)
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


@pytest.mark.slow
def test_totals_stream_incremental_batches(spark, tmp_path):
    """Totals accumulate across micro-batches (one file per trigger)
    and the final emission equals the batch aggregate."""
    if not _protobuf_available():
        pytest.skip("protobuf missing: transformWithState server cannot start here")
    src = tmp_path / "ev"
    src.mkdir()
    ev = read_table(spark, SF_DIR, "events")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = user_totals_run(
        spark, str(src), out, ckpt, available_now=True, max_files_per_trigger=1
    )
    q.awaitTermination(180)
    got = latest_totals(spark.read.parquet(out))
    batch = _batch_totals(spark)
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
