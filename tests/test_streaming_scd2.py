"""Streaming SCD2 merge sink: incremental == batch, replay == no-op."""

from __future__ import annotations

import pyspark.sql.functions as F

from reactive_data_pipeline_spark.operators.scd import scd2_intervals
from reactive_data_pipeline_spark.sources import read_table
from reactive_data_pipeline_spark.streaming.scd2 import (
    event_observations,
    merge_scd2_batch,
    read_scd2_dim,
)

from .conftest import SF_DIR


def _dim_rows(spark, path):
    return sorted(
        tuple(r) for r in read_scd2_dim(spark, path).collect()
    )


def test_two_batch_merge_equals_one_pass_batch(spark, tmp_path):
    ev = read_table(spark, SF_DIR, "events")
    out = f"{tmp_path}/dim"
    merge_scd2_batch(ev.filter(F.col("ts") < "2024-01-16"), out)
    merge_scd2_batch(ev.filter(F.col("ts") >= "2024-01-16"), out)
    batch = sorted(
        tuple(r)
        for r in scd2_intervals(event_observations(ev))
        .select("user_id", "version", "tier", "valid_from_us", "valid_to_us", "is_current")
        .collect()
    )
    assert _dim_rows(spark, out) == batch


def test_replayed_batch_is_noop(spark, tmp_path):
    ev = read_table(spark, SF_DIR, "events")
    out = f"{tmp_path}/dim"
    first = ev.filter(F.col("ts") < "2024-01-16")
    merge_scd2_batch(first, out)
    before = _dim_rows(spark, out)
    merge_scd2_batch(first, out)  # at-least-once redelivery
    assert _dim_rows(spark, out) == before
    merge_scd2_batch(ev.filter(F.col("ts") >= "2024-01-16"), out)
    merge_scd2_batch(ev.filter(F.col("ts") >= "2024-01-16"), out)
    full = _dim_rows(spark, out)
    batch = sorted(
        tuple(r)
        for r in scd2_intervals(event_observations(ev))
        .select("user_id", "version", "tier", "valid_from_us", "valid_to_us", "is_current")
        .collect()
    )
    assert full == batch


def test_empty_batch_is_noop(spark, tmp_path):
    ev = read_table(spark, SF_DIR, "events")
    out = f"{tmp_path}/dim"
    merge_scd2_batch(ev, out)
    before = _dim_rows(spark, out)
    merge_scd2_batch(ev.filter(F.lit(False)), out)
    assert _dim_rows(spark, out) == before


def test_merge_touches_only_batch_buckets(spark, tmp_path):
    """Bucket-pruned maintenance: merging a single user's events must
    leave every other bucket's files byte-identical."""
    import glob
    import os

    ev = read_table(spark, SF_DIR, "events")
    out = f"{tmp_path}/dim"
    merge_scd2_batch(ev, out)
    one_user = ev.limit(0).unionByName(
        ev.filter(F.col("user_id") == 0).limit(5)
    )
    stamps_before = {
        f: os.path.getmtime(f) for f in glob.glob(f"{out}/bucket=*/part-*")
    }
    merge_scd2_batch(one_user, out)
    changed_buckets = {
        f.split("bucket=")[1].split("/")[0]
        for f, m in stamps_before.items()
        if os.path.exists(f) and os.path.getmtime(f) != m
    }
    new_files = set(glob.glob(f"{out}/bucket=*/part-*")) - set(stamps_before)
    touched = {f.split("bucket=")[1].split("/")[0] for f in new_files}
    assert len(touched | changed_buckets) <= 1  # only user 0's bucket


def test_restart_from_checkpoint_processes_only_new_files(spark, tmp_path):
    """Exactly-once across RUNS: a second availableNow run with the
    same checkpoint must process only files added since the first run,
    and the final dimension must equal the one-pass batch build."""
    import glob
    import os
    import shutil

    from reactive_data_pipeline_spark.streaming import await_finished
    from reactive_data_pipeline_spark.streaming.scd2 import scd2_stream_run

    ev = read_table(spark, SF_DIR, "events")
    src = f"{tmp_path}/events_in"
    os.mkdir(src)

    def _drop(tag, pred, mtime):
        half = f"{tmp_path}/half_{tag}"
        ev.filter(pred).coalesce(1).write.parquet(half)
        part = glob.glob(f"{half}/part-*.parquet")[0]
        dst = f"{src}/{tag}.parquet"
        shutil.move(part, dst)
        os.utime(dst, (mtime, mtime))

    out, ckpt = f"{tmp_path}/dim", f"{tmp_path}/ckpt"
    _drop("a", F.col("ts") < "2024-01-16", 1_000_000_000)
    await_finished(scd2_stream_run(spark, src, out, ckpt, available_now=True))
    mid = _dim_rows(spark, out)
    assert mid  # wave A materialized

    _drop("b", F.col("ts") >= "2024-01-16", 2_000_000_000)
    await_finished(scd2_stream_run(spark, src, out, ckpt, available_now=True))
    full = _dim_rows(spark, out)
    batch = sorted(
        tuple(r)
        for r in scd2_intervals(event_observations(ev))
        .select("user_id", "version", "tier", "valid_from_us", "valid_to_us", "is_current")
        .collect()
    )
    assert full == batch
    assert full != mid  # the restart actually advanced the table


def test_malformed_props_yield_null_tier_not_crash(spark, tmp_path):
    """Broken/missing JSON in props must flow through as a NULL tier
    (its own SCD2 state, null-safe change detection), never a crash -
    ingest robustness for the 100 TB reality of dirty payloads."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0), 7, "click", 0.0, '{"k": 10}'),
        (2, dt.datetime(2024, 1, 2, 0), 7, "click", 0.0, "not json at all"),
        (3, dt.datetime(2024, 1, 3, 0), 7, "click", 0.0, '{"other": 1}'),
        (4, dt.datetime(2024, 1, 4, 0), 7, "click", 0.0, '{"k": 90}'),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    dim = scd2_intervals(event_observations(ev)).orderBy("version").collect()
    tiers = [r["tier"] for r in dim]
    # k=10 -> tier 0; two malformed -> one NULL interval; k=90 -> tier 3
    assert tiers == [0, None, 3]
    assert [r["version"] for r in dim] == [1, 2, 3]
    assert dim[-1]["is_current"]
