"""Stream-stream interval join (streaming/join.py): cross-micro-batch
state correctness and stream-batch equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reactive_data_pipeline_spark.sources import read_table
from reactive_data_pipeline_spark.streaming import click_purchase_pairs, stream_join_run

from .conftest import SF_DIR
from .helpers import assert_df_equal


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "events_in"
    src.mkdir()
    return src, str(tmp_path / "pairs"), str(tmp_path / "ckpt")


def _batch_expected(spark):
    ev = read_table(spark, SF_DIR, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    return click_purchase_pairs(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        3600,
    )


def test_stream_join_cross_batch(spark, dirs):
    """Splitting events by id means a click and its matching purchase
    usually land in DIFFERENT micro-batches - pairs can only be complete
    if the join state buffers one side across batches."""
    src, out, ckpt = dirs
    events = read_table(spark, SF_DIR, "events")
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    q = stream_join_run(spark, str(src), out, ckpt, window_s=3600, max_files_per_trigger=1)
    q.awaitTermination(120)
    assert not q.isActive
    got = spark.read.parquet(out)
    expected = _batch_expected(spark)
    assert expected.count() > 0
    assert_df_equal(got, expected)


def test_stream_join_incremental_arrival(spark, dirs):
    """New purchase file arriving later still pairs with clicks from the
    earlier run (state persisted via checkpoint across restarts)."""
    src, out, ckpt = dirs
    events = read_table(spark, SF_DIR, "events")
    clicks_only = events.filter(F.col("event_type") != "purchase")
    purchases_only = events.filter(F.col("event_type") == "purchase")

    clicks_only.coalesce(1).write.mode("append").parquet(str(src))
    q = stream_join_run(spark, str(src), out, ckpt, window_s=3600)
    q.awaitTermination(120)
    # no purchases yet -> no pairs (the sink directory may not even exist)
    try:
        n0 = spark.read.parquet(out).count()
    except Exception:
        n0 = 0
    assert n0 == 0

    purchases_only.coalesce(1).write.mode("append").parquet(str(src))
    q = stream_join_run(spark, str(src), out, ckpt, window_s=3600)
    q.awaitTermination(120)
    assert_df_equal(spark.read.parquet(out), _batch_expected(spark))
