"""The reference's job surface (jobs.py facade): per-day materialize +
analyze, idempotent re-runs, backfill == full batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from reactive_data_pipeline_spark import jobs
from reactive_data_pipeline_spark.operators.ticker import (
    build_ticker_meta,
    derive_ticker,
)
from reactive_data_pipeline_spark.sources import read_table

from .conftest import SF_DIR
from .helpers import assert_df_equal


def test_backfill_reproduces_full_batch(spark, tmp_path):
    tpath, mpath = str(tmp_path / "ticker"), str(tmp_path / "meta")
    days = jobs.list_days(spark, SF_DIR)
    assert days == sorted(days) and days
    jobs.backfill(spark, SF_DIR, tpath, mpath, days)
    got = spark.read.parquet(mpath).select(
        "symbol",
        "monthly_max_market_price",
        "monthly_min_market_price",
        F.col("partition").cast("string").alias("partition"),
    )
    expected = build_ticker_meta(derive_ticker(read_table(spark, SF_DIR, "events")))
    assert_df_equal(got, expected)


def test_rerun_day_is_idempotent(spark, tmp_path):
    tpath, mpath = str(tmp_path / "ticker"), str(tmp_path / "meta")
    day = jobs.list_days(spark, SF_DIR)[0]
    jobs.materialize_ticker(spark, SF_DIR, tpath, day)
    jobs.analyze_day(spark, tpath, mpath, day)
    first = sorted(map(tuple, spark.read.parquet(mpath).collect()))
    # retry the whole day (the reference's run_key dedup scenario)
    jobs.materialize_ticker(spark, SF_DIR, tpath, day)
    jobs.analyze_day(spark, tpath, mpath, day)
    assert sorted(map(tuple, spark.read.parquet(mpath).collect())) == first
