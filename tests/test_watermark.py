"""Watermark semantics: an append-mode windowed aggregation emits a
window only once its watermark passes, and rows arriving later than the
delay are dropped from the state - the late-data contract of the
reactive layer (SURVEY.md section 5.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .helpers import assert_df_equal


def _write(spark, path, rows):
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    df.coalesce(1).write.mode("append").parquet(path)


def _run_batches(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").cast("string").alias("win"), "n", "total")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_append_mode_drops_rows_later_than_watermark(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 1, 10, m)
    # Sequential runs over one checkpoint: the watermark advances at
    # run boundaries (deterministic, unlike file order within one run).
    # run 1: two rows in window 10:00, one in 10:10
    _write(spark, src, [(1, t(1), 1.0), (2, t(5), 2.0), (3, t(12), 4.0)])
    _run_batches(spark, src, out, ckpt)
    # run 2: advance event time far ahead -> watermark passes 10:00+10m
    _write(spark, src, [(4, t(40), 8.0)])
    _run_batches(spark, src, out, ckpt)
    # run 3: a LATE row for the already-closed 10:00 window (event time
    # 10:07 while watermark is 10:30) - must be dropped
    _write(spark, src, [(5, t(7), 100.0)])
    _run_batches(spark, src, out, ckpt)

    got = {r.win: (r.n, r.total) for r in spark.read.parquet(out).collect()}
    closed_1000 = got.get("2024-01-01 10:00:00")
    assert closed_1000 == (2, 3.0), got  # late row 5 NOT merged


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream join: each click joined to purchases by
    the same user within the following hour. availableNow replay must
    reproduce the batch interval join."""
    from reactive_data_pipeline_spark.sources import read_table
    from tests.conftest import SF_DIR

    events = read_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "ev")
    events.coalesce(1).write.parquet(src)

    def side(df, kind, pre):
        return (
            df.filter(F.col("event_type") == kind)
            .select(
                F.col("event_id").alias(f"{pre}_id"),
                F.col("user_id").alias(f"{pre}_user"),
                F.col("ts").alias(f"{pre}_ts"),
            )
        )

    schema = events.schema
    stream = spark.readStream.schema(schema).parquet(src)
    clicks = side(stream, "click", "c").withWatermark("c_ts", "2 hours")
    buys = side(stream, "purchase", "p").withWatermark("p_ts", "2 hours")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        clicks.join(buys, cond)
        .select("c_id", "p_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive

    got = {(r.c_id, r.p_id) for r in spark.read.parquet(out).collect()}
    b = side(events, "click", "c").join(side(events, "purchase", "p"), cond).select("c_id", "p_id")
    expected = {(r.c_id, r.p_id) for r in b.collect()}
    assert got == expected and expected


def test_complete_mode_aggregation_converges_to_batch(spark, tmp_path):
    """Complete output mode re-emits the whole aggregate each batch; the
    final memory-sink table must equal the batch aggregation."""
    from reactive_data_pipeline_spark.sources import read_table
    from tests.conftest import SF_DIR

    events = read_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev")
    for i in range(3):
        events.filter(events.event_id % 3 == i).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("complete_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_type: r.n for r in spark.sql("SELECT * FROM complete_agg").collect()}
    expected = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expected


def test_streaming_session_window_closed_sessions_match_batch(spark, tmp_path):
    """Native session_window in a watermarked stream (append mode emits a
    session once the watermark passes its end). Every emitted session
    must match the batch session_window aggregation exactly; sessions
    near the stream's end may legitimately still be open."""
    from reactive_data_pipeline_spark.queries import QUERIES
    from reactive_data_pipeline_spark.sources import read_table
    from tests.conftest import SF_DIR

    events = read_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "ev")
    # time-ordered splits so the watermark advances monotonically
    epoch = F.col("ts").cast("long")
    bounds = events.agg(F.min(epoch), F.max(epoch)).first()
    lo, hi = bounds[0], bounds[1] + 1
    cut = lo + (hi - lo) // 2
    for pred in (epoch < cut, epoch >= cut):
        events.filter(pred).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive

    got = {
        (r.user_id, r.session_start_us): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    assert got  # closed sessions were emitted
    expected = {
        (r.user_id, r.session_start_us): r.n_events
        for r in QUERIES["session_window_stats"].build(spark, SF_DIR).collect()
    }
    # every emitted (closed) session agrees with the batch aggregate
    for key, n in got.items():
        assert expected.get(key) == n, key
    # and most sessions closed (only tail-of-stream ones may be open)
    assert len(got) >= len(expected) * 0.8


def test_stream_static_broadcast_enrichment_matches_batch(spark, tmp_path):
    """Stream-static join: a streaming fact enriched with a static
    dimension (the canonical at-scale pattern - the dim broadcasts to
    every micro-batch, no state, no watermark needed). The enriched
    streaming aggregate must equal the same join done in batch."""
    from reactive_data_pipeline_spark.sources import read_table
    from tests.conftest import SF_DIR

    events = read_table(spark, SF_DIR, "events")
    dim = (
        events.select("user_id")
        .distinct()
        .withColumn("cohort", F.concat(F.lit("c"), (F.col("user_id") % 7).cast("string")))
    )
    src = str(tmp_path / "ev")
    for i in range(3):
        events.filter(events.event_id % 3 == i).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .join(F.broadcast(dim), "user_id")
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("value").cast("decimal(18,6)")).alias("v"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_static")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM stream_static")
    expected = (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("value").cast("decimal(18,6)")).alias("v"))
    )
    assert_df_equal(got, expected)


def test_streaming_hopping_window_matches_batch_query(spark, tmp_path):
    """Structured Streaming's sliding window(ts, '3 hours', '1 hour')
    must assign rows to exactly the windows the batch
    hopping_window_event_counts query computes (window id = end hour)."""
    from reactive_data_pipeline_spark.queries import QUERIES
    from reactive_data_pipeline_spark.sources import read_table
    from tests.conftest import SF_DIR

    events = read_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev")
    for i in range(2):
        events.filter(events.event_id % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy(
            F.window(F.col("ts"), "3 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hop_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    # streaming window.end is EXCLUSIVE; the batch query's window id is
    # the inclusive end hour, hence the -1.
    got = {
        (int(r.w.end.timestamp() * 1_000_000) // 3600_000_000 - 1, r.event_type): r.n
        for r in spark.sql("SELECT * FROM hop_agg").collect()
    }
    batch = {
        (r.window_end_hr, r.event_type): r.n_events
        for r in QUERIES["hopping_window_event_counts"].build(spark, SF_DIR).collect()
    }
    assert got == batch
