"""Message-bus (Kafka-shaped) streaming source: wire schema, payload
decode determinism, and the reactive derived table driven end-to-end
from the bus instead of a file directory."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from reactive_data_pipeline_spark import schemas
from reactive_data_pipeline_spark.sources import (
    BUS_WIRE,
    decode_bus_events,
    rate_bus_stream,
)
from reactive_data_pipeline_spark.streaming import reactive_ticker_meta_run


def _drain(query, seconds: float, min_rows_probe=None) -> None:
    """Let a continuous stream run briefly, then stop it cleanly."""
    deadline = time.time() + seconds
    while time.time() < deadline:
        if min_rows_probe is not None and min_rows_probe():
            break
        time.sleep(0.5)
    query.stop()
    query.awaitTermination(60)


def test_rate_bus_emits_kafka_wire_schema(spark):
    bus = rate_bus_stream(spark, rows_per_second=50)
    assert [(f.name, f.dataType) for f in bus.schema.fields] == [
        (f.name, f.dataType) for f in BUS_WIRE.fields
    ]
    assert bus.isStreaming


def test_decode_bus_events_matches_events_schema_and_mapping(spark, tmp_path):
    """Decoded bus rows carry the normalized events schema, and every
    field recomputes from the deterministic event_id mapping."""
    decoded = decode_bus_events(rate_bus_stream(spark, rows_per_second=200, num_users=150))
    assert decoded.schema == schemas.EVENTS

    out = str(tmp_path / "decoded")
    q = (
        decoded.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    def _committed_rows() -> bool:
        try:
            return len(spark.read.schema(schemas.EVENTS).parquet(out).head(1)) > 0
        except Exception:
            return False

    _drain(q, 60, _committed_rows)

    rows = spark.read.schema(schemas.EVENTS).parquet(out).collect()
    assert len(rows) > 0
    types = ("click", "view", "purchase", "scroll", "signup")
    for r in rows:
        assert r.user_id == r.event_id % 150
        assert r.event_type == types[r.event_id % len(types)]
        assert abs(r.value - ((r.event_id * 37) % 10000) / 100.0) < 1e-9
        assert f'"k":{r.event_id % 10}' in r.props
    assert len({r.event_id for r in rows}) == len(rows)  # offsets unique


def test_reactive_ticker_meta_runs_from_bus(spark, tmp_path):
    """The namesake reactive pipeline consumes the message bus directly:
    bus frames -> decoded events -> incremental min/max merge, same
    derived-table schema as the file-sourced path."""
    out = str(tmp_path / "ticker_meta")
    q = reactive_ticker_meta_run(
        spark,
        source_dir=None,
        out_path=out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=False,
        processing_time="1 second",
        dedup_watermark=None,
        bus=rate_bus_stream(spark, rows_per_second=500),
    )
    def _merged_rows() -> bool:
        try:
            return len(spark.read.parquet(out).head(1)) > 0
        except Exception:
            return False

    _drain(q, 60, _merged_rows)

    meta = spark.read.parquet(out)
    rows = meta.collect()
    assert rows
    assert {"symbol", "partition", "monthly_max_market_price", "monthly_min_market_price"} <= set(
        meta.columns
    )
    for r in rows:
        assert r.monthly_min_market_price <= r.monthly_max_market_price
