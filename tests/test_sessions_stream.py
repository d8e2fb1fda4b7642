"""Stream-batch equivalence for the applyInPandasWithState sessionizer:
replaying time-ordered event splits through sessionize_stream and keeping
the last emission per session must reproduce the batch lag+running-sum
sessionization exactly (counts, durations; values to float tolerance)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reactive_data_pipeline_spark.queries import QUERIES
from reactive_data_pipeline_spark.sources import read_table, read_stream
from reactive_data_pipeline_spark.streaming import latest_sessions, sessionize_stream

from .conftest import SF_DIR


@pytest.fixture()
def session_dirs(tmp_path):
    src = tmp_path / "events_in"
    src.mkdir()
    return src, str(tmp_path / "out"), str(tmp_path / "ckpt")


def test_stream_sessionize_matches_batch(spark, session_dirs):
    src, out, ckpt = session_dirs
    events = read_table(spark, SF_DIR, "events")
    # Three splits partitioned ON TIME (the operator's ordering contract):
    # file order is arrival order for the file source.
    ts = events.select(F.col("ts").cast("timestamp").cast("long").alias("e")).agg(
        F.min("e"), F.max("e")
    ).first()
    lo, hi = ts[0], ts[1] + 1
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    epoch = F.col("ts").cast("timestamp").cast("long")
    for pred in (epoch < cut1, (epoch >= cut1) & (epoch < cut2), epoch >= cut2):
        events.filter(pred).coalesce(1).write.mode("append").parquet(str(src))

    stream = sessionize_stream(
        read_stream(spark, str(src), "events", max_files_per_trigger=1)
    )
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
        (r.user_id, r.session_no): (r.n_events, r.duration_s, round(r.session_value, 6))
        for r in latest_sessions(spark.read.parquet(out)).collect()
    }
    expected = {
        (r.user_id, r.session_no): (r.n_events, r.duration_s, round(r.session_value, 6))
        for r in QUERIES["sessionize_events"].build(spark, SF_DIR).collect()
    }
    assert got == expected
