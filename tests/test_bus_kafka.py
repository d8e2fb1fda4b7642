"""Kafka-leg tests for the bus source (sources/bus.py).

The sandbox has no network and no spark-sql-kafka jar, so the live
connector cannot run here; what IS testable everywhere:

* the documented failure mode - a missing connector must surface as the
  deployment-problem RuntimeError, not a raw ClassNotFoundException;
* the wire contract - when the connector class is present the stream
  frame must carry exactly the BUS_WIRE schema;
* package resolution - gated on an actual network probe, a subprocess
  session resolves ``spark.jars.packages`` and loads the provider class
  (skips cleanly offline, runs on any internet-connected dev machine).

The rate-source twin (rate_bus_stream) carries the decode-path coverage
in test_streaming_reactive.py regardless of environment.
"""

from __future__ import annotations

import socket
import subprocess
import sys

import pytest

from reactive_data_pipeline_spark.sources.bus import BUS_WIRE, kafka_stream

KAFKA_PROVIDER = "org.apache.spark.sql.kafka010.KafkaSourceProvider"


def _kafka_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(KAFKA_PROVIDER)
        return True
    except Exception:
        return False


def _maven_reachable(timeout: float = 2.0) -> bool:
    try:
        with socket.create_connection(("repo1.maven.org", 443), timeout=timeout):
            return True
    except OSError:
        return False


def test_kafka_missing_connector_is_deployment_error(spark):
    """Without the connector jar, kafka_stream must fail with the
    rewrapped deployment message naming the package to add - the error
    a user actually needs - never a bare JVM class-not-found."""
    if _kafka_on_classpath(spark):
        pytest.skip("spark-sql-kafka present: the failure mode does not exist here")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_stream(spark, "localhost:9092", "events")


def test_kafka_wire_schema_when_connector_present(spark):
    """With the connector on the classpath, the streaming frame is
    exactly the BUS_WIRE contract (no broker needed: Kafka connects at
    query start, not plan time)."""
    if not _kafka_on_classpath(spark):
        pytest.skip("spark-sql-kafka not on classpath in this environment")
    frame = kafka_stream(spark, "localhost:9092", "events", min_partitions=4)
    assert frame.isStreaming
    assert [(f.name, f.dataType) for f in frame.schema.fields] == [
        (f.name, f.dataType) for f in BUS_WIRE.fields
    ]


@pytest.mark.slow
def test_kafka_package_resolution_online():
    """Resolve the connector via spark.jars.packages in a clean
    subprocess session and prove the provider class loads. Gated on a
    real network probe so the offline sandbox skips instead of hanging
    in ivy retries."""
    if not _maven_reachable():
        pytest.skip("no route to Maven Central: package resolution untestable offline")
    import pyspark

    scala = "2.13"
    probe = f"""
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[1]")
    .config("spark.jars.packages",
            "org.apache.spark:spark-sql-kafka-0-10_{scala}:{pyspark.__version__}")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark._jvm.java.lang.Class.forName("{KAFKA_PROVIDER}")
frame = (spark.readStream.format("kafka")
    .option("kafka.bootstrap.servers", "localhost:9092")
    .option("subscribe", "t").load())
assert frame.isStreaming
print("KAFKA_RESOLVED_OK")
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True, timeout=600
    )
    assert "KAFKA_RESOLVED_OK" in out.stdout, out.stderr[-2000:]
