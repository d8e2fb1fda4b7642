"""Message-bus streaming sources (Kafka-shaped).

The reference's defining input is an event log polled by a sensor
(``sensors.py:6-16``) - a message bus in spirit. Structured Streaming's
native bus connector is Kafka, whose wire schema is fixed; this module
treats that schema as the engine's bus contract:

* :func:`kafka_stream` - the real connector (needs the
  ``spark-sql-kafka`` package on the classpath; raises a clear error
  otherwise).
* :func:`rate_bus_stream` - the built-in ``rate`` source dressed in the
  SAME wire schema, generating deterministic synthetic events. Zero
  external dependencies, so the full bus path (wire frame -> decode ->
  normalized events -> reactive merge) is exercisable in any
  environment, and swapping in real Kafka is a one-line source change.
* :func:`decode_bus_events` - wire frame -> normalized ``events`` rows
  (JSON payload parse, JVM-side ``from_json``).

Scale notes: a Kafka scan parallelizes by topic partition - match
``minPartitions`` to the cluster, not the topic. Decoding is a narrow
map; the stream stays shuffle-free until the consumer aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Kafka's fixed wire schema - the bus contract every source emits.
BUS_WIRE = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)

#: JSON payload schema carried in ``value`` (events wire format).
_PAYLOAD = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_EVENT_TYPES = ("click", "view", "purchase", "scroll", "signup")


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    min_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """Streaming scan of a Kafka topic in the :data:`BUS_WIRE` shape.

    Requires the ``spark-sql-kafka-0-10`` package (not bundled with a
    bare pyspark install); the load error is rewrapped so a missing
    connector reads as a deployment problem, not a code bug.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - depends on classpath
        raise RuntimeError(
            "Kafka connector unavailable: add the spark-sql-kafka-0-10 "
            "package to the session (spark.jars.packages). Original: "
            f"{e}"
        ) from e


def rate_bus_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    topic: str = "events",
    num_users: int = 150,
    num_partitions: int | None = None,
) -> DataFrame:
    """The built-in ``rate`` source emitting :data:`BUS_WIRE` frames.

    Every field of the synthetic event derives deterministically from
    the rate source's monotone ``value`` counter (tests recompute the
    mapping), and the payload is the JSON wire format
    :func:`decode_bus_events` parses. All JVM expressions - the
    generator keeps up with six-figure rows/sec in local mode.
    """
    reader = spark.readStream.format("rate").option("rowsPerSecond", str(rows_per_second))
    if num_partitions is not None:
        reader = reader.option("numPartitions", str(num_partitions))
    rate = reader.load()  # columns: timestamp, value
    eid = F.col("value")
    etype = F.element_at(
        F.array(*[F.lit(t) for t in _EVENT_TYPES]), (F.pmod(eid, F.lit(len(_EVENT_TYPES))) + 1).cast("int")
    )
    payload = F.to_json(
        F.struct(
            eid.alias("event_id"),
            F.col("timestamp").alias("ts"),
            F.pmod(eid, F.lit(num_users)).alias("user_id"),
            etype.alias("event_type"),
            (F.pmod(eid * F.lit(37), F.lit(10000)) / 100.0).alias("value"),
            F.to_json(F.struct(F.pmod(eid, F.lit(10)).alias("k"))).alias("props"),
        )
    )
    return rate.select(
        F.pmod(eid, F.lit(num_users)).cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.spark_partition_id().alias("partition"),
        eid.alias("offset"),
        F.col("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def decode_bus_events(bus: DataFrame) -> DataFrame:
    """Wire frames -> normalized ``events`` rows (schemas.EVENTS).

    ``from_json`` with the declared payload schema (never inference on a
    stream); corrupt payloads parse to NULL columns rather than killing
    the query - filter ``event_id IS NOT NULL`` downstream if the bus
    carries foreign traffic. The session-tz instant becomes the same
    ``timestamp_ntz`` every batch operator sees (UTC session pin).
    """
    parsed = bus.select(F.from_json(F.col("value").cast("string"), _PAYLOAD).alias("e"))
    return parsed.select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.ts").cast("timestamp_ntz").alias("ts"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
    )
