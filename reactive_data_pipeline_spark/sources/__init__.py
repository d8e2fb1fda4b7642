"""Source / sink layer.

The reference's only connectors are a SQLite JDBC-class resource
(``/root/reference/dagster_repository/resources.py:11-26``) and a REST
JSON source (``ops.py:13-29``). This package standardizes on parquet
(batch + stream) over the driver testdata, behind a registry small enough
that a JDBC or Kafka source drops in by adding one normalizer entry.
"""

from .bus import BUS_WIRE, decode_bus_events, kafka_stream, rate_bus_stream
from .registry import (
    read_table,
    read_stream,
    read_csv,
    read_json,
    read_orc,
    write_format,
    write_bucketed,
    compact_dataset,
    write_sorted,
    read_jdbc,
    write_jdbc,
    register_views,
    append_sink,
    partitioned_append_sink,
    table_path,
)

__all__ = [
    "BUS_WIRE",
    "decode_bus_events",
    "kafka_stream",
    "rate_bus_stream",
    "read_table",
    "read_stream",
    "read_csv",
    "read_json",
    "read_orc",
    "write_format",
    "write_bucketed",
    "compact_dataset",
    "write_sorted",
    "read_jdbc",
    "write_jdbc",
    "register_views",
    "append_sink",
    "partitioned_append_sink",
    "table_path",
]
