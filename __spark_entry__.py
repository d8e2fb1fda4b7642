"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). The catalog itself lives in
``reactive_data_pipeline_spark.queries``; this module is the thin
adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reactive_data_pipeline_spark.queries import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md section 7.1): pricing summary - scan ->
    pushed filter -> grouped decimal-exact aggregation."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["q1_pricing_summary"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2/7.5."""
    return {name: q.build for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; omitted entries (minhash/simhash/LSH/pandas-UDF
    features) are approximate or engine-hash-specific by nature and get
    the driver's rows-only check."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
