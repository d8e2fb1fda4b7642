"""Connector round-trips: a table written to CSV/JSON and read back with
the declared schema must equal the parquet original (schema fidelity, no
inference job)."""

from __future__ import annotations

from reactive_data_pipeline_spark.sources import (
    read_csv,
    read_json,
    read_table,
    write_format,
)

from .conftest import SF_DIR
from .helpers import assert_df_equal


def test_csv_roundtrip_nation(spark, tmp_path):
    orig = read_table(spark, SF_DIR, "nation")
    write_format(orig, str(tmp_path / "nation_csv"), fmt="csv")
    back = read_csv(spark, str(tmp_path / "nation_csv"), name="nation")
    assert back.schema == orig.schema
    assert_df_equal(back, orig)


def test_json_roundtrip_orders(spark, tmp_path):
    orig = read_table(spark, SF_DIR, "orders")
    write_format(orig, str(tmp_path / "orders_json"), fmt="json")
    back = read_json(spark, str(tmp_path / "orders_json"), name="orders")
    assert back.schema == orig.schema
    assert back.count() == orig.count()
    # spot-check a value column survives the text round-trip
    a = dict((r.o_orderkey, r.o_totalprice) for r in orig.limit(50).collect())
    b = dict((r.o_orderkey, r.o_totalprice) for r in back.collect() if r.o_orderkey in a)
    assert a == b
