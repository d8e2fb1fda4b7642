"""Physical-plan assertions (SURVEY.md section 4): the declarative
operators must actually get the Catalyst treatment they were written
for - pushed filters, broadcasts, top-k, no cartesian products."""

from __future__ import annotations

from reactive_data_pipeline_spark.plans import assert_plan, physical_plan
from reactive_data_pipeline_spark.queries import QUERIES

from .conftest import SF_DIR


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["filter_events_click"].build(spark, SF_DIR)
    plan = physical_plan(df)
    assert "PushedFilters" in plan
    assert "event_type" in plan.split("PushedFilters")[1][:300]


def test_scan_prunes_columns(spark):
    df = QUERIES["filter_events_click"].build(spark, SF_DIR)
    plan = physical_plan(df)
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "props" not in read_schema  # unused column not read


def test_topk_plans_take_ordered(spark):
    df = QUERIES["topk_orders"].build(spark, SF_DIR)
    assert_plan(df, contains=("TakeOrderedAndProject",))


def test_q3_broadcasts_dimension(spark):
    df = QUERIES["q3_shipping_priority"].build(spark, SF_DIR)
    assert_plan(df, contains=("BroadcastHashJoin",))


def test_knn_has_no_cartesian(spark):
    df = QUERIES["knn_brute_cosine"].build(spark, SF_DIR)
    assert_plan(df, absent=("CartesianProduct",))


def test_q1_aggregates_partially(spark):
    df = QUERIES["q1_pricing_summary"].build(spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2  # partial + final
