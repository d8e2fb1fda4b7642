"""Data-quality check tests: each check must FAIL on planted defects
(the parity test proves the clean-data pass side)."""

from __future__ import annotations

from reactive_data_pipeline_spark.quality import (
    check_in_domain,
    check_not_null,
    check_range,
    check_references,
    check_unique,
    run_suite,
)


def test_checks_catch_planted_defects(spark):
    dirty = spark.createDataFrame(
        [(1, "A", 5.0), (1, "B", -1.0), (None, "Z", 2.0)],
        "id long, status string, v double",
    )
    parent = spark.createDataFrame([(1,)], "pk long")
    report = {
        r.check_name: r
        for r in run_suite(
            [
                check_not_null(dirty, "t", "id"),
                check_unique(dirty, "t", ["id"]),
                check_in_domain(dirty, "t", "status", ["A", "B"]),
                check_range(dirty, "t", "v", 0.0, 10.0),
                check_references(dirty, "t", "id", parent, "pk"),
            ]
        ).collect()
    }
    assert not report["not_null:id"].passed
    assert abs(report["not_null:id"].observed - 1 / 3) < 1e-6
    assert not report["unique:id"].passed  # two id=1 rows (null excluded by count_distinct)
    assert not report["domain:status"].passed and report["domain:status"].observed == 1
    assert not report["range:v"].passed and report["range:v"].observed == 1
    assert report["fk:id->pk"].passed  # both non-null ids exist in parent


def test_clean_data_passes_everything(spark):
    clean = spark.createDataFrame(
        [(1, "A", 5.0), (2, "B", 1.0)], "id long, status string, v double"
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    report = run_suite(
        [
            check_not_null(clean, "t", "id"),
            check_unique(clean, "t", ["id"]),
            check_in_domain(clean, "t", "status", ["A", "B"]),
            check_range(clean, "t", "v", 0.0, 10.0),
            check_references(clean, "t", "id", parent, "pk"),
        ]
    ).collect()
    assert all(r.passed for r in report)
