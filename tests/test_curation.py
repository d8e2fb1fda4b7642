"""Behavioral tests for the curation operators (contamination check,
stratified domain mixing, PII scrub) on constructed inputs - the
catalog parity test covers the value-level oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from reactive_data_pipeline_spark.functions.curation import (
    contamination_overlap,
    digit_count,
    scrub_digit_runs,
    stratified_keep,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_flags_leaked_trigrams(spark):
    bench = _frame(spark, [(100, "alpha beta gamma delta epsilon")])
    docs = _frame(
        spark,
        [
            (1, "alpha beta gamma something else entirely here"),  # leaks one trigram+
            (2, "totally clean words with no overlap at all"),
            (3, "alpha beta gamma delta epsilon verbatim copy of it"),  # heavy leak
        ],
    )
    got = {r.doc_id: r for r in contamination_overlap(docs, bench, n=3).collect()}
    assert got[1].n_contaminated == 1  # only "alpha beta gamma"
    assert got[2].n_contaminated == 0
    assert got[3].n_contaminated == 3  # all three benchmark trigrams
    assert got[3].contamination_ratio > got[1].contamination_ratio > 0.0


def test_contamination_drops_short_docs(spark):
    bench = _frame(spark, [(100, "alpha beta gamma")])
    docs = _frame(spark, [(1, "two words"), (2, "alpha beta gamma tail")])
    ids = {r.doc_id for r in contamination_overlap(docs, bench, n=3).collect()}
    assert ids == {2}  # doc 1 has no trigram -> no row, matching the oracle


def test_stratified_keep_is_deterministic_and_rate_accurate(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    kept = df.filter(stratified_keep(df, F.lit(0.3), "k"))
    n1, n2 = kept.count(), df.filter(stratified_keep(df, F.lit(0.3), "k")).count()
    assert n1 == n2  # identical subset on re-run
    assert abs(n1 / 10_000 - 0.3) < 0.02  # rate lands near target
    # monotone: a higher rate keeps a superset
    more = df.filter(stratified_keep(df, F.lit(0.6), "k"))
    assert more.count() > n1
    assert kept.exceptAll(more).count() == 0


def test_scrub_masks_digit_runs(spark):
    df = spark.createDataFrame(
        [("acct 123456 and code 99",), ("no digits here",)], "s string"
    )
    out = df.select(
        scrub_digit_runs("s").alias("m"), digit_count("s").alias("n")
    ).collect()
    assert out[0].m == "acct <ID> and code <ID>"
    assert out[0].n == 8
    assert out[1].m == "no digits here"
    assert out[1].n == 0


def test_cms_one_sided_and_mergeable(spark):
    """CMS estimates never undercount; building one sketch over a union
    equals cell-wise-adding the parts' sketches (the mergeability that
    makes it a distributed sketch)."""
    from reactive_data_pipeline_spark.sketches import cms_build, cms_estimate

    a = spark.createDataFrame([(i % 7,) for i in range(200)], "k long")
    b = spark.createDataFrame([(i % 5,) for i in range(100)], "k long")
    union = a.union(b)
    exact = {r.k: r.n for r in union.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    keys = union.select("k").distinct()
    est_union = {
        r.k: r.est_n for r in cms_estimate(cms_build(union, "k"), keys, "k").collect()
    }
    for k, n in exact.items():
        assert est_union[k] >= n
    # merge = cell-wise sum of the two part sketches
    merged = (
        cms_build(a, "k").union(cms_build(b, "k"))
        .groupBy("r", "b").agg(F.sum("n").alias("n"))
    )
    est_merged = {r.k: r.est_n for r in cms_estimate(merged, keys, "k").collect()}
    assert est_merged == est_union
