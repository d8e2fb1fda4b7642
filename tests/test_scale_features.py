"""At-scale execution features the 100 TB design leans on, asserted
locally: dynamic partition pruning (the star-schema join must skip fact
partitions the dimension filter rules out), AQE shuffle coalescing (the
runtime must shrink over-provisioned shuffle partitions), runtime
bloom-filter join pruning, schema evolution via mergeSchema,
corrupt-file tolerance, and the ORC connector round-trip.

The reference has none of these concerns (single SQLite file,
`/root/reference/dagster_repository/resources.py`); they exist because
the engine's contract is the same queries at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reactive_data_pipeline_spark.plans import physical_plan
from reactive_data_pipeline_spark.sources import read_orc, read_table, write_format

from .conftest import SF_DIR
from .helpers import assert_df_equal


def test_orc_roundtrip_customer(spark, tmp_path):
    orig = read_table(spark, SF_DIR, "customer")
    write_format(orig, str(tmp_path / "customer_orc"), fmt="orc")
    back = read_orc(spark, str(tmp_path / "customer_orc"), name="customer")
    assert back.schema == orig.schema
    assert_df_equal(back, orig)


def test_dynamic_partition_pruning(spark, tmp_path):
    """A fact partitioned by day, joined to a dimension filtered on an
    attribute, must scan only the days the dimension survives - the
    filter is not on the fact, so only DPP can prune. At 100 TB this is
    the difference between reading one week and reading three years.
    """
    fact_path = str(tmp_path / "orders_by_day")
    o = read_table(spark, SF_DIR, "orders").withColumn("day", F.to_date("o_orderdate"))
    o.write.mode("overwrite").partitionBy("day").parquet(fact_path)

    # Day dimension with an attribute only it knows (first-3-days flag).
    dim = (
        o.select("day")
        .distinct()
        .withColumn("is_peak", F.dayofmonth("day") <= 3)
    )
    fact = spark.read.parquet(fact_path)
    joined = fact.join(dim.filter("is_peak"), "day").select("o_orderkey", "day")

    plan = physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan

    expected = (
        o.filter(F.dayofmonth("day") <= 3).select("o_orderkey", "day")
    )
    assert_df_equal(joined, expected)


def test_aqe_coalesces_overprovisioned_shuffle(spark):
    """With 4 configured shuffle partitions but only 3 groups of tiny
    data, AQE's runtime statistics must coalesce the exchange reads
    rather than schedule empty tasks. Locally this saves milliseconds;
    on a 1000-executor job with shuffle.partitions sized for the
    biggest stage, it is what makes the small stages cheap."""
    li = read_table(spark, SF_DIR, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()  # adaptive plans finalize on execution
    plan = physical_plan(agg)
    assert "AQEShuffleRead" in plan, plan
    assert "coalesced" in plan, plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """A selective dimension filter on a shuffled join must inject a
    runtime bloom filter on the fact side (Spark's runtime row-level
    semi-filter), so fact rows that cannot match die before the
    exchange - at 100 TB that is the difference between shuffling the
    whole fact table and shuffling the matching slice. Broadcast joins
    don't need it (the hash table IS the filter), so the test forces a
    shuffle join above the broadcast threshold."""
    li = read_table(spark, SF_DIR, "lineitem")
    o = read_table(spark, SF_DIR, "orders").filter("o_orderpriority = '1-URGENT'")
    prior = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "10GB",
        ),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # sf0.001's fact scan is KB, far under the 10GB application-side
        # floor that guards against filtering scans too small to matter;
        # drop it (and the broadcast threshold) so the at-scale plan
        # shape appears. The creation-side threshold is a MAXIMUM (the
        # bloom build must stay driver-affordable) and the tiny filtered
        # dimension is well under the default.
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_quantity"
        )
        plan = physical_plan(joined)
        assert "bloomfilter" in plan.lower().replace("_", ""), plan
        # correctness unaffected by the runtime filter
        n_filtered = joined.count()
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        n_plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert n_filtered == n_plain
    finally:
        for k, v in prior.items():
            spark.conf.set(k, v)


def test_schema_evolution_merge(spark, tmp_path):
    """A corpus dataset evolves: later files carry a new column. The
    reader must surface the superset schema with nulls for old files -
    re-writing 100 TB to add a column is not an option."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "alpha")], "doc_id long, text string"
    ).write.parquet(p)
    spark.createDataFrame(
        [(2, "beta", "en")], "doc_id long, text string, lang string"
    ).write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r.doc_id: r.lang for r in merged.collect()}
    assert rows == {1: None, 2: "en"}


def test_ignore_corrupt_files_skips_bad_parquet(spark, tmp_path):
    """One corrupt file among thousands must not kill a corpus scan
    when the pipeline opts into ignoreCorruptFiles; with the option off
    the same scan must fail loudly (silent skipping is never the
    default)."""
    import pytest

    p = tmp_path / "mixed"
    p.mkdir()
    spark.createDataFrame([(1, "ok")], "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(p / "good"))
    (p / "bad" ).mkdir()
    (p / "bad" / "part-corrupt.parquet").write_bytes(b"PAR1 this is not parquet")
    paths = [str(p / "good"), str(p / "bad")]
    prior = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        got = spark.read.schema("doc_id long, text string").parquet(*paths).collect()
        assert [(r.doc_id, r.text) for r in got] == [(1, "ok")]
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
        with pytest.raises(Exception):
            spark.read.schema("doc_id long, text string").parquet(*paths).collect()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prior)


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime skew handling: with one key carrying ~90% of rows and a
    dim side that cannot broadcast, AQE must re-plan the sort-merge
    join with the hot partition SPLIT (`skew=true` / `AQEShuffleRead
    skewed` in the final adaptive plan) - the runtime complement of the
    deterministic salting operators in operators/skew.py."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8192",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 97).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(97).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 200_000  # every row keeps its match
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
