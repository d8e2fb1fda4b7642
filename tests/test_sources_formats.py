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


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with
    ZERO shuffle exchanges - the write-once/join-free-forever layout."""
    from reactive_data_pipeline_spark.sources import write_bucketed

    od = read_table(spark, SF_DIR, "orders")
    li = read_table(spark, SF_DIR, "lineitem")
    write_bucketed(od, "b_orders", str(tmp_path / "b_orders"), "o_orderkey", 8, "o_orderkey")
    write_bucketed(li, "b_lineitem", str(tmp_path / "b_lineitem"), "l_orderkey", 8, "l_orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # sf0.001 tables are broadcast-sized; force the shuffle-family
        # join so the bucketed (exchange-free) path is what's under test.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and it still returns the right row count
        assert joined.count() == li.join(od, li.l_orderkey == od.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """partitionBy('partition') layout + a partition predicate must scan
    only the matching day directories (PartitionFilters, not a full scan
    plus post-filter) - what keeps the reactive layer O(new data)."""
    from pyspark.sql import functions as F
    from reactive_data_pipeline_spark.operators.ticker import (
        build_ticker_meta,
        derive_ticker,
    )
    from reactive_data_pipeline_spark.sources import partitioned_append_sink

    meta = build_ticker_meta(derive_ticker(read_table(spark, SF_DIR, "events")))
    out = str(tmp_path / "meta")
    partitioned_append_sink(meta, out)
    one_day = meta.select("partition").distinct().orderBy("partition").first()[0]
    scan = spark.read.parquet(out).filter(F.col("partition") == one_day)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # predicate lands in PartitionFilters (directory pruning at planning
    # time), not as a post-scan data Filter
    assert "PartitionFilters" in plan
    assert str(one_day) in plan.split("PartitionFilters")[1][:300]
    # the pruned scan returns exactly that day's rows
    expected = meta.filter(F.col("partition") == one_day).count()
    assert scan.count() == expected


def test_compact_dataset_reduces_files_preserves_rows(spark, tmp_path):
    from reactive_data_pipeline_spark.sources import compact_dataset

    path = str(tmp_path / "frag")
    ev = read_table(spark, SF_DIR, "events")
    for i in range(12):  # simulate 12 tiny micro-batch files
        ev.filter(ev.event_id % 12 == i).coalesce(1).write.mode("append").parquet(path)
    import os
    before = sum(f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs)
    assert before >= 12
    n_rows = ev.count()
    n_files = compact_dataset(spark, path)
    after = sum(f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs)
    assert after == n_files == 1  # tiny dataset -> one file
    assert spark.read.parquet(path).count() == n_rows


def test_schema_evolution_merge_and_union(spark, tmp_path):
    """Appends with an evolved schema must stay readable: mergeSchema
    reconciles the files (new column null for old rows), and
    unionByName(allowMissingColumns) does the same for DataFrames."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v2 = spark.createDataFrame([(2, "b", 0.9)], "id long, name string, score double")
    v1.write.mode("append").parquet(path)
    v2.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: 0.9}

    u = v1.unionByName(v2, allowMissingColumns=True)
    assert {r.id: r.score for r in u.collect()} == {1: None, 2: 0.9}


def test_write_sorted_clusters_key_ranges(spark, tmp_path):
    """Range-partitioned sorted files: every file covers a disjoint key
    range (row-group min/max stats become selective for range scans)."""
    import pyarrow.parquet as pq
    import os
    from reactive_data_pipeline_spark.sources import write_sorted

    od = read_table(spark, SF_DIR, "orders")
    out = str(tmp_path / "sorted")
    write_sorted(od, out, ["o_totalprice"], n_files=4)
    ranges = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(out, f), columns=["o_totalprice"])
        vals = t.column(0).to_pylist()
        assert vals == sorted(vals)  # sorted within file
        ranges.append((min(vals), max(vals)))
    ranges.sort()
    assert len(ranges) == 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint ranges across files
    assert spark.read.parquet(out).count() == od.count()


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """A real JDBC source/sink against Spark's bundled embedded Derby -
    the engine-side analogue of the reference's embedded SQLite store
    (write = transactional batch insert, read = partitioned scan)."""
    from reactive_data_pipeline_spark.sources import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/refdb;create=true"
    orig = read_table(spark, SF_DIR, "nation")
    write_jdbc(orig, url, "nation_jdbc")
    back = read_jdbc(spark, url, "nation_jdbc")
    assert back.count() == orig.count()
    assert {r.n_nationkey: r.n_name for r in back.collect()} == {
        r.n_nationkey: r.n_name for r in orig.collect()
    }
    # partitioned read: same rows, parallel tasks
    part = read_jdbc(
        spark, url, "nation_jdbc",
        partition_column="n_nationkey", lower_bound=0, upper_bound=25, num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == orig.count()


def test_jdbc_scan_pushes_filters(spark, tmp_path):
    """Predicates on a JDBC scan must reach the generated SQL as
    PushedFilters (run database-side, not post-scan)."""
    from reactive_data_pipeline_spark.sources import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/pushdb;create=true"
    write_jdbc(read_table(spark, SF_DIR, "nation"), url, "nation_push")
    scan = read_jdbc(spark, url, "nation_push").filter("n_regionkey = 2").select("n_name")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_regionkey" in plan.split("PushedFilters")[1][:200]
    assert scan.count() == 5


def test_streaming_jdbc_sink_matches_batch(spark, tmp_path):
    """Streaming -> JDBC via foreachBatch: events streamed file-by-file
    into an embedded Derby table must land exactly the batch row set
    (each micro-batch one transactional append)."""
    from pyspark.sql import functions as F

    from reactive_data_pipeline_spark.sources import read_jdbc
    from reactive_data_pipeline_spark.streaming import stream_to_jdbc

    events = read_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev_in")
    for i in range(3):
        events.filter(events.event_id % 3 == i).coalesce(1).write.mode("append").parquet(src)

    url = f"jdbc:derby:{tmp_path}/streamdb;create=true"
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select("event_id", "user_id", "event_type", "value")
    )
    q = stream_to_jdbc(stream, url, "events_sink", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert not q.isActive

    back = read_jdbc(spark, url, "events_sink")
    assert back.count() == events.count()
    a = {r.event_id: (r.event_type, r.value) for r in back.collect()}
    b = {r.event_id: (r.event_type, r.value) for r in events.collect()}
    assert a == b

    # Idempotent replay: re-running the whole stream from a FRESH
    # checkpoint re-emits the same batch ids; the batch-id delete-then-
    # insert contract must replace rows, not duplicate them.
    q2 = stream_to_jdbc(stream, url, "events_sink", str(tmp_path / "ckpt_replay"))
    q2.awaitTermination(120)
    assert not q2.isActive
    assert read_jdbc(spark, url, "events_sink").count() == events.count()


def test_scan_cache_contract_and_invalidation(spark, tmp_path):
    """ADVICE r6: the scan memo's immutability contract, pinned. A
    cached read_table result survives a path rewrite (that IS the
    contract - fixtures are immutable per session); mutating callers
    must bypass with use_cache=False or call invalidate_scan_cache."""
    from reactive_data_pipeline_spark.sources.registry import (
        invalidate_scan_cache,
        read_table,
    )

    sf = str(tmp_path)
    spark.createDataFrame([(1,)], "region_key long").write.parquet(
        f"{sf}/region.parquet"
    )
    assert read_table(spark, sf, "region").count() == 1
    # rewrite the path: the cached scan still serves the OLD metadata
    spark.createDataFrame([(1,), (2,)], "region_key long").write.mode(
        "overwrite"
    ).parquet(f"{sf}/region.parquet")
    # bypass sees the new data without touching the cache
    assert read_table(spark, sf, "region", use_cache=False).count() == 2
    # targeted invalidation refreshes the cached entry
    invalidate_scan_cache(spark, sf, "region")
    assert read_table(spark, sf, "region").count() == 2


def test_fresh_plan_disambiguates_self_join_without_inference(spark):
    """Round-8: ``fresh_plan=True`` returns a NEW scan node (fresh
    attribute IDs - a subplan can re-read a table the outer plan also
    joins without tripping the ambiguous-self-join check) while serving
    the schema from the scan memo (no footer-inference job per build).
    Guard both halves plus the events normalizer path (fresh_plan must
    re-normalize from RAW dtypes, not assume the memoized schema)."""
    from pyspark.sql import functions as F

    cached = read_table(spark, SF_DIR, "nation")
    fresh = read_table(spark, SF_DIR, "nation", fresh_plan=True)
    # same data, distinct plan ids: the self-join analyzes and returns n x 1 rows
    joined = cached.join(
        fresh.select(F.col("n_nationkey").alias("fk")),
        cached.n_nationkey == F.col("fk"),
    )
    assert joined.count() == cached.count()
    assert cached.schema == fresh.schema
    # events goes through its normalizer on the raw dtypes
    ev_cached = read_table(spark, SF_DIR, "events")
    ev_fresh = read_table(spark, SF_DIR, "events", fresh_plan=True)
    assert ev_cached.schema == ev_fresh.schema
    assert ev_fresh.count() == ev_cached.count()
