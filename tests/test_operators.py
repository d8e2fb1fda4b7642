"""Unit tests for the relational operator layer on literal frames
(SURVEY.md section 5.3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from reactive_data_pipeline_spark.operators.joins import anti_join, asof_join, semi_join
from reactive_data_pipeline_spark.operators.relational import exact_sum, top_k


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_top_k_with_total_order(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 7.0), (4, 1.0)], "id long, v double"
    )
    rows = top_k(df, [F.desc("v"), F.asc("id")], 2).collect()
    assert [(r.id, r.v) for r in rows] == [(3, 7.0), (1, 5.0)]


def test_exact_sum_is_order_insensitive(spark):
    vals = [(0.1,)] * 10 + [(1e9,), (-1e9,)]
    df = spark.createDataFrame(vals, "v double")
    total = df.repartition(7).agg(exact_sum("v").alias("s")).collect()[0].s
    assert total == 1.0  # a plain double sum of this ordering drifts


def test_exact_sum_matches_decimal_sum_bitwise(spark):
    """The split-long formulation must reproduce Spark's decimal SUM bit
    for bit: same HALF_UP rounding, same exact accumulation - including
    negatives (floor-division radix decomposition), NULLs (skipped by all
    three digit sums alike), and all-NULL groups (NULL out)."""
    import random

    rng = random.Random(20260815)
    rows = [
        ("g%d" % (i % 5), rng.uniform(-1e6, 1e6) if i % 11 else None)
        for i in range(2000)
    ]
    rows += [("empty", None), ("edge", 0.0000005), ("edge", -0.0000005)]
    df = spark.createDataFrame(rows, "g string, v double").repartition(7)
    got = {
        r.g: r.s
        for r in df.groupBy("g").agg(exact_sum("v").alias("s")).collect()
    }
    want = {
        r.g: r.s
        for r in df.groupBy("g")
        .agg(F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("s"))
        .collect()
    }
    assert got.keys() == want.keys()
    for g in want:
        assert repr(got[g]) == repr(want[g]), (g, got[g], want[g])
    assert got["empty"] is None


def test_semi_anti_partition_left(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, s string")
    right = spark.createDataFrame([(1,), (3,), (3,)], "k long")
    semi = semi_join(left, right, left.k == right.k).collect()
    anti = anti_join(left, right, left.k == right.k).collect()
    assert sorted(r.k for r in semi) == [1, 3]
    assert [r.k for r in anti] == [2]
    assert len(semi) + len(anti) == left.count()


def _asof_frames(spark):
    quotes = spark.createDataFrame(
        [
            ("A", ts("2024-01-01T10:00:00"), 1.0),
            ("A", ts("2024-01-01T11:00:00"), 2.0),
            ("B", ts("2024-01-01T10:30:00"), 9.0),
        ],
        "sym string, qts timestamp_ntz, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, "A", ts("2024-01-01T10:30:00")),  # between quotes -> 1.0
            (2, "A", ts("2024-01-01T11:00:00")),  # exactly at quote -> 2.0
            (3, "A", ts("2024-01-01T09:00:00")),  # before any quote -> null
            (4, "B", ts("2024-01-01T12:00:00")),  # after last -> 9.0
            (5, "C", ts("2024-01-01T12:00:00")),  # no quotes at all -> null
        ],
        "tid long, sym string, tts timestamp_ntz",
    )
    return quotes, trades


def test_asof_backward(spark):
    quotes, trades = _asof_frames(spark)
    out = asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts")
    got = {r.tid: r.px for r in out.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: 9.0, 5: None}
    assert out.count() == trades.count()  # left-join semantics


def test_asof_forward(spark):
    quotes, trades = _asof_frames(spark)
    out = asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts", direction="forward")
    got = {r.tid: r.px for r in out.collect()}
    assert got == {1: 2.0, 2: 2.0, 3: 1.0, 4: None, 5: None}


def test_salted_agg_equals_plain_groupby(spark):
    from reactive_data_pipeline_spark.operators.skew import salted_sum_count
    from reactive_data_pipeline_spark.sources import read_table
    from .conftest import SF_DIR
    from pyspark.sql import functions as F

    ev = read_table(spark, SF_DIR, "events")
    plain = {
        (r.user_id): (round(r.value_total, 6), r.n_rows)
        for r in ev.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("value_total"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    salted = {
        (r.user_id): (round(r.value_total, 6), r.n_rows)
        for r in salted_sum_count(ev, ["user_id"], "value", n_salts=8, salt_on="event_id").collect()
    }
    assert salted == plain


def test_salted_agg_has_two_aggregation_exchanges(spark):
    """The salted plan must actually be two-stage: an aggregation keyed
    (key, salt) and a merge keyed (key)."""
    from reactive_data_pipeline_spark.operators.skew import salted_sum_count
    from reactive_data_pipeline_spark.sources import read_table
    from .conftest import SF_DIR

    ev = read_table(spark, SF_DIR, "events")
    plan = salted_sum_count(ev, ["user_id"], "value", salt_on="event_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # partial+final per stage


def test_salted_join_equals_plain_join(spark):
    """salted_join's result set is exactly the plain inner join: each
    fact row matches only the dim replica carrying its salt (one match,
    no duplicates), and unmatched dim rows drop as in any inner join."""
    from reactive_data_pipeline_spark.operators.skew import salted_join

    f = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 50.0), (3, 20, 7.0), (4, 99, 1.0)],
        "id long, k long, v double",
    )
    d = spark.createDataFrame(
        [(10, "a"), (20, "b"), (30, "c")], "dk long, name string"
    )
    out = salted_join(f, d, "k", "dk", salt_on="id", n_salts=4)
    assert "__salt" not in out.columns
    plain = f.join(d, f["k"] == d["dk"])
    assert out.exceptAll(plain).count() == 0
    assert plain.exceptAll(out).count() == 0


def test_evaluate_once_values_and_barrier(spark):
    """evaluate_once must (a) add the named columns with exactly the
    values of the raw expressions, (b) leave the input columns intact,
    and (c) put a Generate between a downstream filter and the scan so
    the filter cannot be substituted back into the expression trees."""
    from reactive_data_pipeline_spark.operators.relational import evaluate_once

    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc"), (3, "")], "id long, txt string"
    )
    out = evaluate_once(
        df,
        {
            "n_words": F.size(F.split(F.col("txt"), " ")),
            "upper": F.upper(F.col("txt")),
        },
    )
    assert out.columns == ["id", "txt", "n_words", "upper"]
    rows = {r.id: r for r in out.collect()}
    assert rows[1].n_words == 2 and rows[1].upper == "AA BB"
    assert rows[3].n_words == 1  # split("", " ") -> [""]

    filtered = out.filter(F.col("n_words") >= 2)
    assert [r.id for r in filtered.collect()] == [1]
    filtered.collect()
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Generate" in plan, plan
    # the filter must sit ABOVE the Generate (on the generated struct),
    # not be pushed into the scan
    gen_pos = plan.index("Generate")
    filt_pos = plan.index("Filter")
    assert filt_pos < gen_pos, plan


def test_size_fact_side_threshold_and_engagement(spark, tmp_path):
    """size_fact_side (the sf40 SHJ-build OOM fix) engages ONLY above
    the bytes threshold: small tables return the frame untouched (the
    conf-partitioned plan is faster there - measured), big ones get an
    explicit join-key repartition whose partition count tracks file
    bytes; unknown paths stay untouched."""
    from reactive_data_pipeline_spark.queries.relational import size_fact_side

    sf_dir = str(tmp_path)
    df = spark.range(100).withColumnRenamed("id", "k")
    df.write.parquet(f"{sf_dir}/t.parquet")
    small = spark.read.parquet(f"{sf_dir}/t.parquet")

    # tiny table: untouched (identity - same plan object semantics)
    out = size_fact_side(small, "k", sf_dir, "t")
    assert "RepartitionByExpression" not in out._jdf.queryExecution().logical().toString()

    # force engagement with a 1-byte target: partitions = ceil(bytes/1)
    # clamped at max_p, and the repartition keys on the join column
    out = size_fact_side(small, "k", sf_dir, "t", target_bytes=1, max_p=64)
    logical = out._jdf.queryExecution().logical().toString()
    assert "RepartitionByExpression" in logical and "64" in logical
    assert out.rdd.getNumPartitions() == 64

    # unknown table: untouched
    out = size_fact_side(small, "k", sf_dir, "missing")
    assert "RepartitionByExpression" not in out._jdf.queryExecution().logical().toString()

    # composite join keys (round-9 advice: q5's customer side clusters
    # on (c_custkey, c_nationkey)) - the exchange must hash on BOTH
    # keys, or EnsureRequirements tops it with a second full-key
    # shuffle at the conf count, voiding the sizing
    two = small.withColumn("k2", small.k % 7)
    out = size_fact_side(two, ("k", "k2"), sf_dir, "t", target_bytes=1, max_p=64)
    logical = out._jdf.queryExecution().logical().toString()
    assert "RepartitionByExpression" in logical
    assert "k2" in logical.split("RepartitionByExpression")[1].splitlines()[0]
    assert out.rdd.getNumPartitions() == 64
