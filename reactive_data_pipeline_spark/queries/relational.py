"""Relational-core catalog queries over the star schema.

Generalizes the reference's filter/aggregate/sort/limit surface
(SURVEY.md sections 2.2-2.8) to the driver's TPC-H-ish corpus. Every
query here is pure DataFrame API -> Catalyst; comments call out the
intended physical plan at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import anti_join, asof_join, broadcast_join, semi_join
from ..operators.relational import ensure_parallelism, exact_avg, exact_sum, top_k
from ..sources import read_table
from . import register

_REV = "l_extendedprice * (1 - l_discount)"


def size_fact_side(
    df: DataFrame, key: str | tuple[str, ...], sf_dir: str, table: str,
    target_bytes: int = 32 << 20, conf_p: int = 32, max_p: int = 4096,
) -> DataFrame:
    """Bound a ``shuffle_hash`` build side's per-task size at ANY scale
    factor - engaging only when the session conf would be unsafe.

    The round-8 sf40 (400x) volume run exposed the failure mode the
    round-7 advice predicted: an SHJ build side that is a constant
    FRACTION of a fact table grows linearly with SF, and with a fixed
    shuffle-partition count its per-task hash relation eventually
    exceeds the execution pool - SHJ builds do not spill, so q3 died
    at sf40 with "Can't acquire 268435456 bytes memory to build hash
    relation" (SMJ survives mis-sized partitions because sort spills;
    a real deployment never runs a 240M-row shuffle over 32
    partitions). The fix is the CC-loop discipline applied to join
    exchanges: repartition the build side ON ITS JOIN KEY with a
    bytes-derived partition count (the probe side co-partitions to
    match), so per-task build stays roughly constant as data grows.

    Engaged LAZILY: when ``table_file_bytes / 32MB <= 2 * conf_p`` the
    frame is returned untouched - the conf-partitioned plan is both
    safe there and measurably faster (an explicit REPARTITION_BY_NUM
    pins the exchange and keeps AQE from coalescing/local-reading it:
    a same-window sf10 A/B read 2.99s conf vs 3.26s pinned for q3).
    Unknown size (0, e.g. a remote URI) -> untouched.

    ``key`` must be ALL of the join's equi-keys for this side (a tuple
    for composite joins): EnsureRequirements only accepts an existing
    hash partitioning that matches the join's clustering keys, so a
    subset-key exchange risks being topped with a SECOND full-key
    shuffle at the conf count - exactly the unsized build the sizing
    exists to prevent (round-9 advice: q5's customer side clusters on
    (c_custkey, c_nationkey), not c_custkey alone).
    """
    from ..sources.registry import table_size_bytes

    n_raw = -(-table_size_bytes(sf_dir, table) // target_bytes)
    if n_raw <= 2 * conf_p:
        return df
    keys = (key,) if isinstance(key, str) else tuple(key)
    return df.repartition(min(n_raw, max_p), *keys)


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Aggregation family (A1-A4 generalized)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST({_REV} * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: scan -> pushed filter -> hash agg (partial+final).

    One shuffle of 6 doubles per (flag, status) group per map task; scales
    to any input size. Filter reaches the parquet scan as a PushedFilter
    (it pushes through the parallelism floor, which is the explicit
    opt-in for this query's CPU-bound 7-decimal-aggregate map stage).
    """
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        ensure_parallelism(
            read_table(spark, sf_dir, "lineitem").filter(
                F.col("l_shipdate") <= _ts("2000-12-01 00:00:00")
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            exact_sum(rev).alias("sum_disc_price"),
            exact_sum(rev * (1 + F.col("l_tax"))).alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_orders_status",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(o_totalprice) AS avg_spend,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_orders_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("total_spend"),
            exact_avg("o_totalprice").alias("avg_spend"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "count_distinct_lineitem",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def count_distinct_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "rollup_lineitem_flags",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def rollup_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: Catalyst expands the rollup into one Expand + single
    aggregation - still one shuffle."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), exact_sum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "cube_orders_status_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


@register(
    "orders_by_month",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
    tags=("agg", "datetime"),
    bench=True,
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.trunc(F.to_date("o_orderdate"), "MM").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_orders"), exact_sum("o_totalprice").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Filters / projections (P1-P2 generalized)
# ---------------------------------------------------------------------------


@register(
    "filter_events_click",
    oracle="""
    SELECT event_id, user_id, value, CAST(ts AS DATE) AS day
    FROM events WHERE event_type = 'click' AND value > 250.0
    """,
    tags=("filter", "scan"),
)
def filter_events_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 generalized: conjunctive predicate, both conjuncts pushable to
    the parquet scan; projection prunes to 4 columns at the reader."""
    ev = read_table(spark, sf_dir, "events")
    return ev.filter((F.col("event_type") == "click") & (F.col("value") > 250.0)).select(
        "event_id", "user_id", "value", F.to_date("ts").alias("day")
    )


@register(
    "proj_part_catalog",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_u,
           p_brand || ':' || p_type AS brand_type,
           round(p_retailprice * 1.1, 2) AS uplift_price
    FROM part WHERE p_size BETWEEN 10 AND 40
    """,
    tags=("project", "filter"),
)
def proj_part_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1's shape (select + rename + compute) over part, with a range
    predicate (the reference only has equality - SURVEY.md section 2.2)."""
    return (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 40))
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_u"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.round(F.col("p_retailprice") * 1.1, 2).alias("uplift_price"),
        )
    )


# ---------------------------------------------------------------------------
# Sorts / limits (O1 generalized)
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("topk",),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 generalized: plans as TakeOrderedAndProject (per-partition heap,
    no global sort) - the k rows come out of any input size."""
    return top_k(
        read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", F.col("o_orderdate").cast("date").alias("o_orderdate")
        ),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        10,
    )


# ---------------------------------------------------------------------------
# Joins (section 2.3)
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join -> agg -> top-k. customer is the small filtered side:
    AQE converts it to broadcast at runtime; lineitem never shuffles for
    the customer join. The shipdate filter leaves lineitem the far
    smaller side of the orderkey join, so it carries a ``shuffle_hash``
    hint (per-task hash build on the filtered side beats sorting the
    orders shuffle; same rationale as q5) - and because that build side
    is a constant fraction of the LARGEST fact, the exchange is sized
    to the data above the safety threshold (:func:`size_fact_side`):
    at 400x volume the conf-fixed 32-partition build exceeded the
    unspillable SHJ pool ("Can't acquire ... to build hash relation");
    a bytes-derived repartition on the join key keeps the per-task
    build bounded at any SF (the other side co-partitions to match),
    while at gate/100x scale the conf plan is returned untouched."""
    cust = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-06-30 00:00:00")
    )
    li = size_fact_side(
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > _ts("1998-06-30 00:00:00")),
        "l_orderkey", sf_dir, "lineitem",
    ).hint("shuffle_hash")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    agg = (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(rev).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
    )
    return top_k(agg, [F.desc("revenue"), F.asc("l_orderkey")], 10)


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name,
           CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
    bench=True,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way star join. region/nation are broadcast explicitly (fixed-size
    dims); supplier is left to AQE. The only large shuffle is
    lineitem<->orders on orderkey.

    The filtered join sides carry ``shuffle_hash`` hints: the default
    sort-merge join sorts the FULL 60M-row lineitem shuffle output
    before merging, while a shuffled hash join builds its per-task map
    on the hinted (filtered) side and streams the fact unsorted -
    measured 4.5s -> 3.1s at 100x volume, values identical. Scale
    note: SHJ's per-task build is side_bytes/shuffle_partitions of the
    SMALLER, pre-filtered side (uniform orderkey/custkey, AQE skew
    split applies), which is the standard safe case; the hint is
    deliberately NOT on any unfiltered side (q10 measured SMJ faster
    there - a 15M-row build map costs more than the sort).

    Round 8 (round-7 advice): the round-7 version hinted the
    UNFILTERED customer table - customer scales linearly with SF and
    Spark's SHJ build does not spill, so at deployment scale that
    build map is an OOM exposure. Instead of dropping the hint (the
    A/B showed it worth ~15% at 100x volume: orders-only 3.64s vs
    3.09s), customer now gets the TRANSITIVE region predicate pushed
    down first: c_nationkey must be an ASIA nation (implied by
    c_nationkey = s_nationkey = n_nationkey AND r_name = 'ASIA', a
    closure Catalyst does not derive through the join chain). The
    broadcast semi-join against the 25-row nation|x|region(ASIA) dim
    cuts customer to ~1/5 BEFORE its shuffle, making it a genuinely
    filtered build side (same rationale as orders; per-task build
    ~= customer_bytes/5/shuffle_partitions). Interleaved same-window
    medians: sf10 semi 3.05s vs both-hints 3.09 vs orders-only 3.64;
    sf0.1 semi ~= both-hints (0.74-0.76) with orders-only ~0.18s
    cheaper there purely from the extra broadcast subjob's scheduling
    floor - the volume axis and the OOM-exposure removal decide.
    The dim subplan reads nation/region with ``fresh_plan=True`` -
    fresh plan IDs so the outer broadcast joins on the same tables stay
    unambiguous, schema served from the scan memo so no footer
    re-inference job runs per build.

    Round-8 continuation (the sf40 lesson, see q3): both hinted build
    sides are constant FRACTIONS of linear tables, so their exchanges
    are sized to the data above the safety threshold
    (:func:`size_fact_side`) - per-task SHJ build stays bounded at any
    SF instead of growing with it under a conf-fixed partition count,
    and below the threshold the conf plan is returned untouched."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation")
    supplier = read_table(spark, sf_dir, "supplier")
    an = read_table(spark, sf_dir, "nation", fresh_plan=True)
    ar = read_table(spark, sf_dir, "region", fresh_plan=True).filter(F.col("r_name") == "ASIA")
    asia_keys = an.join(F.broadcast(ar), an.n_regionkey == ar.r_regionkey).select(
        F.col("n_nationkey").alias("asia_nk")
    )
    customer = read_table(spark, sf_dir, "customer")
    customer = size_fact_side(
        customer.join(
            F.broadcast(asia_keys), customer.c_nationkey == F.col("asia_nk"), "semi"
        ),
        ("c_custkey", "c_nationkey"), sf_dir, "customer",
    ).hint("shuffle_hash")
    orders = size_fact_side(
        read_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
        ),
        "o_orderkey", sf_dir, "orders",
    ).hint("shuffle_hash")
    li = read_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(customer, (orders.o_custkey == customer.c_custkey) & (customer.c_nationkey == supplier.s_nationkey))
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(exact_sum(rev).alias("revenue"))


@register(
    "broadcast_nation_region",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    tags=("join", "broadcast"),
)
def broadcast_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return broadcast_join(nation, region, nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "semi"),
)
def semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return semi_join(cust, orders, cust.c_custkey == orders.o_custkey).select("c_custkey", "c_name")


@register(
    "anti_customers_no_urgent",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    tags=("join", "anti"),
)
def anti_customers_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join against a filtered build side (every customer has *some*
    order in this corpus, so the plain NOT EXISTS would be vacuous)."""
    cust = read_table(spark, sf_dir, "customer")
    urgent = read_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return anti_join(cust, urgent, cust.c_custkey == urgent.o_custkey).select("c_custkey", "c_name")


@register(
    "left_join_order_counts",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join", "outer", "agg"),
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(exact_sum("o_totalprice"), F.lit(0.0)).alias("spend"),
        )
    )


@register(
    "asof_purchase_before_click",
    oracle="""
    SELECT l.event_id, l.user_id,
           epoch_us(CAST(l.ts AS TIMESTAMP)) AS ts_us,
           r.value AS last_purchase_value,
           epoch_us(CAST(r.ts AS TIMESTAMP)) AS last_purchase_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    tags=("join", "asof"),
    bench=True,
)
def asof_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY.md section 7.6.4): nearest prior purchase per
    click, per user. Single shuffle on user_id via the union-window trick
    in operators.joins.asof_join - no range cross-product."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = asof_join(clicks, purchases, on="user_id", left_ts="ts", right_ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value").alias("last_purchase_value"),
        F.unix_micros(F.col(f"ts_r").cast("timestamp")).alias("last_purchase_ts_us"),
    )


# ---------------------------------------------------------------------------
# Set operations (section 2.7)
# ---------------------------------------------------------------------------


def _cust_nations(spark, sf_dir):
    return read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()


def _supp_nations(spark, sf_dir):
    return read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()


@register(
    "set_nations_intersect",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_nations_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "set_nations_except",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_nations_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir)).distinct()


@register(
    "set_nations_union",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    UNION
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_nations_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir)).distinct()


@register(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
    tags=("distinct",),
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# Window functions (section 2.5)
# ---------------------------------------------------------------------------


@register(
    "window_top3_orders_per_cust",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window",),
    bench=True,
)
def window_top3_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k via row_number: one shuffle on the partition key.
    (At cluster scale with few huge keys, AQE skew handling or a pre-agg
    top-k per partition would apply; custkey here is high-cardinality.)"""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_cumsum_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
    FROM orders
    """,
    tags=("window",),
    bench=True,
)
def window_cumsum_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate (the per-symbol running min/max analogue of
    SURVEY.md section 2.5). Sequential left-to-right accumulation is
    order-deterministic, so the double sum is engine-portable."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spend")
    )


@register(
    "window_lag_events",
    oracle="""
    SELECT event_id, user_id,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
    tags=("window", "events"),
)
def window_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", (F.col("value") - F.lag("value").over(w)).alias("delta")
    )


# ---------------------------------------------------------------------------
# Scalar functions: JSON (section 2.8)
# ---------------------------------------------------------------------------


@register(
    "json_props_by_type",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS k_avg
    FROM events GROUP BY event_type
    """,
    tags=("json", "agg", "events"),
    bench=True,
)
def json_props_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-double ratios are last-ulp sensitive across engines (DuckDB sums
    BIGINT into HUGEINT); round the ratio to 6 dp on both sides so the
    value-hash is representation-independent."""
    from ..functions.json_ops import props_int

    k = props_int("props", "k")
    return (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(k).alias("k_total"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(k).cast("double") / F.count(F.lit(1)), 6).alias("k_avg"),
        )
    )
