"""Second extension batch: correlated-subquery shapes (EXISTS / IN /
correlated scalar), the remaining classic TPC-H query skeletons adapted
to the driver schema, range-frame and distribution windows, calendar
gap-fill, multiset (ALL) set ops, corpus document-frequency stats, and
feature scaling for training-data prep.

Same contract as queries.relational: each query pairs a Spark-native
build with a DuckDB oracle using identical aliases. The reference has
no subqueries at all (SURVEY.md section 2.2: only equality predicates,
resources.py:58-67), so everything here is the engine generalizing the
surface for corpus parity; the subquery shapes matter because they are
the standard relational forms Catalyst de-correlates into joins - the
plans below write that join form explicitly so the intended physical
strategy (semi join / aggregate-then-join) is pinned rather than left
to rewrite rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import ensure_parallelism, exact_sum
from ..sources import read_table
from . import register


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Correlated subquery shapes (Catalyst de-correlates these into joins;
# we write the join form directly so the physical plan is explicit)
# ---------------------------------------------------------------------------


@register(
    "exists_returned_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R' AND l.l_discount > 0.05)
    GROUP BY o_orderpriority
    """,
    tags=("join", "subquery", "exists"),
)
def exists_returned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 skeleton: correlated EXISTS as a LEFT SEMI join.

    The semi join shuffles only the (filtered) probe keys and emits each
    order at most once - at scale strictly cheaper than inner-join +
    distinct, and the lineitem-side predicates are pushed to its scan
    before the shuffle.
    """
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "R") & (F.col("l_discount") > 0.05)
    )
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "part_below_avg_qty",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("join", "subquery", "correlated"),
)
def part_below_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 skeleton: correlated scalar subquery (per-part average)
    de-correlated into aggregate-then-join.

    The part filter is applied first and broadcast, so lineitem is
    reduced to the qualifying partkeys BEFORE the per-part average is
    computed - the average only needs those groups. One shuffle (the
    per-partkey aggregate); the threshold side is tiny and broadcasts.
    AVG stays double: quantities are integer-valued, so the sum is exact
    in binary and order-insensitive.
    """
    parts = (
        read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem").join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    )
    thresholds = li.groupBy("l_partkey").agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap"))
    return (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(thresholds.withColumnRenamed("l_partkey", "t_partkey")),
              F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg((exact_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "big_orders_in_subquery",
    oracle="""
    SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 180)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    tags=("join", "subquery", "in"),
)
def big_orders_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 skeleton: IN (grouped HAVING subquery) as semi join.

    The heavy-order keys come from one lineitem aggregate; the semi join
    prunes orders before the customer join, so the wide join only sees
    qualifying rows. At scale the qualifying-key set is small relative
    to lineitem -> broadcast semi join under AQE.
    """
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
        .select("l_orderkey")
    )
    o = read_table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("c_name", "o_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "o_totalprice")
        .agg(exact_sum("l_quantity").alias("total_qty"))
    )


# ---------------------------------------------------------------------------
# Remaining classic TPC-H skeletons (adapted to the driver's columns)
# ---------------------------------------------------------------------------


@register(
    "case_agg_priority_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
    tags=("join", "agg", "case"),
)
def case_agg_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 skeleton: join + CASE-conditional counts. The date
    filter reaches the lineitem scan; counts are integer so no decimal
    detour is needed."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "promo_revenue_ratio",
    oracle="""
    SELECT CAST(100.0
           * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                THEN l_extendedprice * (1 - l_discount)
                                ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE)
           AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1998-03-01'
    """,
    tags=("join", "agg", "ratio"),
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 skeleton: conditional-revenue ratio in one pass.

    Both sums ride the same scan+join; the ratio is computed in double
    AFTER each decimal-exact sum, so the division is on bit-identical
    inputs across engines. No broadcast hint on part: at 100 TB part is
    not a broadcastable dim, and AQE picks the right strategy per scale.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1998-01-01")) & (F.col("l_shipdate") < _ts("1998-03-01"))
    )
    p = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = li.join(p, F.col("l_partkey") == F.col("p_partkey")).agg(
        exact_sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))).alias("promo_rev"),
        exact_sum(rev).alias("total_rev"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct")
    )


@register(
    "disjunctive_brand_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "predicate", "disjunction"),
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 skeleton: OR-of-ANDs across both join sides. Catalyst
    factors the single-side conjuncts it can (brand/size to the part
    scan, quantity range to lineitem) and evaluates the residual
    disjunction post-join - the plan to check that predicate
    factoring survives composition."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    band = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return j.filter(
        band("Brand#12", 5, 1, 11) | band("Brand#23", 10, 10, 20) | band("Brand#34", 15, 20, 30)
    ).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Windows: range frames and rank distributions
# ---------------------------------------------------------------------------


@register(
    "window_range_30d_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
               AS sum_30d,
           COUNT(*) OVER w AS cnt_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "range_frame"),
)
def window_range_30d_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-customer trailing-30-day order total.

    Spark range frames need a numeric ORDER BY, so the timestamp is
    ordered as epoch seconds with a [-30d, 0] frame - semantically
    identical to DuckDB's INTERVAL frame (order dates are midnight UTC,
    and RANGE includes peers on both engines). One shuffle on
    o_custkey; the frame is evaluated with a sliding aggregate, not a
    self-join.
    """
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("o_orderdate"),
        # Deliberately ONE decimal window sum, not the radix-split long
        # digits used by the groupBy paths: each window function runs its
        # own RANGE-frame processor, so splitting the sum into three
        # functions triples the frame scans and measured SLOWER than the
        # BigDecimal buffer (1.16s vs 1.25s warm on 6M rows, local[32]).
        # The radix trick only pays where partial aggregation merges the
        # digit monoids (hash aggregates), not per-row frame evaluation.
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w)
        .cast("double")
        .alias("sum_30d"),
        F.count(F.lit(1)).over(w).alias("cnt_30d"),
    )


@register(
    "window_percent_rank_orders",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    """,
    tags=("window", "rank"),
)
def window_percent_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks: percent_rank ((rank-1)/(n-1)) and cume_dist.
    Pure integer-ratio arithmetic, so doubles are bit-identical across
    engines; ties on o_totalprice get identical ranks regardless of
    physical row order."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return read_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


# ---------------------------------------------------------------------------
# Calendar gap-fill (time-series densification)
# ---------------------------------------------------------------------------


@register(
    "gapfill_daily_event_counts",
    oracle="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
               FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY 1),
    cal AS (SELECT event_type,
                   CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                               CAST(hi AS TIMESTAMP),
                                               INTERVAL 1 DAY)) AS DATE) AS day
            FROM b)
    SELECT event_type, day, CAST(COALESCE(n, 0) AS BIGINT) AS n
    FROM cal LEFT JOIN d USING (event_type, day)
    """,
    tags=("timeseries", "gapfill"),
)
def gapfill_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify a daily series: every (event_type, day) in each type's
    observed range appears, absent days as 0.

    The calendar is generated from the tiny per-group bounds aggregate
    (F.sequence + explode - rows generated executor-side, never on the
    driver), then left-joined back. At scale the calendar side is
    |groups| x |days| which is orders of magnitude smaller than the
    event table - broadcast the calendar, not the facts; here the
    grouped counts are also tiny so the join is trivial either way.
    """
    ev = read_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n"))
    b = d.groupBy("event_type").agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = b.select("event_type", F.explode(F.sequence("lo", "hi")).alias("day"))
    return cal.join(d, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).alias("n")
    )


# ---------------------------------------------------------------------------
# Multiset set ops (ALL variants keep duplicate cardinality)
# ---------------------------------------------------------------------------


def _event_bags(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = read_table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 50).select(
        (F.col("user_id") % 100).alias("bucket"), "event_type"
    )
    b = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        (F.col("user_id") % 100).alias("bucket"), "event_type"
    )
    return a, b


_BAG_SQL = """
    SELECT user_id % 100 AS bucket, event_type FROM events WHERE value > 50
    {op}
    SELECT user_id % 100 AS bucket, event_type FROM events
    WHERE event_type IN ('click', 'purchase')
    """


@register(
    "set_events_intersect_all",
    oracle=_BAG_SQL.format(op="INTERSECT ALL"),
    tags=("setop", "multiset"),
)
def set_events_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: duplicate-preserving intersection (min of the two
    multiplicities). Plans as a single hash aggregate over both inputs
    with per-side counts - one shuffle, no join explosion."""
    a, b = _event_bags(spark, sf_dir)
    return a.intersectAll(b)


@register(
    "set_events_except_all",
    oracle=_BAG_SQL.format(op="EXCEPT ALL"),
    tags=("setop", "multiset"),
)
def set_events_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiplicity-subtracting difference."""
    a, b = _event_bags(spark, sf_dir)
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# Corpus document-frequency + intra-document repetition (training prep)
# ---------------------------------------------------------------------------


@register(
    "token_df_top",
    oracle="""
    WITH tok AS (SELECT DISTINCT doc_id, t.tok
                 FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(tok)
                 WHERE t.tok <> '')
    SELECT tok, COUNT(*) AS df FROM tok
    GROUP BY tok ORDER BY df DESC, tok LIMIT 25
    """,
    tags=("text", "corpus"),
)
def token_df_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus document frequency: top-25 tokens by #docs containing them.

    explode -> per-doc distinct -> count is the canonical DF plan: the
    per-doc dedup happens BEFORE the global aggregate, so the shuffle
    carries at most |docs| x |vocab-per-doc| rows, and partial
    aggregation collapses the token counts map-side. The final top-k is
    TakeOrderedAndProject with a (df DESC, tok) total order.
    """
    docs = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    tok = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    return (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(25)
    )


@register(
    "word_repetition_docs",
    oracle="""
    SELECT doc_id,
           len(string_split(lower(text), ' ')) AS n_tokens,
           len(list_distinct(string_split(lower(text), ' '))) AS n_distinct,
           CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
             / CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
             AS distinct_ratio
    FROM documents
    """,
    tags=("text", "quality", "dedup"),
)
def word_repetition_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: distinct-token ratio per doc (the
    standard boilerplate/repetition quality gate). All array built-ins
    in one narrow map - no shuffle, no Python."""
    docs = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")).alias(
            "distinct_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Feature scaling (training prep)
# ---------------------------------------------------------------------------


@register(
    "minmax_scale_events",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN MAX(value) OVER w > MIN(value) OVER w
                THEN CAST((value - MIN(value) OVER w)
                          / (MAX(value) OVER w - MIN(value) OVER w) AS DOUBLE)
                ELSE NULL END AS scaled
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
    tags=("ml", "scaling"),
)
def minmax_scale_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling to [0, 1].

    Deliberately NOT a whole-partition window: PARTITION BY event_type
    with 5 groups would funnel the table through 5 tasks. Instead the
    per-group bounds are a tiny aggregate broadcast back onto the facts
    - the scan stays fully parallel and the only shuffle is the
    5-row aggregate. MIN/MAX are exact on doubles, and the rescale
    arithmetic is identical on both engines, so no tolerance is needed.
    Degenerate groups (max == min) scale to NULL on both engines.
    The join is null-safe (eqNullSafe) so a NULL event_type forms its
    own group, matching the oracle's PARTITION BY null-group semantics.
    """
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.groupBy(F.col("event_type").alias("bt")).agg(
        F.min("value").alias("v_lo"), F.max("value").alias("v_hi")
    )
    return (
        ev.join(F.broadcast(bounds), F.col("event_type").eqNullSafe(F.col("bt")))
        .select(
            "event_id",
            "event_type",
            F.when(
                F.col("v_hi") > F.col("v_lo"),
                (F.col("value") - F.col("v_lo")) / (F.col("v_hi") - F.col("v_lo")),
            ).alias("scaled"),
        )
    )
