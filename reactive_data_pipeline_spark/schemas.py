"""Central schema registry.

The reference declares its fixed schemas as SQLModel classes and
auto-creates DDL at connect time
(``/root/reference/dagster_repository/models.py:7-27``,
``resources.py:24``). Here every table is an explicit ``StructType``:
schema-on-write for engine-produced tables, and a documented contract for
the driver-generated testdata (read from the parquet footers, see
``FIXTURES.md``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver testdata (TPC-H-ish star schema + streaming/LLM tables)
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]
)

#: On-disk schema of events.parquet: ``ts`` is parquet TIMESTAMP(NANOS),
#: surfaced as a long via ``spark.sql.legacy.parquet.nanosAsLong`` and
#: normalized by the source layer (sources.read_table).
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

#: Normalized events schema as seen by every operator.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

#: All driver tables, in dependency-ish order.
TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# Reference-shaped tables (FIXTURES.md section 3)
# --------------------------------------------------------------------------

#: Mirrors ``Ticker`` (/root/reference/dagster_repository/models.py:7-19).
#: ``id`` is a deterministic surrogate (the upstream event_id), not a DB
#: autoincrement - there is no distributed autoincrement by design
#: (SURVEY.md section 7.6.3).
TICKER = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("quote_type", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("nav_price", T.DoubleType()),
        T.StructField("market_price", T.DoubleType()),
        T.StructField("market_open", T.DoubleType()),
        T.StructField("day_high", T.DoubleType()),
        T.StructField("day_low", T.DoubleType()),
        T.StructField("previous_close", T.DoubleType()),
        T.StructField("created_at", T.TimestampNTZType()),
        T.StructField("updated_at", T.TimestampNTZType()),
    ]
)

#: Mirrors ``TickerMeta`` (models.py:22-27) with the sane-semantics fix:
#: ``symbol`` holds the ticker symbol (the reference stores the *date* in
#: it, resources.py:71 - an apparent bug, see SURVEY.md section 7.6.2).
TICKER_META = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("monthly_max_market_price", T.DoubleType()),
        T.StructField("monthly_min_market_price", T.DoubleType()),
        T.StructField("partition", T.StringType()),
    ]
)
