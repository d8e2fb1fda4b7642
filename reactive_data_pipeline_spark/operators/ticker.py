"""Reference-parity ticker pipeline (SURVEY.md sections 2.1-2.6, 7.2).

Re-expresses every query shape of the reference over a ``ticker`` table
derived deterministically from the driver's ``events`` stream table
(FIXTURES.md section 3): the reference's yfinance REST source
(``/root/reference/dagster_repository/ops.py:13-29``) is replaced by the
parquet events source - no live network in this environment.

Semantics preserved / deliberately fixed:

* ``ticker_count`` / ``ticker_last5`` - run metadata queries
  (``resources.py:29,31``; ``main.py:60-71``).
* ``symbol_minmax`` - the filtered MIN/MAX pair (``resources.py:58-67``),
  computed in ONE scan via groupBy.agg instead of two scalar queries
  (same result; SURVEY.md section 2.4 note).
* ``build_ticker_meta`` - the derived aggregate table
  (``resources.py:69-76``) with the sane-semantics fix: ``symbol`` holds
  the ticker symbol, not the date (the reference stores the date,
  ``resources.py:71`` - documented bug), and min/max is bounded to the
  partition day instead of all-history-relabeled-daily (SURVEY.md
  section 7.6.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.datetime_ops import bangkok_day, partition_key

#: The reference's ETF holding list (``main.py:96``, ``schedules.py:16``).
SYMBOLS = ("XT", "SCHX", "IXJ", "WCLD")


def derive_ticker(events: DataFrame) -> DataFrame:
    """Deterministic events -> Ticker projection (P1's shape: select,
    rename, default columns - ``ops.py:18-28``, ``models.py:7-19``).

    Every derived column is a pure function of the event row so the DuckDB
    oracle can reproduce it exactly; ``id`` is the upstream ``event_id``
    (deterministic surrogate - SURVEY.md section 7.6.3), and
    ``created_at``/``updated_at`` take the event time rather than
    ``datetime.now()`` (``models.py:18-19``) for reproducibility.
    """
    sym = F.element_at(F.array(*[F.lit(s) for s in SYMBOLS]), (F.col("user_id") % 4 + 1).cast("int"))
    price = F.col("value")
    return events.select(
        F.col("event_id").alias("id"),
        F.concat(F.lit("ETF "), sym).alias("name"),
        F.lit("ETF").alias("quote_type"),
        sym.alias("symbol"),
        F.round(price * 0.995, 4).alias("nav_price"),
        price.alias("market_price"),
        F.round(price * 0.99, 4).alias("market_open"),
        F.round(price * 1.01, 4).alias("day_high"),
        F.round(price * 0.98, 4).alias("day_low"),
        F.round(price * 0.985, 4).alias("previous_close"),
        F.col("ts").alias("created_at"),
        F.col("ts").alias("updated_at"),
    )


def ticker_count(ticker: DataFrame) -> DataFrame:
    """A1 (``resources.py:29``): row count as a 1-row DataFrame."""
    return ticker.agg(F.count("id").alias("n_rows"))


def ticker_last5(ticker: DataFrame) -> DataFrame:
    """O1 (``resources.py:31``): ORDER BY created_at DESC LIMIT 5, with
    ``id`` as deterministic tiebreaker (the reference relies on SQLite
    insert order). Emits event-time as epoch micros for engine-portable
    comparison."""
    return (
        ticker.orderBy(F.col("created_at").desc(), F.col("id").desc())
        .limit(5)
        .select(
            "id",
            "symbol",
            "market_price",
            F.unix_micros(F.col("created_at").cast("timestamp")).alias("created_at_us"),
        )
    )


def symbol_minmax(ticker: DataFrame, symbol: str) -> DataFrame:
    """A2+A3 (``resources.py:58-67``): filtered min/max in one scan."""
    return (
        ticker.filter(F.col("symbol") == symbol)
        .agg(
            F.max("market_price").alias("max_market_price"),
            F.min("market_price").alias("min_market_price"),
        )
        .withColumn("symbol", F.lit(symbol))
    )


def build_ticker_meta(ticker: DataFrame) -> DataFrame:
    """A4 + R3 (``resources.py:69-76``): per-(symbol, Bangkok day)
    min/max, rendered with the reference's ``yyyyMMdd`` partition key.

    One shuffle on (symbol, day); map-side partial aggregation makes the
    shuffle payload 2 doubles per group per task regardless of input size.
    """
    day = bangkok_day("created_at")
    return (
        ticker.groupBy(F.col("symbol"), day.alias("day"))
        .agg(
            F.max("market_price").alias("monthly_max_market_price"),
            F.min("market_price").alias("monthly_min_market_price"),
        )
        .select(
            "symbol",
            "monthly_max_market_price",
            "monthly_min_market_price",
            partition_key("day").alias("partition"),
        )
    )
