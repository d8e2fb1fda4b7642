"""Data-quality validation: the assertion layer a production pipeline
gates on before publishing a table (null rates, key uniqueness,
referential integrity, value domains).

Each check is expressed as one aggregate over the table(s) under test,
so a whole check suite compiles into a handful of scans - at 100 TB you
run the suite as ONE pass per table (Spark fuses the per-column
aggregates into a single HashAggregate), not one job per check.
Results come back as data (check_name, table_name, passed, observed),
so gating, alerting, and history are ordinary DataFrame operations.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESULT_COLS = ("check_name", "table_name", "passed", "observed")


def _result(df: DataFrame, check: str, table: str, passed, observed) -> DataFrame:
    return df.select(
        F.lit(check).alias("check_name"),
        F.lit(table).alias("table_name"),
        passed.alias("passed"),
        observed.cast("double").alias("observed"),
    )


def check_not_null(df: DataFrame, table: str, col: str, max_null_rate: float = 0.0) -> DataFrame:
    """Null rate of ``col`` must not exceed ``max_null_rate``."""
    agg = df.agg(
        (F.count(F.lit(1)) - F.count(col)).alias("__nulls"),
        F.count(F.lit(1)).alias("__n"),
    )
    rate = F.when(F.col("__n") > 0, F.col("__nulls") / F.col("__n")).otherwise(F.lit(0.0))
    return _result(
        agg, f"not_null:{col}", table, rate <= max_null_rate, F.round(rate, 6)
    )


def check_unique(df: DataFrame, table: str, cols: list[str]) -> DataFrame:
    """``cols`` must be a unique key: duplicate row count is 0."""
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct(*[F.col(c) for c in cols]).alias("__d"),
    )
    dupes = F.col("__n") - F.col("__d")
    return _result(agg, f"unique:{','.join(cols)}", table, dupes == 0, dupes)


def check_references(
    child: DataFrame, table: str, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """Every non-null ``fk`` value must exist in ``parent.pk`` (orphan
    count is 0). Planned as an anti join - the parent side broadcasts
    when dimension-sized, shuffles otherwise; never a per-row lookup."""
    orphans = child.filter(F.col(fk).isNotNull()).join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    agg = orphans.agg(F.count(F.lit(1)).alias("__o"))
    return _result(agg, f"fk:{fk}->{pk}", table, F.col("__o") == 0, F.col("__o"))


def check_in_domain(df: DataFrame, table: str, col: str, allowed: list) -> DataFrame:
    """All non-null values of ``col`` fall in the allowed set."""
    bad = F.sum(
        (~F.col(col).isin(allowed) & F.col(col).isNotNull()).cast("long")
    )
    agg = df.agg(bad.alias("__bad"))
    return _result(agg, f"domain:{col}", table, F.col("__bad") == 0, F.col("__bad"))


def check_range(df: DataFrame, table: str, col: str, lo, hi) -> DataFrame:
    """All non-null values of ``col`` fall in [lo, hi]."""
    bad = F.sum(
        (F.col(col).isNotNull() & ~F.col(col).between(lo, hi)).cast("long")
    )
    agg = df.agg(bad.alias("__bad"))
    return _result(agg, f"range:{col}", table, F.col("__bad") == 0, F.col("__bad"))


def run_suite(checks: list[DataFrame]) -> DataFrame:
    """Union the check results into one (check_name, table_name, passed,
    observed) report frame."""
    return reduce(lambda a, b: a.unionByName(b), checks)
