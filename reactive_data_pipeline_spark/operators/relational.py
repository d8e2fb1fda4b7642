"""Core relational operators (SURVEY.md sections 2.2, 2.4, 2.6, 2.7).

Thin, typed wrappers over the DataFrame API. They exist to (a) name the
reference's operator inventory explicitly, and (b) centralize the
determinism rules the DuckDB-oracle harness relies on (stable aliases,
decimal-exact double aggregation, total-order top-k).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the plan's partition count is below the session's
    default parallelism.

    CPU-heavy map stages (shingling, per-bit hash votes, all-pairs dot
    products) inherit the *file* layout of their input; one small parquet
    file means one task no matter how many cores exist. At cluster scale
    inputs arrive in many files and this is a no-op; on a small or
    badly-laid-out input it is a cheap row shuffle that buys a fully
    parallel compute stage.
    """
    par = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def project(df: DataFrame, columns: Mapping[str, Column | str]) -> DataFrame:
    """P1 (projection + rename, ``ops.py:18-28``): ``{out_name: expr}``."""
    return df.select(
        *[
            (F.col(c) if isinstance(c, str) else c).alias(name)
            for name, c in columns.items()
        ]
    )


def where(df: DataFrame, *predicates: Column) -> DataFrame:
    """P2 generalized: conjunction of predicates; each one is pushable."""
    out = df
    for p in predicates:
        out = out.filter(p)
    return out


def aggregate(
    df: DataFrame,
    group_by: Iterable[Column | str],
    aggs: Mapping[str, Column],
) -> DataFrame:
    """A1-A4 generalized: grouped aggregation with mandatory aliases.

    Spark performs partial (map-side) aggregation before the shuffle
    automatically - the one-pass ``groupBy.agg`` replaces the reference's
    two scalar queries per symbol (``resources.py:58-67``).
    """
    keys = [F.col(k) if isinstance(k, str) else k for k in group_by]
    exprs = [c.alias(name) for name, c in aggs.items()]
    return df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)


def exact_sum(col: Column | str, scale: int = 6, precision: int = 18) -> Column:
    """Order-insensitive exact SUM of a double column.

    Summing doubles is non-associative, so a distributed sum of the same
    rows can differ between engines/runs in the last bits. Casting each
    value to a fixed-point decimal first makes the sum exact and therefore
    identical regardless of partitioning - the property the value-hash
    oracle comparison needs. Cast back to double at the end for a stable
    output schema.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def exact_avg(col: Column | str, scale: int = 6, precision: int = 18) -> Column:
    """Deterministic AVG: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, scale, precision) / F.count(c)


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O1 (``resources.py:31``): ORDER BY ... LIMIT k.

    Catalyst plans this as ``TakeOrderedAndProject`` - a per-partition
    heap of k rows + single merge, never a full sort, so it scales to
    arbitrarily large inputs. Callers must pass a total order (include a
    unique tiebreaker) or the k-th row is nondeterministic.
    """
    return df.orderBy(*order).limit(k)


def distinct_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Section 2.7: DISTINCT (optionally on a key subset, keeping
    arbitrary-but-deterministic first rows is NOT guaranteed by Spark's
    dropDuplicates across runs; use an explicit min/max aggregate when
    determinism matters)."""
    return df.dropDuplicates(subset) if subset else df.distinct()
