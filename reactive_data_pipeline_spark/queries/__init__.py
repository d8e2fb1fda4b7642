"""Named query catalog: the engine's oracle-checked surface.

Every operator family from SURVEY.md section 2 (plus the section 7.5
LLM-pipeline operators) is represented by at least one named query. Each
entry pairs

* ``build(spark, sf_dir) -> DataFrame`` - the Spark-native implementation,
* ``oracle`` - equivalent ANSI SQL executed by DuckDB on the same parquet
  (``None`` for genuinely non-SQL-expressible ops -> driver records a
  rows-only check).

Determinism rules (enforced throughout, see operators.relational):
aliases match between Spark and SQL; double sums go through decimal;
timestamps leave as epoch-micros/dates; every LIMIT has a total order.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: Runtime-settable SQL confs every catalog query depends on; applied
#: defensively because the driver harness supplies its own session.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # The driver's vanilla session defaults to 200 shuffle partitions;
    # at correctness-gate scale that is pure scheduling overhead (AQE
    # coalesces, but fewer initial partitions are still cheaper).
    "spark.sql.shuffle.partitions": "32",
}


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, CatalogQuery] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), bench: bool = False):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate catalog query {name!r}")

        @functools.wraps(fn)
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            for k, v in RUNTIME_CONF.items():
                spark.conf.set(k, v)
            return fn(spark, sf_dir)

        QUERIES[name] = CatalogQuery(name=name, build=build, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


# Import for side effects: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import relational_ext2  # noqa: E402,F401
from . import relational_ext3  # noqa: E402,F401
from . import reference  # noqa: E402,F401
from . import llm  # noqa: E402,F401

__all__ = ["QUERIES", "CatalogQuery", "register"]
