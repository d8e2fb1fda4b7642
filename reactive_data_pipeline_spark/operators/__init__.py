"""Relational operator layer (SURVEY.md section 2).

Composable ``DataFrame -> DataFrame`` functions. Everything is expressed
declaratively so Catalyst gets full freedom: predicate pushdown, column
pruning, join strategy selection, partial aggregation, and top-k
(`TakeOrderedAndProject`) all come from the built-in optimizer - the
reference delegated exactly this to SQLite's planner
(``/root/reference/dagster_repository/resources.py:29-67``), and we
delegate it to Catalyst (SURVEY.md section 4: zero custom rules needed).
"""

from .relational import project, where, aggregate, top_k, distinct_rows, ensure_parallelism
from .joins import broadcast_join, semi_join, anti_join, asof_join
from . import ticker

__all__ = [
    "project",
    "where",
    "aggregate",
    "top_k",
    "distinct_rows",
    "ensure_parallelism",
    "broadcast_join",
    "semi_join",
    "anti_join",
    "asof_join",
    "ticker",
]
