"""Skew-resistant aggregation (salting).

AQE's skew-join splitting handles skewed *joins*; a skewed *aggregation*
key (one user producing 30% of events) still funnels its whole group
through one reducer in the final stage. Salting splits each hot group
into ``n_salts`` subgroups for the first (heavy) aggregation and merges
the partials in a second (tiny) one. Works for any algebraic aggregate
(sum/count/min/max - anything with a partial+merge decomposition).

Result-identical to the unsalted groupBy (the DuckDB oracle for the
catalog query is the plain GROUP BY), so correctness is oracle-checked
while the plan shape is the scale-path one.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .relational import combine_digit_sums, split_digits


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, tuple[Column, Callable[[Column], Column]]],
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``partials`` maps output name -> (stage1 aggregate over raw rows,
    stage2 merge over stage-1 partials); e.g. a count is
    ``(F.count(lit(1)), F.sum(...))``, a sum is ``(F.sum(x), F.sum(...))``.
    The salt is deterministic (hash of ``salt_on`` or a whole-row
    surrogate) so replays produce identical partials.
    """
    salt_src = F.col(salt_on) if salt_on else F.monotonically_increasing_id()
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in partials.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[merge(F.col(f"__p_{name}")).alias(name) for name, (_, merge) in partials.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_on: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant fact-dim equi join by dim replication.

    When the dim side is too big to broadcast and the fact side's join
    key is skewed, a plain shuffle join funnels every hot key through
    one reducer. Salting splits it: each dim row replicates ``n_salts``
    times (explode over salt ids - dim cost ×n_salts, the price of the
    technique), each fact row gets a deterministic salt from a unique
    column (``salt_on``; determinism makes replays identical), and the
    join runs on (key, salt) - a hot key's rows now spread over
    ``n_salts`` reducers. Result-identical to the unsalted join, so the
    catalog oracle is the plain JOIN. AQE's skew-join split handles the
    sort-merge case adaptively at runtime; explicit salting is the
    plan-stable form you reach for when AQE can't see the skew (e.g.
    the first shuffle of a stage) or when you need deterministic task
    shapes.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    dim_rep = dim.select("*", salts)
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)).cast("int")
    )
    joined = fact_s.join(
        dim_rep,
        (fact_s[fact_key] == dim_rep[dim_key]) & (fact_s["__salt"] == dim_rep["__salt"]),
    )
    return joined.drop("__salt")


def salted_sum_count(
    df: DataFrame, keys: Sequence[str], value_col: Column | str, n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Common case: per-key decimal-exact sum + count, salt-split.

    The sum rides the radix-split long digits (operators.relational
    .split_digits) through both stages - long partials merge as longs,
    so neither stage pays the BigDecimal aggregation buffer - and is
    rebuilt into the exact decimal total only once per output key."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    hi, mid, lo = split_digits(v)
    out = salted_agg(
        df,
        keys,
        {
            "__hi": (F.sum(hi), F.sum),
            "__mid": (F.sum(mid), F.sum),
            "__lo": (F.sum(lo), F.sum),
            "n_rows": (F.count(F.lit(1)), F.sum),
        },
        n_salts=n_salts,
        salt_on=salt_on,
    )
    return out.select(
        *keys,
        combine_digit_sums(F.col("__hi"), F.col("__mid"), F.col("__lo"))
        .cast("double")
        .alias("value_total"),
        "n_rows",
    )
