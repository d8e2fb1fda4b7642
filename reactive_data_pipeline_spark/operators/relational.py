"""Core relational operators (SURVEY.md sections 2.2, 2.4, 2.6, 2.7).

Thin, typed wrappers over the DataFrame API. They exist to (a) name the
reference's operator inventory explicitly, and (b) centralize the
determinism rules the DuckDB-oracle harness relies on (stable aliases,
decimal-exact double aggregation, total-order top-k).
"""

from __future__ import annotations

import logging
from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)

#: Count of free_local_checkpoint calls that could NOT release blocks
#: (round-11 advice): production call sites discard the boolean, and the
#: helper leans on private internals (_jdf, the 'LogicalRDD' plan-class
#: name), so a Spark upgrade could silently revert the O(rounds) block
#: leak the rotation pattern prevents. The counter (and a debug log per
#: miss) makes that regression observable without changing call sites;
#: tests assert it stays 0 across the iterative loops.
FREE_CHECKPOINT_MISSES = 0


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


#: Radix width for the split-long exact sum. Three 21-bit digits cover the
#: 63 magnitude bits of any ``decimal(18,s)`` unscaled value; each digit's
#: 64-bit accumulator then overflows only past 2^63/2^21 ~ 4.4e12 non-null
#: rows *per group* (a ~1 PB lineitem in one group). Past that, raise the
#: digit count or use the decimal-buffer fallback (``precision > 18``).
_SPLIT_BITS = 21
_SPLIT_MASK = (1 << _SPLIT_BITS) - 1

#: Scaled-magnitude bound for the pure-double quantization fast path.
#: For a value that IS a ≤``scale``-digit decimal (the fixtures' money
#: columns), ``y = fl(fl(k/10^s) * 10^s)`` carries relative error
#: ≤ 2^-52, so ``|y - k| ≤ k * 2^-52 < 0.26`` for k < 2^50 and
#: ``floor(|y| + 0.5)`` recovers k EXACTLY - the fast path cannot
#: misround in-domain data below this bound. (2^52 is NOT safe: ulp
#: reaches 0.5-1.0 there and a probe measured ~25% midpoint drift on
#: full-precision doubles.) At/above 2^50 the value routes through the
#: exact decimal cast instead - BigDecimal cost only for |x| ≥ ~1.1e9
#: at scale 6, absent from any hot path.
_FAST_QUANT_BOUND = float(1 << 50)


def _unscaled_long(c: Column, scale: int, precision: int) -> Column:
    """Unscaled long of ``c`` rounded to ``scale`` fraction digits.

    The hot path is pure double arithmetic - ``sign(y) * floor(|y| +
    0.5)`` with ``y = x * 10^scale`` - which whole-stage codegen runs
    as a handful of FP ops per row. The previous formulation,
    ``cast(x as decimal(p,s)) * 10^s -> long``, allocates a JVM
    BigDecimal AND a ``Double.toString`` shortest-repr per value;
    profiled at 60M rows x 5 columns (q1 at 100x volume) that cast was
    ~3.0s of a 3.9s aggregate - the whole q1-family gap vs DuckDB at
    volume - while this path runs at plain-double-sum speed (1.0s),
    zero value changes across all 300M fixture comparisons.

    Rounding convention: round-half-away-from-zero of the BINARY
    double value (C ``round()``; also how the repo's e-scaled-integer
    oracle outputs quantize), vs the decimal cast's HALF_UP on the
    shortest DECIMAL repr. The two differ only when the scaled value
    sits within ~1 ulp of a half-integer - measured 1 in 200k on
    adversarial uniform doubles, 0 anywhere in the fixtures, and the
    DuckDB oracle's own double->decimal cast (round-half-EVEN on the
    binary value) disagrees with BOTH on such boundaries, so neither
    convention is more oracle-proof than the other; the operator's
    contract (exact, order-insensitive, engine-stable) holds
    identically. |y| >= 2^50 (|x| >= ~1.1e9 at scale 6; see
    ``_FAST_QUANT_BOUND`` for why not 2^52) falls back to
    the exact decimal cast, preserving the full decimal(18,s) domain;
    past decimal range ANSI still raises loudly.
    """
    y = c.cast("double") * F.lit(float(10**scale))
    fast = (F.signum(y) * F.floor(F.abs(y) + F.lit(0.5))).cast("long")
    slow = (c.cast(f"decimal({precision},{scale})") * F.lit(10**scale)).cast("long")
    return F.when(F.abs(y) < F.lit(_FAST_QUANT_BOUND), fast).otherwise(slow)


def exact_sum(col: Column | str, scale: int = 6, precision: int = 18) -> Column:
    """Order-insensitive exact SUM of a double column.

    Summing doubles is non-associative, so a distributed sum of the same
    rows can differ between engines/runs in the last bits. Rounding each
    value to a fixed-point decimal first makes the sum exact and therefore
    identical regardless of partitioning - the property the value-hash
    oracle comparison needs. Cast back to double at the end for a stable
    output schema.

    Mechanically this does NOT run Spark's decimal SUM: a decimal(18,s)
    sum carries a decimal(28,s) buffer, which exceeds the compact-long
    digit limit, so every row update round-trips a JVM BigDecimal -
    measured ~2.4x the cost of a double sum (2.53s vs 1.06s warm
    median-of-3 for the q1 aggregate battery on 24M rows, local[32]).
    Instead the value is quantized to its unscaled long in pure double
    arithmetic (:func:`_unscaled_long` - the 100x-volume profile showed
    the per-row ``cast(double -> decimal)`` BigDecimal allocation, not
    the digit sums, was ~75% of the aggregate's cost), the long is
    split into three 21-bit radix digits (arithmetic shift = floor
    division, so negatives decompose exactly), and each digit is summed
    as a plain long - integer addition is associative, so the result
    is the same exact sum, rebuilt in decimal(38) at the end (one row
    per group). Runs at plain-double-sum speed (q1's 7-aggregate
    battery at 60M rows: 3.67s decimal-cast radix -> 1.0s this path);
    value-identical on every fixture: pinned by tests/test_operators.py
    and the full oracle parity sweep.

    ``precision > 18`` falls back to the decimal buffer (unscaled value
    would not fit a long).

    Overflow bound: a digit accumulator exceeds a long past ~4.4e12
    non-null rows per group. The failure is LOUD, not a wrap - Spark 4
    runs ANSI by default (this repo never disables it), where long-sum
    overflow raises ARITHMETIC_OVERFLOW; pinned by
    tests/test_engine_assumptions.py::test_radix_digit_overflow_fails_loudly.
    Mega-group aggregations beyond that bound should pass
    ``precision=19+`` to route through the decimal buffer.
    """
    return exact_sum_dec(col, scale, precision).cast("double")


def split_digits(
    col: Column | str, scale: int = 6, precision: int = 18
) -> tuple[Column, Column, Column]:
    """(hi, mid, lo) 21-bit radix digits of the fixed-point-rounded
    value's unscaled long - each summable as a plain long. Arithmetic
    shift is floor division, so negative values decompose exactly. The
    unscaled long comes from :func:`_unscaled_long`'s pure-double fast
    path (decimal-cast fallback past 2^50 scaled magnitude)."""
    c = F.col(col) if isinstance(col, str) else col
    u = _unscaled_long(c, scale, precision)
    return (
        F.shiftright(u, 2 * _SPLIT_BITS),
        F.shiftright(u, _SPLIT_BITS).bitwiseAND(F.lit(_SPLIT_MASK)),
        u.bitwiseAND(F.lit(_SPLIT_MASK)),
    )


def combine_digit_sums(hi: Column, mid: Column, lo: Column, scale: int = 6) -> Column:
    """Rebuild the exact decimal total from summed radix digits."""
    total = (
        hi.cast("decimal(38,0)") * F.lit(1 << (2 * _SPLIT_BITS))
        + mid.cast("decimal(38,0)") * F.lit(1 << _SPLIT_BITS)
        + lo.cast("decimal(38,0)")
    )
    return total / F.lit(10**scale)


def exact_sum_dec(col: Column | str, scale: int = 6, precision: int = 18) -> Column:
    """:func:`exact_sum` without the final double cast: the exact decimal
    total, for callers that compare the sum against a threshold (HAVING)
    where a double round-trip could flip a borderline comparison."""
    c = F.col(col) if isinstance(col, str) else col
    if precision > 18:
        return F.sum(c.cast(f"decimal({precision},{scale})"))
    hi, mid, lo = split_digits(c, scale, precision)
    return combine_digit_sums(F.sum(hi), F.sum(mid), F.sum(lo), scale)


def exact_avg(col: Column | str, scale: int = 6, precision: int = 18) -> Column:
    """Deterministic AVG: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, scale, precision) / F.count(c)


def evaluate_once(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """Attach expensive expression columns so each is evaluated exactly
    once per row, even under a downstream filter.

    Catalyst pushes deterministic filter predicates back through
    projections (substituting the alias's defining expression into the
    condition) and does NOT run subexpression elimination inside Filter
    predicates - so ``df.select(expr.alias("c")).filter(c > x)``
    re-evaluates ``expr``'s whole tree once per reference. For
    expression families that share a heavy subtree (the text-quality /
    language-ID scores each re-tokenize the document), that multiplies
    the dominant cost: the quality+language filter measured 3.66 s at
    49k docs vs 0.7 s per score in a projection.

    Routing the expressions through a one-element
    ``explode(array(struct(...)))`` inserts a Generate node: generated
    outputs cannot be pushed through, the struct is built once per row
    inside whole-stage codegen (subexpression elimination applies), and
    the plan stays fully pipelined - no materialization, no shuffle,
    usable in streaming plans. Same filter: 1.45 s. (A localCheckpoint
    barrier is marginally faster locally but materializes the whole
    input - wrong trade at the 100 TB design point.)
    """
    packed = F.explode(
        F.array(F.struct(*[c.alias(k) for k, c in cols.items()]))
    ).alias("__once")
    out = df.select("*", packed)
    return out.select(
        *df.columns, *[F.col(f"__once.{k}").alias(k) for k in cols]
    )


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


def free_local_checkpoint(df: DataFrame) -> bool:
    """Release the storage blocks behind an EAGER ``localCheckpoint``.

    ``DataFrame.unpersist`` routes through the SQL CacheManager and is
    a silent NO-OP for checkpoints: their data is an RDD-level cache on
    the ``LogicalRDD``'s backing RDD, never registered with the cache
    manager (measured round-10 - the blocks survive ``unpersist()``).
    The real handle is the analyzed plan's ``rdd`` accessor.

    Only call this when nothing will read THROUGH the checkpoint again:
    a checkpoint truncates lineage, so once its blocks are dropped the
    frame is unrecomputable. The intended pattern is iterative-loop
    rotation - free round N-1 after round N's eager checkpoint has
    materialized from it - which keeps a loop at O(1) pinned storage
    instead of O(rounds x state) (the round-10 mid-sweep-drag
    mechanism: leaked deserialized blocks squeeze later queries'
    execution memory into spill). Returns True if blocks were released.
    """
    global FREE_CHECKPOINT_MISSES
    try:
        plan = df._jdf.queryExecution().analyzed()
        cls = plan.getClass().getSimpleName()
        if cls != "LogicalRDD":
            FREE_CHECKPOINT_MISSES += 1
            _log.debug(
                "free_local_checkpoint: analyzed plan is %s, not LogicalRDD; "
                "blocks NOT released (miss #%d)",
                cls,
                FREE_CHECKPOINT_MISSES,
            )
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception as exc:  # noqa: BLE001 - cleanup must never fail a query
        FREE_CHECKPOINT_MISSES += 1
        _log.debug(
            "free_local_checkpoint: %s: %s; blocks NOT released (miss #%d)",
            type(exc).__name__,
            exc,
            FREE_CHECKPOINT_MISSES,
        )
        return False
