"""Count-min sketch: mergeable sublinear frequency estimation.

The streaming/distributed classic: d hash rows x w buckets of counters;
every key increments one bucket per row; a key's estimate is the MIN of
its d cells. Always an over-estimate (one-sided), over by at most
eps*N (eps = e/w) with probability 1-delta (delta = e^-d).

Spark shape: the "increment" is an explode to (row, bucket) cells and
ONE map-side-combinable groupBy count - the sketch materializes as a
d*w-row DataFrame (KBs), the exact shape that merges across partitions,
days, or clusters by cell-wise addition. Estimation joins the candidate
keys' cells against the broadcast sketch. At 100 TB the sketch stays
d*w rows no matter the input - that is the point of a sketch.

The cell hash is ``xxhash64(key, row_seed) mod w`` - engine-specific,
so catalog queries over sketches carry tolerance-contract oracles
(exact counts + the guarantee booleans), like approx_distinct_users.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D_ROWS = 4
W_BUCKETS = 256


def _cells(key: Column, d: int, w: int) -> Column:
    """Array of d (row, bucket) structs for a key."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                F.pmod(F.xxhash64(key, F.lit(i)), F.lit(w)).alias("b"),
            )
            for i in range(d)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, d: int = D_ROWS, w: int = W_BUCKETS
) -> DataFrame:
    """Build the sketch: (r, b, n) cell counts, d*w rows max."""
    cells = df.select(F.explode(_cells(F.col(key_col), d, w)).alias("c"))
    return cells.groupBy("c.r", "c.b").agg(F.count(F.lit(1)).alias("n"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = D_ROWS,
    w: int = W_BUCKETS,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over its d cells.
    The sketch broadcasts (it is d*w rows by construction)."""
    probe = keys.select(
        F.col(key_col), F.explode(_cells(F.col(key_col), d, w)).alias("c")
    ).select(key_col, F.col("c.r").alias("r"), F.col("c.b").alias("b"))
    return (
        probe.join(F.broadcast(sketch), ["r", "b"])
        .groupBy(key_col)
        .agg(F.min("n").alias("est_n"))
    )
