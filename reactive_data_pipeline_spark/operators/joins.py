"""Join family (SURVEY.md section 2.3).

The reference has no relational joins - only the ticker -> ticker_meta
DAG edge (``assets/tickers.py:47``) - but capability parity over the
star-schema corpus requires the full family. All built-in Spark; the
value added here is the scale discipline:

* fixed-size dimensions (region, nation) are always broadcast;
* scaling dimensions are left to AQE's runtime broadcast decision;
* the as-of join is expressed as a union-free window trick that shuffles
  each side once on the join key (no range cross-product).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Equi join with an explicitly broadcast (small) build side: no
    shuffle of the fact table at all."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """EXISTS: rows of ``left`` with at least one match."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """NOT EXISTS: rows of ``left`` with no match."""
    return left.join(right, on, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for each left row, the nearest prior (``backward``) or
    next (``forward``) right row with the same key (SURVEY.md
    section 7.6.4 - no Spark built-in).

    Implementation: union both sides tagged by origin, one window sorted
    by (key, ts) carries the ``last``/``first`` right-row struct across to
    left rows. Cost: a single shuffle on the key for the union - the same
    shuffle a plain equi join would need - rather than a range
    cross-product. Skewed keys are handled by AQE; at cluster scale,
    pre-bucketing both sides on ``on`` removes the shuffle entirely.
    """
    rcols = [c for c in right.columns if c != on]
    payload = F.struct(*[F.col(c) for c in rcols])
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        payload.alias("__payload"),
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    r = r.withColumn("__left", F.lit(None).cast(l.schema["__left"].dataType))
    unioned = l.unionByName(r)

    if direction == "backward":
        # Right rows sort before left rows at the same ts (<= semantics).
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__payload", ignorenulls=True).over(w)
    elif direction == "forward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts").asc(), F.col("__is_right").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("__payload", ignorenulls=True).over(w)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    out = (
        unioned.withColumn("__matched", matched)
        .filter(F.col("__is_right") == 0)
        .select(
            *[F.col("__left")[c].alias(c) for c in left.columns],
            *[F.col("__matched")[c].alias(f"{c}{suffix}" if c in left.columns else c) for c in rcols],
        )
    )
    return out


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join as a keyed EQUI join - the shape that
    replaces a broadcast-nested-loop range join once neither side fits
    in a broadcast.

    Each interval explodes into the coarse time buckets it covers
    (``floor(epoch/W)`` for W=``bucket_seconds``); each point computes
    its single bucket; the join becomes equi on (key, bucket) with the
    exact ``start <= ts <= end`` predicate left as a residual filter.
    A point has exactly one bucket, so no dedup is needed. Cost: one
    hash shuffle per side keyed (key, bucket) - scales like any equi
    join - plus interval-side row expansion of ceil(len/W)+1, so pick W
    near the typical interval length (expansion <= ~2-3x). Intervals
    orders of magnitude longer than W belong in a separate broadcast
    leg; this operator targets the short-interval bulk (attribution
    windows, sessions, validity ranges).

    Output: all point columns + all interval payload columns (the
    interval's key column is dropped; ``start``/``end`` are kept).
    """
    bucket_us = int(bucket_seconds) * 1_000_000

    def _bucket(c: str) -> Column:
        # Integer `div`, NOT floor(a/b): the double quotient is only
        # correctly rounded, so a timestamp within ~1 ulp below a bucket
        # boundary would floor into the WRONG (next) bucket and silently
        # miss its interval matches.
        return F.expr(
            f"unix_micros(CAST(`{c}` AS TIMESTAMP)) div {bucket_us}"
        )

    ipayload = [c for c in intervals.columns if c != on]
    iv = intervals.select(
        F.col(on),
        *ipayload,
        F.explode(F.sequence(_bucket(start), _bucket(end))).alias("__bucket"),
    )
    pt = points.withColumn("__bucket", _bucket(ts))
    joined = pt.join(iv, [on, "__bucket"]).filter(
        (F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end))
    )
    return joined.drop("__bucket")
