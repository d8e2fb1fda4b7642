"""Z-order (Morton) clustering for multi-dimensional scan pruning.

``sources.registry.write_sorted`` gives single-key range clustering:
parquet row-group min/max stats prune scans filtered on THAT key, but a
second dimension spans its full range inside every file. Interleaving
the bits of several dimensions into one sort key (the Z-order curve)
makes every file cover a small hyper-rectangle of the combined space,
so min/max stats prune on ANY of the interleaved columns - the standard
lakehouse layout technique for multi-predicate workloads (OPTIMIZE
ZORDER in public Delta/Iceberg docs; public literature: Morton 1966).

Everything is JVM expression work:

* each dimension is min/max-normalized onto a ``bits``-wide integer
  grid (the bounds come from ONE tiny aggregate, broadcast back - no
  sort, no sampling pass);
* the interleave is a sum of shifted bit tests, generated once as a
  single codegen-friendly expression (``bits x ndim`` terms);
* the write is ``repartitionByRange`` + ``sortWithinPartitions`` on the
  z-key - one range exchange, the same cost as any sorted write.

At 100 TB the bounds aggregate is a metadata-scale scan (or comes from
table statistics), the range partitioner samples the z-key as usual,
and file count is chosen for ~1 GB files; pruning then works for
filters on any interleaved dimension without re-clustering per
workload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    norm_cols: list[str],
    bits: int = 16,
) -> Column:
    """Interleave ``bits`` low bits of the pre-normalized integer
    columns (each in ``[0, 2^bits)``) into one Morton key. Column i
    contributes bit b to output bit ``b * ndim + i``.
    """
    n = len(norm_cols)
    if not 1 <= n * bits <= 63:
        raise ValueError("need 1 <= ndim * bits <= 63")
    terms = [
        f"(shiftleft((shiftright({c}, {b}) & 1L), {b * n + i}))"
        for i, c in enumerate(norm_cols)
        for b in range(bits)
    ]
    return F.expr(" + ".join(terms))


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    key_col: str = "__zkey",
) -> DataFrame:
    """Add the Morton key over ``cols`` (numeric), min/max-normalizing
    each onto the ``bits`` grid from one broadcast bounds aggregate.
    Constant columns (min == max) normalize to 0."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    )
    levels = (1 << bits) - 1
    out = df.crossJoin(F.broadcast(bounds))
    norm_names = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        scaled = F.when(mx > mn, (F.col(c) - mn) / (mx - mn) * levels).otherwise(
            F.lit(0.0)
        )
        nc = f"__n_{c}"
        out = out.withColumn(
            nc, F.least(F.lit(levels), F.greatest(F.lit(0), F.floor(scaled))).cast("long")
        )
        norm_names.append(nc)
    out = out.withColumn(key_col, zorder_key(norm_names, bits))
    drop = [f"__mn_{c}" for c in cols] + [f"__mx_{c}" for c in cols] + norm_names
    return out.drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write parquet clustered on the Z-order curve over ``cols``: one
    range exchange on the z-key, sorted within each output file so
    row-group min/max stats are tight on EVERY interleaved column."""
    keyed = with_zorder(df, cols, bits=bits)
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
