"""File-level min/max index + pruned reads - manifest-based scan
pruning (the poor-man's Iceberg/Delta file statistics).

Parquet row-group stats prune WITHIN a scan, but Spark still lists and
opens every file. A lakehouse table keeps per-FILE min/max in a
manifest so a predicate can shrink the file LIST before any footer is
touched - at 100 TB / 100k files the difference between planning over
100k paths and planning over the ~100 that can match.

``build_file_index`` bootstraps the manifest with one Spark scan
(grouped by ``input_file_name``, so it parallelizes like any
aggregation and never collects row data); production appends to the
index at write time instead of re-scanning. ``pruned_read`` applies a
range predicate to the manifest and reads only surviving files - the
bounded file list is the ONLY thing that reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_file_index(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """(file, n_rows, <c>_min, <c>_max ...) for every parquet part."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def pruned_read(
    spark: SparkSession,
    index: DataFrame,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int]:
    """Read only files whose [min, max] range for ``col`` intersects
    [lo, hi]; returns (DataFrame over surviving files, n_files_read).
    The caller applies the exact row-level filter on top (file stats
    are a superset bound, same contract as row-group pruning)."""
    keep = index.filter(
        ~((F.col(f"{col}_max") < F.lit(lo)) | (F.col(f"{col}_min") > F.lit(hi)))
    )
    files = [r["file"] for r in keep.select("file").collect()]
    if not files:
        any_file = index.select("file").first()
        if any_file is None:
            raise ValueError("file index is empty - build it first")
        schema = spark.read.parquet(any_file["file"]).schema
        return spark.createDataFrame([], schema), 0
    return spark.read.parquet(*files), len(files)
