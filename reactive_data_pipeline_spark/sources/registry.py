"""Table registry: batch + streaming parquet readers and append sinks.

Maps the reference's source/sink surface onto Spark-native primitives
(SURVEY.md section 2.1):

* S3 table scan  (``resources.py:31,58-67``)  -> :func:`read_table`
* S4 append sink (``resources.py:40-53``)     -> :func:`append_sink`
* S5 derived-row sink (``resources.py:69-76``)-> :func:`partitioned_append_sink`
* S6 DDL auto-create (``resources.py:24``)    -> schema-on-write parquet
* R3 daily partitions (``jobs.py:44-46``)     -> ``partitionBy`` day column

Normalization: ``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it
as a long (``spark.sql.legacy.parquet.nanosAsLong``) and we convert to a
microsecond ``timestamp_ntz`` here, at the source boundary, so every
downstream operator sees one timestamp type. The integer ``div`` keeps the
conversion exact (a double division would lose precision above 2^53 ns).
"""

from __future__ import annotations

import threading
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas

#: Per-session memo of normalized table scans; weak keys so a stopped
#: session's entries die with it (a fresh session re-infers). Guarded
#: by ``_SCAN_LOCK``: catalog builds may run from multiple driver
#: threads against one session.
_SCAN_CACHE: WeakKeyDictionary = WeakKeyDictionary()

_SCAN_LOCK = threading.Lock()


def invalidate_scan_cache(
    spark: SparkSession | None = None,
    sf_dir: str | None = None,
    name: str | None = None,
) -> None:
    """Drop memoized scans: all of them, one session's, or one table's.

    The cache's contract is that fixture tables are immutable within a
    session; anything that rewrites a parquet path and re-reads it via
    ``read_table`` must call this first (or read with
    ``use_cache=False``) - otherwise the stale footer metadata serves a
    silently old frame."""
    with _SCAN_LOCK:
        if spark is None:
            _SCAN_CACHE.clear()
            return
        per_session = _SCAN_CACHE.get(spark)
        if per_session is None:
            return
        if sf_dir is None:
            per_session.clear()
            return
        if name is None:
            for k in [k for k in per_session if k[0] == sf_dir]:
                del per_session[k]
        else:
            per_session.pop((sf_dir, name), None)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def table_size_bytes(sf_dir: str, name: str) -> int:
    """On-disk byte size of a table (single parquet file or a directory
    of part files) - the driver-side input-size probe behind
    exchange sizing (see queries.relational.fact_shuffle_partitions).
    0 when the path does not exist locally (e.g. a remote URI): callers
    must treat 0 as "unknown" and fall back to their minimum."""
    import os

    p = table_path(sf_dir, name)
    if os.path.isfile(p):
        return os.path.getsize(p)
    if os.path.isdir(p):
        total = 0
        for root, _dirs, files in os.walk(p):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith((".", "_"))
            )
        return total
    return 0


def _normalize_events(df: DataFrame) -> DataFrame:
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


#: Per-table post-read normalizers (source-boundary casts only).
_NORMALIZERS = {"events": _normalize_events}


def read_table(
    spark: SparkSession, sf_dir: str, name: str, use_cache: bool = True,
    fresh_plan: bool = False,
) -> DataFrame:
    """Batch scan of one driver table (S3). Filter/column pruning are left
    to Catalyst - callers express predicates declaratively and the parquet
    scan receives them as PushedFilters.

    No automatic repartition here: measurement showed a blanket
    parallelism floor costs more than it saves for shuffle-bound plans
    (joins/aggs re-shuffle on their own keys immediately; the extra
    exchange roughly doubled q3/q5/q10 and count-distinct latencies at
    sf0.1). Operators whose post-scan work is CPU-bound per row
    (shingling, hashing, vector math, regex batteries) opt in explicitly
    via :func:`operators.relational.ensure_parallelism`, where the same
    repartition wins 10-30x on a degenerate single-file layout.

    Scans are memoized per (session, sf_dir, table): ``read.parquet``
    runs a schema-inference job against the footers on EVERY call
    (~0.1-0.2 s), which repeated query builds would pay again and again
    for the same immutable table - the metadata caching every
    catalog-backed engine does. The driver tables are fixtures that
    never change within a session; code that mutates a parquet path it
    then re-reads must pass ``use_cache=False``, call
    :func:`invalidate_scan_cache`, or use ``spark.read`` directly (the
    streaming/merge paths already do). The cache dict is lock-guarded
    for multi-threaded driver use.

    ``fresh_plan=True`` returns a NEW scan node (fresh plan/attribute
    IDs) while still skipping the footer-inference job by reusing the
    memoized schema: the self-join disambiguation case (a subplan that
    re-reads a table the outer plan also joins would otherwise trip
    Spark's ambiguous-self-join check, while ``use_cache=False`` pays
    re-inference on every build). NOT for mutated paths - the schema is
    served from the memo; use ``use_cache=False`` there.
    """
    key = (sf_dir, name)
    if fresh_plan:
        cached = read_table(spark, sf_dir, name, use_cache=use_cache)
        df = spark.read.schema(cached.schema).parquet(table_path(sf_dir, name))
        norm = _NORMALIZERS.get(name)
        # The memoized frame is already normalized; re-normalizing the
        # raw re-read keeps both plans identical in shape. Guard: the
        # events normalizer keys off the RAW dtype, but cached.schema is
        # the POST-normalization schema, so the raw re-read must be
        # re-normalized from its own dtypes, not assumed normalized.
        if norm is not None:
            raw = spark.read.parquet(table_path(sf_dir, name))
            return norm(raw)
        return df
    if use_cache:
        with _SCAN_LOCK:
            got = _SCAN_CACHE.setdefault(spark, {}).get(key)
        if got is not None:
            return got
    df = spark.read.parquet(table_path(sf_dir, name))
    norm = _NORMALIZERS.get(name)
    got = norm(df) if norm else df
    if use_cache:
        with _SCAN_LOCK:
            _SCAN_CACHE.setdefault(spark, {})[key] = got
    return got


def read_stream(
    spark: SparkSession, path: str, name: str = "events", max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan (file source) of a directory of parquet parts.

    The reference's 'stream' is the Dagster asset-materialization event log
    polled by a sensor (``sensors.py:6-16``); here the same role is played
    by a Structured Streaming file source discovering new parquet files.
    ``path`` is a directory (tests write event splits into it to simulate
    arrivals).

    The file schema is peeked from already-present files (a stream needs
    an explicit schema): driver-raw events carry nanosecond-long ``ts``,
    engine-written events carry ``timestamp_ntz`` - the normalizer
    handles either.
    """
    try:
        raw_schema = spark.read.parquet(path).schema
    except Exception:  # empty dir: fall back to the declared schema
        raw_schema = schemas.EVENTS_RAW if name == "events" else schemas.TABLES[name]
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(path)
    norm = _NORMALIZERS.get(name)
    return norm(df) if norm else df


def read_csv(
    spark: SparkSession, path: str, name: str | None = None, **options: str
) -> DataFrame:
    """CSV connector. With ``name`` the declared engine schema is applied
    (no inference job - at scale schema inference is a full extra scan);
    otherwise header+inference for ad-hoc files."""
    reader = spark.read.options(header="true", **options)
    if name is not None:
        df = reader.schema(schemas.TABLES[name]).csv(path)
        norm = _NORMALIZERS.get(name)
        return norm(df) if norm else df
    return reader.option("inferSchema", "true").csv(path)


def read_json(
    spark: SparkSession, path: str, name: str | None = None, **options: str
) -> DataFrame:
    """JSON-lines connector; same declared-schema discipline as CSV."""
    reader = spark.read.options(**options)
    if name is not None:
        df = reader.schema(schemas.TABLES[name]).json(path)
        norm = _NORMALIZERS.get(name)
        return norm(df) if norm else df
    return reader.json(path)


def read_orc(
    spark: SparkSession, path: str, name: str | None = None, **options: str
) -> DataFrame:
    """ORC connector; same declared-schema discipline as CSV/JSON (ORC
    is self-describing, but applying the registry schema keeps column
    types pinned to the engine's declarations)."""
    reader = spark.read.options(**options)
    if name is not None:
        df = reader.schema(schemas.TABLES[name]).orc(path)
        norm = _NORMALIZERS.get(name)
        return norm(df) if norm else df
    return reader.orc(path)


def write_format(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Format-agnostic sink (parquet/csv/json/orc); CSV keeps a header so
    the file round-trips through read_csv."""
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by a join key.

    Bucketing is THE co-located-join tool at scale: two tables bucketed
    on the same key with the same bucket count join with zero exchange -
    the shuffle is paid once at write time, amortized over every
    subsequent join/aggregation on that key. (Parquet files + metastore
    bucket spec; Spark's file-source bucketing, not Hive's.)
    """
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **properties: str,
) -> DataFrame:
    """JDBC table scan - the engine-side equivalent of the reference's
    SQLite ORM select (``resources.py:31,58-67``); Derby's embedded
    driver (bundled with Spark) plays SQLite's role with no server.

    Scale discipline: always pass ``partition_column``/bounds for big
    tables - without them the whole table streams through ONE task.
    Catalyst pushes filters and column pruning into the generated SQL
    either way.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite",
               **properties: str) -> None:
    """JDBC append/overwrite sink (S4's transactional batch insert -
    each task writes its partition in one transaction)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.save()


def write_sorted(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int | None = None
) -> None:
    """Write a dataset range-partitioned + sorted on ``sort_cols``.

    Clustering by the dominant filter/join column makes parquet row-group
    min/max statistics selective: a range predicate on the sort column
    skips whole files/row groups instead of post-filtering every row.
    This is the write-side twin of predicate pushdown - pay one sort at
    write, every later scan reads only the matching key range.
    """
    parts = df.repartitionByRange(*( [n_files] if n_files else [] ), *sort_cols)
    parts.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def compact_dataset(
    spark: SparkSession,
    path: str,
    out_path: str | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Compact a small-files parquet dataset to ~``target_bytes`` files.

    Streaming sinks (one file per micro-batch per partition) and
    per-day appends accumulate small files that poison scan planning at
    scale (one task per file, metadata-bound listings). This rewrites
    the dataset with ``coalesce(ceil(bytes/target))`` - coalesce, not
    repartition: no shuffle, readers merge input splits. Returns the new
    file count. In-place compaction writes to ``<path>.__compact``
    then swaps; pass ``out_path`` to keep the original.

    ``partition_by`` preserves a Hive-partitioned layout (e.g. the
    streaming registries' hash-bucket dirs, whose partition-pruned
    reads would break under a flat rewrite): rows re-cluster per
    partition value (one shuffle - unavoidable to merge a partition's
    files into one) and land back under the same ``col=value``
    directories, ~one file per partition."""
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_bytes))
    dest = out_path or f"{path}.__compact"
    df = spark.read.parquet(path)
    if partition_by:
        (
            df.repartition(*[F.col(c) for c in partition_by])
            .write.partitionBy(*partition_by)
            .mode("overwrite")
            .parquet(dest)
        )
    else:
        df.coalesce(n_files).write.mode("overwrite").parquet(dest)
    if out_path is None:
        shutil.rmtree(path)
        os.rename(dest, path)
    return n_files


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for ``spark.sql`` use."""
    for name in schemas.TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def append_sink(df: DataFrame, path: str) -> None:
    """S4: transactional batch append. The reference does N ``session.add``
    + one commit (``resources.py:42-49``); the parquet equivalent is one
    atomic job commit of all part files."""
    df.write.mode("append").parquet(path)


def partitioned_append_sink(df: DataFrame, path: str, partition_col: str = "partition") -> None:
    """S5 + R3: append keyed by the daily partition column so partition
    pruning works on read (``WHERE partition = 'yyyyMMdd'`` prunes files).
    At cluster scale this is the layout that keeps the reactive layer's
    per-day recompute from rescanning history."""
    df.write.mode("append").partitionBy(partition_col).parquet(path)
