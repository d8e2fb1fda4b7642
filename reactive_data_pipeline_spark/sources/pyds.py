"""Custom Python DataSource: the reference's live ticker feed
(`/root/reference/dagster_repository/ops.py:13-29`, a yfinance HTTPS
fetch) re-expressed on Spark 4's Python DataSource API - the idiomatic
way to hang an external feed off the engine without an RDD or a
driver-side download loop.

The feed is DETERMINISTIC SYNTHETIC data (no network in this
environment, and the correctness gate needs reproducible values): each
(symbol, day) cell derives from pure int64 arithmetic on a
31-multiplicative symbol hash - the same fingerprint recurrence the
text operators use - so a DuckDB oracle regenerates the identical
relation from ``generate_series``.

Scale/semantics notes:

* ``partitions()`` returns ONE InputPartition PER SYMBOL, so the read
  parallelizes across executors exactly like a real fan-out fetch
  (the reference's op S2 maps symbols -> fetch tasks); nothing flows
  through the driver.
* Rows cross the Python->JVM boundary through the DataSource exec -
  fine for a connector that talks to an external service anyway; this
  is an INTEGRATION surface, not a hot compute path (the engine's hot
  paths stay JVM-side, see SCALE.md "UDF policy").
* The API also accepts filter pushdown (``DataSourceReader.pushFilters``)
  and a streaming reader (``SimpleDataSourceStreamReader``); the batch
  reader here keeps to the stable core.
"""

from __future__ import annotations

import threading
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: Modulus of the symbol hash (the text fingerprint recurrence's).
HASH_MOD = 1_000_000_007

TICKER_SCHEMA = (
    "symbol string, day bigint, open_cents bigint, close_cents bigint, "
    "volume bigint"
)


def symbol_hash(symbol: str) -> int:
    """31-multiplicative rolling hash over the symbol's code points -
    identical to the DuckDB ``list_reduce`` twin (and to
    functions.text.fingerprint_rolling's recurrence)."""
    h = 0
    for ch in symbol:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


def ticker_row(symbol: str, h: int, day: int) -> tuple[str, int, int, int, int]:
    """One deterministic OHLC-ish row. All arithmetic is int64-safe:
    h < 1e9+7, so h * 1_000_003 < 2^50 and every intermediate fits."""
    r = (h * 1_000_003 + day * 7_919) % 10_000
    open_c = 5_000 + (r % 2_000)
    close_c = 5_000 + ((r * 31 + 17) % 2_000)
    volume = 1_000 + (r * 7) % 9_000
    return (symbol, day, open_c, close_c, volume)


class TickerFeedReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.base_symbols: Sequence[str] = [
            s for s in options.get("symbols", "AAA,BBB").split(",") if s
        ]
        self.days = int(options.get("days", "30"))
        self.symbols = list(self.base_symbols)
        self.day_lo = 0
        self.day_hi = self.days  # exclusive

    def pushFilters(self, filters):
        """Handle symbol equality (-> PARTITION PRUNING: the pruned
        symbols are never planned, let alone generated) and day range
        bounds (-> the per-partition loop shrinks). Everything else
        stays with Spark. This is the don't-generate-what-you-drop
        rule applied to a Python connector - at a real feed it is the
        difference between fetching one symbol and fetching the
        universe."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        # RESET before applying: the reader instance is shared by every
        # query planned over the same loaded relation, and self-mutations
        # persist across plannings - without the reset, one query's
        # pushed filters would silently constrain the next query's scan
        # (verified empirically; see tests/test_pyds_source.py).
        self.symbols = list(self.base_symbols)
        self.day_lo, self.day_hi = 0, self.days

        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col == "symbol" and isinstance(f, EqualTo):
                self.symbols = [s for s in self.symbols if s == f.value]
            elif col == "day" and isinstance(f, EqualTo):
                self.day_lo = max(self.day_lo, int(f.value))
                self.day_hi = min(self.day_hi, int(f.value) + 1)
            elif col == "day" and isinstance(f, GreaterThan):
                self.day_lo = max(self.day_lo, int(f.value) + 1)
            elif col == "day" and isinstance(f, GreaterThanOrEqual):
                self.day_lo = max(self.day_lo, int(f.value))
            elif col == "day" and isinstance(f, LessThan):
                self.day_hi = min(self.day_hi, int(f.value))
            elif col == "day" and isinstance(f, LessThanOrEqual):
                self.day_hi = min(self.day_hi, int(f.value) + 1)
            else:
                yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self) -> Sequence[InputPartition]:
        # One partition per (post-pruning) symbol: the executor-side
        # fan-out, minus everything a pushed symbol filter removed.
        return [InputPartition(s) for s in self.symbols]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        symbol = partition.value
        h = symbol_hash(symbol)
        for day in range(self.day_lo, self.day_hi):
            yield ticker_row(symbol, h, day)


class TickerFeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming leg: one DAY of quotes per micro-batch, the offset IS
    the day index - the reference's sensor-driven re-poll
    (``sensors.py:6-16``) as a first-class streaming source. The
    offset contract makes replay exact: ``read(start)`` regenerates
    day ``start`` deterministically, so checkpoint recovery re-emits
    the identical rows (the engine's exactly-once story needs nothing
    from the feed beyond this determinism)."""

    def __init__(self, options: dict) -> None:
        self.symbols: Sequence[str] = [
            s for s in options.get("symbols", "AAA,BBB").split(",") if s
        ]
        self.hashes = {s: symbol_hash(s) for s in self.symbols}

    def initialOffset(self) -> dict:
        return {"day": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        day = start["day"]
        rows = [ticker_row(s, self.hashes[s], day) for s in self.symbols]
        return iter(rows), {"day": day + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for day in range(start["day"], end["day"]):
            for s in self.symbols:
                yield ticker_row(s, self.hashes[s], day)


class TickerFeedDataSource(DataSource):
    """``spark.read.format("tickerfeed").option("symbols", "AAA,BBB")
    .option("days", "250").load()`` - or ``spark.readStream`` for the
    day-per-trigger streaming leg."""

    @classmethod
    def name(cls) -> str:
        return "tickerfeed"

    def schema(self) -> str:
        return TICKER_SCHEMA

    def reader(self, schema) -> TickerFeedReader:
        return TickerFeedReader(self.options)

    def simpleStreamReader(self, schema) -> TickerFeedStreamReader:
        return TickerFeedStreamReader(self.options)


def register_ticker_feed(spark) -> None:
    """Idempotently register the data source with the session (the
    driver harness supplies a vanilla session, so every query entry
    registers defensively - re-registration overwrites). Python-source
    filter pushdown ships behind a conf (off by default in 4.1);
    a reader that implements ``pushFilters`` REQUIRES it.

    USAGE RULE - one ``.load()`` per query: ``pushFilters`` mutations
    attach to the reader instance behind the loaded relation, and
    Spark 4.1 does not re-invoke ``pushFilters`` for plans WITHOUT
    pushable filters - so a second query over the same loaded
    DataFrame silently inherits the previous query's narrowed scan
    (pinned empirically in tests/test_pyds_source.py). Call
    ``spark.read.format("tickerfeed")...load()`` freshly for each
    logical query."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    _register_once(spark, "tickerfeed", TickerFeedDataSource)


#: (session -> registered source names) under a lock: registration is
#: called defensively by every consuming query (the driver supplies a
#: vanilla session), but ``spark.dataSource.register`` REPLACES the
#: registry entry, and a replace racing another thread's plan-time
#: lookup surfaced as DATA_SOURCE_NOT_FOUND in the 8-way concurrency
#: smoke (round 8). Register once per session; subsequent calls are
#: lock-ordered no-ops, so a lookup can never observe the swap.
_REG_LOCK = threading.Lock()
_REGISTERED: dict = {}


def _register_once(spark, name: str, cls) -> None:
    # JVM-side sharp edge (found by the 8-way concurrency smoke,
    # reproduced deterministically): ``DataSource.lookupDataSource``
    # consults the JVM THREAD-LOCAL active session to decide whether a
    # provider is a user-defined Python source. py4j's pinned-thread
    # mode maps each Python thread to its own JVM thread, and a freshly
    # spawned JVM thread has NO active session (it only becomes set as
    # a side effect of calls like getOrCreate), so a Python-source
    # read/WRITE from a worker thread fails DATA_SOURCE_NOT_FOUND -
    # intermittently, because whether the pooled thread ran such a
    # side-effecting call first is scheduling-dependent. Every
    # consuming query calls this defensively from its own thread, so
    # pin the active session here, on EVERY call (the registration
    # itself stays once-per-session under the lock).
    try:
        spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(
            spark._jsparkSession
        )
    except AttributeError:
        pass  # Spark Connect: no _jvm, and no thread-local lookup either
    with _REG_LOCK:
        names = _REGISTERED.setdefault(spark, set())
        if name not in names:
            spark.dataSource.register(cls)
            names.add(name)


# ---------------------------------------------------------------------------
# Write path: a custom Python sink with two-phase commit
# ---------------------------------------------------------------------------

#: Staging files older than this are orphans of crashed/zombie jobs
#: (their uuid-scoped sweep never ran) and are reaped at the next
#: commit regardless of job uuid. Generous vs any real job duration.
_ORPHAN_TTL_SEC = 3600.0


class _TickerCommit(WriterCommitMessage):
    """Commit message: the temp file a task staged (picklable)."""

    def __init__(self, tmp_path: str, rows: int) -> None:
        self.tmp_path = tmp_path
        self.rows = rows


class TickerStoreWriter(DataSourceWriter):
    """Per-task CSV staging + driver-side atomic publish.

    Protocol (the same two-phase contract every real connector sink
    implements): each task writes to ``_tmp-part-<partitionId>`` and
    returns it as its commit message; ``commit`` - which runs ONLY if
    every task succeeded - renames the staged files to their final
    names and drops a ``_SUCCESS`` marker; ``abort`` deletes the
    staging files, so a failed job publishes NOTHING (no torn output,
    pinned by test). Each attempt stages under a UNIQUE (uuid) name -
    two concurrent attempts of the same task (speculation, or a zombie
    that outlives its retry) therefore cannot interleave writes into
    one file; commit renames exactly one winning message per partition
    and sweeps whatever the losers staged, so at-least-once task
    execution still publishes exactly one file per partition.

    The sweep is scoped to THIS writer's job uuid (minted driver-side
    in ``__init__`` and serialized to every task), so a second
    concurrent job writing to the same directory keeps its own
    in-flight staging files - an unscoped sweep would delete them and
    fail the other job's commit on os.replace. Residual-litter window:
    a zombie attempt of THIS job that enters write() after commit's
    sweep re-creates a ``_tmp-<jobuuid>-*`` file with no later commit
    to sweep it (batch jobs commit once, unlike the stream path);
    harmless to readers (underscore-prefixed) but possible.
    """

    def __init__(self, options: dict) -> None:
        import uuid

        self.path = options["path"]
        # One uuid per WRITER INSTANCE (= per job): tasks inherit it
        # via serialization; attempts distinguish themselves with a
        # second per-attempt uuid in write().
        self.job_uuid = uuid.uuid4().hex

    def write(self, iterator) -> _TickerCommit:
        import csv
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path,
            f"_tmp-{self.job_uuid}-{uuid.uuid4().hex}-part-{pid:05d}.csv",
        )
        n = 0
        with open(tmp, "w", newline="") as fh:
            w = csv.writer(fh)
            for row in iterator:
                w.writerow(list(row))
                n += 1
        return _TickerCommit(tmp, n)

    def commit(self, messages) -> None:
        import glob
        import os
        import re

        for m in messages:
            if m is None:
                continue
            pid = re.search(r"part-(\d+)\.csv$", m.tmp_path).group(1)
            os.replace(m.tmp_path, os.path.join(self.path, f"part-{pid}.csv"))
        # Losing speculative/zombie attempts of THIS job staged under
        # other attempt-uuids; their files are garbage now. Scope the
        # sweep to this job's uuid - another job's in-flight staging
        # files in the same directory are NOT ours to delete.
        for stale in glob.glob(
            os.path.join(self.path, f"_tmp-{self.job_uuid}-*.csv")
        ):
            try:
                os.remove(stale)
            except OSError:
                pass  # a zombie may still hold it; next commit sweeps
        # Orphan sweep (ADVICE r6): staging from CRASHED jobs carries a
        # dead uuid no future commit will ever match, so a directory
        # written repeatedly would accrete _tmp litter unboundedly. Any
        # _tmp file older than the TTL cannot belong to a live job
        # (tasks stage and commit within one run), so age makes it
        # safe to reap across job uuids.
        import time

        cutoff = time.time() - _ORPHAN_TTL_SEC
        for orphan in glob.glob(os.path.join(self.path, "_tmp-*.csv")):
            try:
                if os.path.getmtime(orphan) < cutoff:
                    os.remove(orphan)
            except OSError:
                pass
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class TickerStoreDataSource(DataSource):
    """``df.write.format("tickerstore").option("path", dir).save()`` -
    the write half of the connector lifecycle (the reference's S4
    append sink as a CUSTOM Python sink with real commit/abort
    semantics, next to the built-in parquet/JDBC sinks in
    sources/registry.py)."""

    @classmethod
    def name(cls) -> str:
        return "tickerstore"

    def writer(self, schema, overwrite: bool) -> TickerStoreWriter:
        return TickerStoreWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "TickerStoreStreamWriter":
        return TickerStoreStreamWriter(self.options)


def register_ticker_store(spark) -> None:
    _register_once(spark, "tickerstore", TickerStoreDataSource)


class TickerStoreStreamWriter(DataSourceStreamWriter):
    """Streaming leg of the sink: same staging/commit protocol, but
    commit is PER MICRO-BATCH and the batch id is part of the final
    file name - so a REPLAYED batch (at-least-once delivery after a
    failure) overwrites its own files instead of duplicating rows:
    idempotence by deterministic naming, the
    ``streaming/reactive.py`` merge-sink contract expressed by a
    custom Python connector."""

    def __init__(self, options: dict) -> None:
        import uuid

        self.path = options["path"]
        # Per-stream uuid (driver-side, serialized to tasks): scopes
        # the per-batch sweep so a second stream writing to the same
        # directory keeps its in-flight staging files.
        self.job_uuid = uuid.uuid4().hex

    def write(self, iterator) -> _TickerCommit:
        import csv
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        # Stage under a unique name: concurrent speculative attempts
        # must not clobber each other; commit renames exactly one.
        tmp = os.path.join(
            self.path,
            f"_tmp-{self.job_uuid}-{uuid.uuid4().hex}-part-{pid:05d}.csv",
        )
        n = 0
        with open(tmp, "w", newline="") as fh:
            w = csv.writer(fh)
            for row in iterator:
                w.writerow(list(row))
                n += 1
        return _TickerCommit(tmp, n)

    def commit(self, messages, batchId: int) -> None:
        import glob
        import os
        import re

        for m in messages:
            if m is None:
                continue
            pid = re.search(r"part-(\d+)\.csv$", m.tmp_path).group(1)
            final = os.path.join(
                self.path, f"batch-{batchId:05d}-part-{pid}.csv"
            )
            os.replace(m.tmp_path, final)  # replay overwrites, not dups
        # Sweep losers: a retried/speculative attempt that lost the
        # commit race left its uuid-staged file behind, and abort only
        # runs on batch FAILURE - without this, a long-running stream
        # leaks one staging file per losing attempt forever. Scoped to
        # this stream's uuid: another writer's staging is not ours.
        for stale in glob.glob(
            os.path.join(self.path, f"_tmp-{self.job_uuid}-*.csv")
        ):
            try:
                os.remove(stale)
            except OSError:
                pass  # a zombie may still hold it; next batch sweeps
        # Orphan sweep: litter from DEAD writers (crashed stream/batch
        # jobs whose uuid-scoped sweep never ran) - reaped by age, see
        # _ORPHAN_TTL_SEC.
        import time

        cutoff = time.time() - _ORPHAN_TTL_SEC
        for orphan in glob.glob(os.path.join(self.path, "_tmp-*.csv")):
            try:
                if os.path.getmtime(orphan) < cutoff:
                    os.remove(orphan)
            except OSError:
                pass

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
