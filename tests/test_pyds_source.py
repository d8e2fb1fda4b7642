"""Custom Python DataSource (sources/pyds.py): batch partition fan-out
and the streaming day-per-trigger leg, stream==batch checked."""

from __future__ import annotations

import tempfile
import time

from reactive_data_pipeline_spark.sources.pyds import (
    register_ticker_feed,
    symbol_hash,
    ticker_row,
)


def _batch(spark, symbols: str, days: int):
    register_ticker_feed(spark)
    return (
        spark.read.format("tickerfeed")
        .option("symbols", symbols)
        .option("days", str(days))
        .load()
    )


def test_batch_rows_match_formula(spark):
    rows = {tuple(r) for r in _batch(spark, "AAA,ZQ", 5).collect()}
    expect = {
        ticker_row(s, symbol_hash(s), d) for s in ("AAA", "ZQ") for d in range(5)
    }
    assert rows == expect


def test_batch_partitions_per_symbol(spark):
    df = _batch(spark, "AAA,BBB,CCC", 4)
    # One input partition per symbol - the executor-side fan-out.
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 12


def test_filter_pushdown_prunes_partitions(spark):
    """A pushed symbol equality must PRUNE partitions (the unplanned
    symbols are never generated), and pushed day bounds must shrink
    the per-partition loop - results stay equal to post-scan filtering
    either way. Each query loads a FRESH relation; see the hazard test
    below for why."""
    one = _batch(spark, "AAA,BBB,CCC,DDD", 50).filter("symbol = 'CCC'")
    assert one.rdd.getNumPartitions() == 1  # 3 of 4 partitions pruned
    rows = {tuple(r) for r in one.collect()}
    h = symbol_hash("CCC")
    assert rows == {ticker_row("CCC", h, d) for d in range(50)}

    ranged = (
        _batch(spark, "AAA,BBB,CCC,DDD", 50)
        .filter("symbol = 'AAA' AND day >= 10 AND day < 20")
        .collect()
    )
    h = symbol_hash("AAA")
    assert {tuple(r) for r in ranged} == {
        ticker_row("AAA", h, d) for d in range(10, 20)
    }
    # Disjunctions cannot decompose into pushable conjuncts; Spark
    # evaluates them post-scan over the full generation.
    assert (
        _batch(spark, "AAA,BBB,CCC,DDD", 50)
        .filter("symbol = 'AAA' OR day = 0")
        .count()
        == 50 + 3
    )


def test_pushdown_state_sticks_to_relation(spark):
    """ENGINE SHARP EDGE, pinned so a behavior change is noticed:
    pushFilters mutations attach to the LOADED RELATION, and Spark
    (4.1) does not re-invoke pushFilters for plans without pushable
    filters - so after one pushed query, further queries over the SAME
    DataFrame see the narrowed scan. The rule for any reader that
    implements pushFilters: one .load() per query (cheap - load is
    lazy). If this test starts failing with 200, Spark fixed the
    sharing semantics and the fresh-load rule can be dropped."""
    df = _batch(spark, "AAA,BBB,CCC,DDD", 50)
    assert df.count() == 200  # pre-pushdown: full relation
    assert df.filter("symbol = 'CCC'").count() == 50  # mutates reader
    assert df.count() == 50  # stale pruning persists on the relation


def test_sink_roundtrip_and_commit_marker(spark):
    import os

    from reactive_data_pipeline_spark.sources.pyds import register_ticker_store

    register_ticker_store(spark)
    df = _batch(spark, "AAA,BBB", 5)
    out = tempfile.mkdtemp(prefix="store_rt_")
    df.write.format("tickerstore").option("path", out).mode("append").save()
    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert all(not n.startswith("_tmp") for n in names)  # staging cleaned
    back = spark.read.schema(
        "symbol string, day long, open_cents long, close_cents long, volume long"
    ).csv(out)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in df.collect()
    }


def test_sink_abort_publishes_nothing(spark):
    """Two-phase commit: a failing task must abort the WHOLE job with
    no torn output - no part files, no _SUCCESS, no leftover staging."""
    import os

    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from reactive_data_pipeline_spark.sources.pyds import register_ticker_store

    register_ticker_store(spark)

    @F.udf(returnType=LongType())
    def boom(day):
        if day >= 3:
            raise ValueError("injected task failure")
        return day

    df = _batch(spark, "AAA,BBB", 5).withColumn("day", boom("day"))
    out = tempfile.mkdtemp(prefix="store_abort_")
    with pytest.raises(Exception):
        df.write.format("tickerstore").option("path", out).mode("append").save()
    assert [n for n in os.listdir(out) if not n.startswith("_tmp")] == []
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))


def test_stream_sink_commits_per_batch(spark):
    """Streaming Python sink: per-micro-batch commit under
    deterministic batch-id file names (replay overwrites instead of
    duplicating), committed rows are exactly the generated prefix."""
    import os

    from reactive_data_pipeline_spark.sources.pyds import register_ticker_store

    register_ticker_store(spark)
    out = tempfile.mkdtemp(prefix="sw_out_")
    ckpt = tempfile.mkdtemp(prefix="sw_ckpt_")
    stream = (
        spark.readStream.format("tickerfeed").option("symbols", "AAA,BBB").load()
    )
    q = (
        stream.writeStream.format("tickerstore")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if len([f for f in os.listdir(out) if f.startswith("batch-")]) >= 3:
                break
            time.sleep(1)
    finally:
        q.stop()
    committed = sorted(f for f in os.listdir(out) if f.startswith("batch-"))
    assert len(committed) >= 3
    back = spark.read.schema(
        "symbol string, day long, open_cents long, close_cents long, volume long"
    ).csv([os.path.join(out, f) for f in committed])
    rows = [tuple(r) for r in back.collect()]
    assert len(rows) == len(set(rows))  # no duplicated (symbol, day)
    n_days = max(r[1] for r in rows) + 1
    # Committed batches are a day-prefix (offset = day), one file each.
    assert {r[:2] for r in rows} <= {
        (s, d) for s in ("AAA", "BBB") for d in range(n_days)
    }


def test_stream_equals_batch_prefix(spark):
    """Drain N micro-batches of the streaming leg; the union must be
    EXACTLY the batch relation for the first N days (offset = day)."""
    register_ticker_feed(spark)
    out = tempfile.mkdtemp(prefix="pyds_out_")
    ckpt = tempfile.mkdtemp(prefix="pyds_ckpt_")
    stream = (
        spark.readStream.format("tickerfeed")
        .option("symbols", "AAA,BBB")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 8:  # 4 days x 2 syms
                    break
            except Exception:
                pass  # sink has not committed its first file yet
            time.sleep(1)
    finally:
        q.stop()
    got = spark.read.parquet(out)
    n_days = got.agg({"day": "max"}).collect()[0][0] + 1
    got_rows = {tuple(r) for r in got.filter(got.day < n_days).collect()}
    expect = {
        ticker_row(s, symbol_hash(s), d)
        for s in ("AAA", "BBB")
        for d in range(n_days)
    }
    assert got_rows == expect
    assert n_days >= 4


def test_sink_concurrent_attempts_cannot_interleave(monkeypatch):
    """The advisor's round-4 finding, as a protocol-level pin: two
    attempts of the SAME task (speculation, or a zombie that outlives
    its retry) must stage to DIFFERENT files - uuid staging - so the
    committed file is exactly one attempt's intact output, never an
    interleaving; commit renames the winning message's file and sweeps
    the loser's. Driver-side simulation: write() twice for partition 0,
    commit only the second message (Spark commits exactly one winner
    per task)."""
    import os

    from reactive_data_pipeline_spark.sources.pyds import TickerStoreWriter

    class _Ctx:
        @staticmethod
        def partitionId():
            return 0

    monkeypatch.setattr("pyspark.TaskContext.get", staticmethod(lambda: _Ctx))

    out = tempfile.mkdtemp(prefix="store_spec_")
    w = TickerStoreWriter({"path": out})
    loser = w.write(iter([("AAA", 0, 1, 2, 3)]))
    winner = w.write(iter([("AAA", 0, 1, 2, 3), ("BBB", 1, 4, 5, 6)]))
    assert loser.tmp_path != winner.tmp_path  # uuid staging: no clobber
    w.commit([winner])
    names = sorted(os.listdir(out))
    assert names == ["_SUCCESS", "part-00000.csv"]  # loser swept, one file
    with open(os.path.join(out, "part-00000.csv")) as fh:
        assert fh.read().splitlines() == ["AAA,0,1,2,3", "BBB,1,4,5,6"]


def test_stream_sink_commit_sweeps_losing_attempts(monkeypatch):
    """Streaming leg of the same contract: abort only runs on batch
    FAILURE, so a losing attempt's staged file must be swept by the
    next successful commit or it leaks for the stream's lifetime."""
    import os

    from reactive_data_pipeline_spark.sources.pyds import TickerStoreStreamWriter

    class _Ctx:
        @staticmethod
        def partitionId():
            return 0

    monkeypatch.setattr("pyspark.TaskContext.get", staticmethod(lambda: _Ctx))

    out = tempfile.mkdtemp(prefix="store_stream_spec_")
    w = TickerStoreStreamWriter({"path": out})
    loser = w.write(iter([("AAA", 0, 1, 2, 3)]))
    winner = w.write(iter([("AAA", 0, 9, 9, 9)]))
    assert loser.tmp_path != winner.tmp_path
    w.commit([winner], batchId=7)
    names = sorted(os.listdir(out))
    assert names == ["batch-00007-part-00000.csv"]  # loser swept
    with open(os.path.join(out, names[0])) as fh:
        assert fh.read().splitlines() == ["AAA,0,9,9,9"]


def test_sink_sweep_is_scoped_to_own_job(monkeypatch):
    """The round-5 advisor finding, as a protocol-level pin: commit's
    stale-staging sweep must be scoped to THIS writer's job uuid - an
    unscoped `_tmp-*` glob would delete a CONCURRENT job's in-flight
    staged files from the same directory, turning that job's later
    os.replace into FileNotFoundError. Simulate: job B has a staged
    (uncommitted) file when job A commits; B's file must survive A's
    sweep and B's own commit must then succeed."""
    import os

    from reactive_data_pipeline_spark.sources.pyds import TickerStoreWriter

    class _Ctx:
        @staticmethod
        def partitionId():
            return 0

    monkeypatch.setattr("pyspark.TaskContext.get", staticmethod(lambda: _Ctx))

    out = tempfile.mkdtemp(prefix="store_twojobs_")
    a = TickerStoreWriter({"path": out})
    b = TickerStoreWriter({"path": out})
    assert a.job_uuid != b.job_uuid
    b_msg = b.write(iter([("BBB", 1, 4, 5, 6)]))
    a_msg = a.write(iter([("AAA", 0, 1, 2, 3)]))
    a.commit([a_msg])
    assert os.path.exists(b_msg.tmp_path), "A's sweep deleted B's staging"
    b.commit([b_msg])  # would raise FileNotFoundError before the fix
    # Both jobs committed partition 0; last-writer-wins on the final
    # name, which is the pre-existing semantics for same-path jobs -
    # the contract pinned HERE is only that neither commit blows up on
    # the other's staging.
    with open(os.path.join(out, "part-00000.csv")) as fh:
        assert fh.read().splitlines() == ["BBB,1,4,5,6"]


def test_sink_survives_real_task_retry():
    """End-to-end twin of the simulated-attempt pins above: a REAL
    injected task failure under ``local[2,2]`` (task retries enabled).
    The first attempt of the failing task dies mid-stage; Spark retries
    it; the job must publish exactly one intact file per partition,
    full row count, zero staging leftovers. Runs in a subprocess
    because the retry policy is fixed at session creation (the shared
    test session is local[4] with maxFailures=1)."""
    import json
    import subprocess
    import sys
    import textwrap
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    code = textwrap.dedent(
        """
        import json, os, sys, tempfile
        sys.path.insert(0, %(repo)r)
        from pyspark.sql import SparkSession, functions as F
        from pyspark.sql.types import LongType

        spark = (SparkSession.builder.master("local[2,2]")
                 .appName("retry-e2e")
                 .config("spark.sql.shuffle.partitions", "2")
                 .config("spark.ui.showConsoleProgress", "false")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        from reactive_data_pipeline_spark.sources.pyds import (
            register_ticker_feed, register_ticker_store)
        register_ticker_feed(spark); register_ticker_store(spark)

        marker = os.path.join(tempfile.mkdtemp(prefix="retry_m_"), "a")
        out = tempfile.mkdtemp(prefix="retry_out_")

        @F.udf(returnType=LongType())
        def fail_once(day):
            if day == 0 and not os.path.exists(marker):
                open(marker, "w").close()
                raise ValueError("injected first-attempt failure")
            return day

        df = (spark.read.format("tickerfeed")
              .option("symbols", "AAA,BBB").option("days", "5").load()
              .withColumn("day", fail_once("day")))
        df.write.format("tickerstore").option("path", out).mode("append").save()
        names = sorted(os.listdir(out))
        parts = [n for n in names if n.startswith("part-")]
        rows = sum(1 for p in parts for _ in open(os.path.join(out, p)))
        print(json.dumps({
            "parts": len(parts),
            "tmps": len([n for n in names if n.startswith("_tmp")]),
            "rows": rows,
            "success": "_SUCCESS" in names,
            "retried": os.path.exists(marker),
        }))
        spark.stop()
        """
    ) % {"repo": repo}
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert p.returncode == 0, p.stderr[-2000:]
    got = json.loads([ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1])
    assert got == {
        "parts": 2, "tmps": 0, "rows": 10, "success": True, "retried": True
    }


def test_sink_commit_reaps_aged_orphans(monkeypatch):
    """ADVICE r6: uuid-scoping the sweep left crashed jobs' staging
    (`_tmp-<dead-uuid>-*`) unreaped forever. Commit now also removes
    _tmp files older than the TTL regardless of uuid - while a FRESH
    foreign staging file (a live concurrent job) still survives."""
    import os
    import time

    from reactive_data_pipeline_spark.sources import pyds
    from reactive_data_pipeline_spark.sources.pyds import TickerStoreWriter

    class _Ctx:
        @staticmethod
        def partitionId():
            return 0

    monkeypatch.setattr("pyspark.TaskContext.get", staticmethod(lambda: _Ctx))

    out = tempfile.mkdtemp(prefix="store_orphans_")
    dead = os.path.join(out, "_tmp-deadbeef-cafe-part-00007.csv")
    live = os.path.join(out, "_tmp-feedface-beef-part-00008.csv")
    for p in (dead, live):
        with open(p, "w") as fh:
            fh.write("x\n")
    old = time.time() - pyds._ORPHAN_TTL_SEC - 60
    os.utime(dead, (old, old))

    w = TickerStoreWriter({"path": out})
    w.commit([w.write(iter([("AAA", 0, 1, 2, 3)]))])
    assert not os.path.exists(dead), "aged orphan not reaped"
    assert os.path.exists(live), "fresh foreign staging must survive"


def test_python_source_usable_from_fresh_worker_thread(spark, tmp_path):
    """DATA_SOURCE_NOT_FOUND race, pinned deterministically: the JVM's
    DataSource.lookupDataSource gates user-defined PYTHON sources on
    the THREAD-LOCAL active session, and a fresh py4j pinned thread has
    none - so before the fix, a Python-source save from ANY new worker
    thread failed (intermittent in the 8-way smoke only because pooled
    threads sometimes ran a side-effecting call first). _register_once
    now pins the active session for the calling thread; this test
    clears the thread-local explicitly (the worst case) and runs the
    full write+read roundtrip from a worker thread."""
    import threading

    from reactive_data_pipeline_spark.queries import QUERIES

    result = {}

    def worker():
        try:
            spark._jvm.org.apache.spark.sql.SparkSession.clearActiveSession()
            df = QUERIES["pyds_ticker_roundtrip"].build(
                spark, "/root/testdata/sf0.001"
            )
            result["rows"] = df.count()
        except Exception as e:  # noqa: BLE001 - the assertion below reports it
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=worker)
    t.start()
    t.join(timeout=300)
    assert "error" not in result, result["error"]
    assert result["rows"] > 0
