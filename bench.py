"""Benchmark runner (driver contract: one JSON line on stdout).

Runs the bench-tagged catalog queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.
Execution is timed end-to-end per query with results drained through
the noop sink (full pipeline cost, no driver-collect skew; tiny
LIMIT-k results are collected instead, which is their real cost model).

Each query runs ``$SPARK_GRAFT_REPS`` times (default 3) and reports the
MEDIAN: single-shot timings on a shared machine showed 2x phantom
swings round-to-round on sub-second queries (scheduling floor + cache
state + co-tenant contention), so one sample is noise, not signal.

Contention defenses (round-5: the r4 driver snapshot mis-read the two
flagship pipelines +43-53% purely from co-tenant load):

* PRE-FLIGHT LOAD PROBE - a fixed 200M-row JVM reduction is timed
  before the run; if two consecutive probe samples disagree by >15%
  the host is busy and the probe retries (up to 5x, short sleep
  between). The final probe seconds are emitted in the JSON
  (``probe_sec``) so any two bench artifacts can be normalized against
  each other's host state.
* ADAPTIVE REPS - if the base reps' spread exceeds 25% of the minimum
  AND 0.3s absolute (sub-second queries jitter >25% from the
  scheduling floor alone - without the absolute guard the first run
  escalated 20/25 queries), the query re-runs with 4 extra reps and
  the reported number is min(median of base reps, median of all reps):
  contention only ever ADDS time, so when samples disagree the lower
  median is the better estimate of the machine-idle cost. Escalated
  queries are listed in ``escalated`` in the JSON, and BOTH medians
  (``base`` and ``all``) are emitted per escalated query under
  ``escalated_medians`` so the discounted value stays visible - a
  genuinely bimodal cost (GC, spill, a plan change's cache-miss path)
  shows up as base ~= all while contention shows base << all.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reactive_data_pipeline_spark import get_spark
from reactive_data_pipeline_spark.queries import QUERIES


def run_one(spark, q, sf_dir: str) -> float:
    t0 = time.time()
    df = q.build(spark, sf_dir)
    # Top-k queries end in limit(); their cost model is the collect.
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    if plan.startswith("GlobalLimit") or "TakeOrdered" in plan:
        df.collect()
    else:
        df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    return xs[len(xs) // 2]


def run_median(spark, q, sf_dir: str, reps: int) -> tuple[float, dict | None]:
    """Median of ``reps`` samples; on a spread >25% of the minimum AND
    >0.3s absolute (the co-tenant contention signature - the absolute
    guard keeps sub-second scheduling jitter from escalating) re-run
    with 4 more reps and report min(median of base, median of all) -
    the less-contended estimate. Returns (seconds, detail) where detail
    is None when not escalated, else {"base": median-of-base-reps,
    "all": median-of-all-reps} so the discarded value stays visible in
    the artifact (genuine bimodal cost - GC, spill, a cache-miss path -
    would otherwise be silently discounted as contention)."""
    samples = [run_one(spark, q, sf_dir) for _ in range(reps)]
    base = _median(samples)
    spread = max(samples) - min(samples)
    if reps < 2 or spread <= 0.3 or max(samples) / max(min(samples), 1e-9) <= 1.25:
        return base, None
    samples += [run_one(spark, q, sf_dir) for _ in range(4)]
    med_all = _median(samples)
    return min(base, med_all), {"base": round(base, 3), "all": round(med_all, 3)}


def load_probe(spark, attempts: int = 5) -> float:
    """Time a fixed parallel JVM reduction until two consecutive
    samples agree within 15% (i.e. the host is quiescent enough that
    timings mean something); returns the last sample. Emitted as
    ``probe_sec`` so artifacts taken under different host states can be
    normalized instead of misread as plan regressions."""
    import time as _time

    prev = None
    for _ in range(attempts):
        t0 = time.time()
        spark.range(200_000_000).selectExpr("sum(id % 7) AS s").collect()
        dt = time.time() - t0
        if prev is not None and abs(dt - prev) / max(prev, dt) <= 0.15:
            return dt
        prev = dt
        _time.sleep(1.0)
    return prev


def latency_probe(spark) -> dict:
    """Host LATENCY fingerprint (round-10): the round-9/10 windows
    proved the load probe blind to the mode that actually moved - a
    fresh r10 window reproduced r9's "throttled" totals with the probe
    EQUAL to r8's (0.183s) and DuckDB FASTER than r8, while r8's own
    code re-run in the same window landed within 7% of current code.
    The degraded resource is scheduling/IPC latency (per-job fixed
    cost, py4j round-trips, thread wakeups) - a dimension Spark leans
    on and a single 32-wide JVM reduction never exercises. Recording
    these per artifact makes the next host-mode shift attributable
    instead of a round-long whodunit:

    * ``job_ms`` - trivial single-task DataFrame job (scheduler +
      planning fixed cost; best of 10);
    * ``py4j_us`` - Python->JVM no-op round-trip (best-of-3 x100);
    * ``pipe_us`` - forked-process pipe ping-pong (kernel ctx-switch);
    * ``kernel`` - os.uname().release (image/kernel drift marker).
    """
    import time as _time

    out: dict = {"kernel": os.uname().release}
    df = spark.range(1)
    df.count()
    best = float("inf")
    for _ in range(10):
        t0 = _time.time()
        df.count()
        best = min(best, _time.time() - t0)
    out["job_ms"] = round(best * 1000, 1)
    jvm = spark.sparkContext._jvm
    best = float("inf")
    for _ in range(3):
        t0 = _time.time()
        for _ in range(100):
            jvm.System.currentTimeMillis()
        best = min(best, (_time.time() - t0) / 100)
    out["py4j_us"] = round(best * 1e6)
    # Error-path hygiene (round-11 advice): every created fd closes and
    # the forked child is reaped no matter where the protocol fails -
    # otherwise a mid-protocol OSError leaks 4 fds and leaves the child
    # blocked on os.read forever (never reaped).
    fds: list[int] = []
    pid = 0
    try:
        r1, w1 = os.pipe()
        fds += [r1, w1]
        r2, w2 = os.pipe()
        fds += [r2, w2]
        pid = os.fork()
        if pid == 0:
            try:
                for _ in range(500):
                    os.read(r1, 1)
                    os.write(w2, b"x")
            finally:
                os._exit(0)  # the child never falls through to main
        t0 = _time.time()
        for _ in range(500):
            os.write(w1, b"x")
            os.read(r2, 1)
        out["pipe_us"] = round((_time.time() - t0) / 500 * 1e6)
        os.waitpid(pid, 0)
        pid = 0
    except OSError:
        pass
    finally:
        if pid > 0:  # parent erred mid-protocol: unblock by kill, then reap
            import signal as _signal

            try:
                os.kill(pid, _signal.SIGKILL)
                os.waitpid(pid, 0)
            except OSError:
                pass
        for fd in fds:
            try:
                os.close(fd)
            except OSError:
                pass
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None
    # The driver parses this process's stdout for the one JSON line;
    # the JVM's unified logging (e.g. "[gc,alloc] Retried waiting for
    # GCLocker..." under heap pressure) writes to the SAME stdout and
    # has been observed landing after the JSON, corrupting the
    # artifact. Spark's own logging goes through log4j/stderr, so
    # disabling Xlog output costs nothing the bench needs.
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.extraJavaOptions": "-Xlog:disable"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM (codegen, shuffle machinery, whole-stage compile) and
    # the OS page cache outside the timed region, with a composite query
    # shaped like the workload: scan + filter + decimal agg + join +
    # window. Steady-state timings are the meaningful comparison - the
    # one-time JIT cost would otherwise land entirely on the first query.
    from pyspark.sql import Window, functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.filter(F.col("l_quantity") > 0)
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("s"))
        .withColumn("r", F.row_number().over(Window.orderBy(F.desc("s"))))
        .write.format("noop").mode("overwrite").save()
    )
    for t in ("documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    # Warm the Python worker + Arrow serialization path too - otherwise
    # the first pandas_udf query in catalog order pays the full ~5s
    # worker-fork/import cost inside its timed region.
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # The closure drags numpy into the worker so vectorized queries
    # don't pay its import either.
    _warm = pandas_udf(lambda v: v * np.float64(1.0), "double")
    spark.range(1000).select(_warm(F.col("id").cast("double"))).write.format("noop").mode(
        "overwrite"
    ).save()

    probe_sec = round(load_probe(spark), 3)
    print(f"# load probe: {probe_sec:.3f}s", file=sys.stderr)
    probe_latency = latency_probe(spark)
    print(f"# latency probe: {probe_latency}", file=sys.stderr)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    # Volume-axis escape hatch (NOT used by the driver): skip named
    # entries whose cost at a synthetic SF is construction-bound and
    # already documented (e.g. minhash_neardup_pairs' candidate mass is
    # quadratic in the fixture's copies-per-class - at sf40 that is
    # ~16x its sf10 cost and it is oracle-nulled/unpaired anyway).
    skip = {
        s for s in os.environ.get("SPARK_GRAFT_SKIP", "").split(",") if s
    }
    skipped = sorted(s for s in skip if s in QUERIES and QUERIES[s].bench)
    if skipped:
        # Recorded in the artifact too (round-9 advice): a silently
        # missing entry is indistinguishable from a removed one when
        # bench_compare diffs two artifacts.
        print(f"# SPARK_GRAFT_SKIP active, omitting: {skipped}", file=sys.stderr)
    timings: dict[str, float] = {}
    escalated: list[str] = []
    escalated_medians: dict[str, dict] = {}
    for name, q in QUERIES.items():
        if not q.bench or name in skip:
            continue
        sec, esc = run_median(spark, q, sf_dir, reps)
        timings[name] = round(sec, 3)
        if esc is not None:
            escalated.append(name)
            escalated_medians[name] = esc
        print(
            f"# {name}: {timings[name]:.3f}s"
            + (
                f" (escalated: contended; base={esc['base']:.3f} all={esc['all']:.3f})"
                if esc is not None
                else f" (median of {reps})"
            ),
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "probe_sec": probe_sec,
                "probe_latency": probe_latency,
                "escalated": escalated,
                "escalated_medians": escalated_medians,
                "skipped": skipped,
            }
        )
    )
    sys.stdout.flush()
    _emit_duckdb_twin(spark, sf_dir, timings, probe_sec, probe_latency)


def _emit_duckdb_twin(spark, sf_dir: str, spark_timings: dict,
                      probe_sec: float, probe_latency: dict | None = None) -> None:
    """Snapshot the DuckDB twin in the SAME window as the Spark bench
    (round-7 verdict #2): cross-window ratio comparisons needed probe-
    normalization guesses because BENCH_rN carried only the Spark side.
    Written to BENCH_DUCKDB_r{N}.json where N-1 is the highest committed
    BENCH_r artifact (i.e. the round this bench run belongs to); a
    re-run within the same window overwrites with a fresher same-window
    pair. Never touches stdout (the driver parses it for the one Spark
    JSON line); any failure is reported on stderr and swallowed - the
    Spark artifact must not be lost to a twin problem. Skip with
    SPARK_GRAFT_NO_DUCKDB=1 (e.g. iterating on one query's timing)."""
    if os.environ.get("SPARK_GRAFT_NO_DUCKDB"):
        return
    try:
        import glob
        import re as _re

        here = os.path.dirname(os.path.abspath(__file__))
        sys.path.insert(0, os.path.join(here, "tools"))
        from bench_duckdb import run_twin

        # Release the executor threads before timing the twin.
        spark.stop()
        threads = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        twin = run_twin(sf_dir, threads)
        twin["probe_sec"] = probe_sec  # the Spark-side window probe
        if probe_latency is not None:
            twin["probe_latency"] = probe_latency
        paired_spark = paired_duck = 0.0
        for name, dt in twin["queries"].items():
            if dt is not None and name in spark_timings:
                paired_duck += dt
                paired_spark += spark_timings[name]
        twin["paired_spark_sec"] = round(paired_spark, 3)
        twin["paired_duckdb_sec"] = round(paired_duck, 3)
        twin["paired_ratio"] = (
            round(paired_spark / paired_duck, 3) if paired_duck else None
        )
        # SPARK_GRAFT_TWIN_OUT names the twin artifact explicitly - used
        # for non-default-SF windows (e.g. the committed sf10 pair,
        # BENCH_SF10_r{N}.json) so they never clobber the round's sf0.1
        # twin of record.
        out = os.environ.get("SPARK_GRAFT_TWIN_OUT")
        if out:
            out = os.path.join(here, out)
        else:
            rounds = [
                int(m.group(1))
                for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
                if (m := _re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p)))
            ]
            n = (max(rounds) if rounds else 0) + 1
            out = os.path.join(here, f"BENCH_DUCKDB_r{n:02d}.json")
        with open(out, "w") as f:
            f.write(json.dumps(twin) + "\n")
        print(
            f"# duckdb twin -> {os.path.basename(out)}: paired ratio "
            f"{twin['paired_ratio']} (spark {twin['paired_spark_sec']}s / "
            f"duckdb {twin['paired_duckdb_sec']}s)",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001 - twin is best-effort by design
        print(f"# duckdb twin skipped: {e!r}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
