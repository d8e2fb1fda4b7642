"""Instrument the mid-sweep session drag (round-9 finding, round-10
verdict #2): after ~130 built catalog queries, ONE long-lived session
runs heavies 1.5-3x slower than fresh. This tool runs the catalog in a
single session and, every ``--every N`` executed queries, snapshots the
JVM/session state and times a FIXED probe workload - the probe's
trajectory (flat vs rising) plus the metric that rises with it names
the mechanism instead of guessing.

Probe: a pure-JVM 200M-row codegen reduction (no IO, no shuffle, no
Python) - the same shape as bench.py's load probe, so a rising probe
here is session decay, not data effects.

Metrics per checkpoint (one JSON line each, stderr gets a summary row):

* heap used/committed/max + per-collector GC count/time (delta GC time
  attributable to the window since the last checkpoint);
* Metaspace + Compressed Class Space + the three segmented CodeHeap
  pools used/max - a full 'non-profiled nmethods' heap disables the
  JIT, the classic slow-creep failure of long-lived Spark drivers;
* loaded-class count and total JIT compilation time;
* codegen cache hit/miss counters
  (CodeGenerator.compileCacheHit/Miss via the Spark metric registry
  where reachable - best-effort);
* persistent-RDD count + storage memory used (accumulated
  localCheckpoint/cache blocks squeeze the unified pool);
* driver thread count, /proc/loadavg, MemAvailable.

Usage:
    python tools/drag_probe.py [sf_dir] [--every N] [--timeout S]
        [--recycle N] [--out FILE] [name ...]

``--recycle N`` recycles the session like volume_smoke; run once with
0 (accumulate) and once with e.g. 40 (control) - a probe that rises
only in the accumulate run is session-caused by construction.
"""

from __future__ import annotations

import json
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

from reactive_data_pipeline_spark import get_spark  # noqa: E402
from reactive_data_pipeline_spark.queries import QUERIES  # noqa: E402
from tools.volume_smoke import (  # noqa: E402
    HEAVY_TIMEOUT,
    SKIP,
    drop_leftover_blocks,
)


def jvm_snapshot(spark) -> dict:
    """Driver-JVM health via java.lang.management (py4j)."""
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out: dict = {}
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    out["heap_used_mb"] = heap.getUsed() // (1 << 20)
    out["heap_committed_mb"] = heap.getCommitted() // (1 << 20)
    out["heap_max_mb"] = heap.getMax() // (1 << 20)
    gcs = {}
    for b in mf.getGarbageCollectorMXBeans():
        gcs[b.getName()] = {
            "count": b.getCollectionCount(),
            "time_ms": b.getCollectionTime(),
        }
    out["gc"] = gcs
    pools = {}
    for p in mf.getMemoryPoolMXBeans():
        name = p.getName()
        if "CodeHeap" in name or name in ("Metaspace", "Compressed Class Space",
                                          "Code Cache"):
            u = p.getUsage()
            pools[name] = {
                "used_mb": round(u.getUsed() / (1 << 20), 1),
                "max_mb": round(u.getMax() / (1 << 20), 1) if u.getMax() > 0 else None,
            }
    out["pools"] = pools
    cl = mf.getClassLoadingMXBean()
    out["classes_loaded"] = cl.getLoadedClassCount()
    out["classes_total"] = cl.getTotalLoadedClassCount()
    comp = mf.getCompilationMXBean()
    out["jit_total_ms"] = comp.getTotalCompilationTime()
    out["threads"] = mf.getThreadMXBean().getThreadCount()
    return out


def spark_snapshot(spark) -> dict:
    """Session-level accumulation: blocks, temp objects, listener bus."""
    sc = spark.sparkContext
    out: dict = {}
    try:
        infos = sc._jsc.sc().getRDDStorageInfo()
        out["persistent_rdds"] = len(infos)
        out["storage_mem_mb"] = round(
            sum(i.memSize() for i in infos) / (1 << 20), 1
        )
        out["storage_disk_mb"] = round(
            sum(i.diskSize() for i in infos) / (1 << 20), 1
        )
    except Exception as e:  # noqa: BLE001
        out["storage_err"] = repr(e)
    try:
        out["temp_views"] = len(spark.catalog.listTables())
    except Exception:  # noqa: BLE001
        out["temp_views"] = None
    try:
        # codegen compile cache counters (Spark metric source registry)
        cg = sc._jvm.org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        out["codegen_hit"] = cg.compileCacheHit().count()
        out["codegen_miss"] = cg.compileCacheMiss().count()
        out["codegen_compile_ms"] = cg.compilationTime().count() // 1_000_000
    except Exception:  # noqa: BLE001
        pass
    try:
        bus = sc._jsc.sc().listenerBus()
        out["listener_queued"] = bus.metrics().numEventsPosted().getCount()
    except Exception:  # noqa: BLE001
        pass
    return out


def host_snapshot() -> dict:
    out: dict = {}
    try:
        out["loadavg"] = float(open("/proc/loadavg").read().split()[0])
        for line in open("/proc/meminfo"):
            if line.startswith("MemAvailable"):
                out["mem_avail_mb"] = int(line.split()[1]) // 1024
                break
    except OSError:
        pass
    return out


def run_probe(spark) -> float:
    """Fixed pure-JVM codegen reduction (bench.py's load-probe shape)."""
    t0 = time.time()
    spark.range(200_000_000).selectExpr(
        "sum(id * 2 + 1) as s", "count(1) as n"
    ).collect()
    return time.time() - t0


def checkpoint(spark, n_built: int, probe_reps: int = 2) -> dict:
    probes = [round(run_probe(spark), 3) for _ in range(probe_reps)]
    snap = {
        "built": n_built,
        "probe_sec": min(probes),
        "probes": probes,
        "jvm": jvm_snapshot(spark),
        "spark": spark_snapshot(spark),
        "host": host_snapshot(),
        "ts": round(time.time(), 1),
    }
    return snap


def main() -> None:
    args = list(sys.argv[1:])

    def opt(flag: str, default, cast):
        if flag in args:
            i = args.index(flag)
            v = cast(args[i + 1])
            del args[i : i + 2]
            return v
        return default

    every = opt("--every", 20, int)
    timeout = opt("--timeout", 180.0, float)
    recycle = opt("--recycle", 0, int)
    keep_blocks = "--keep-blocks" in args
    if keep_blocks:
        args.remove("--keep-blocks")
    out_path = opt("--out", None, str)
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or [n for n in QUERIES if n not in SKIP]

    spark = get_spark()
    sc = spark.sparkContext
    records = [checkpoint(spark, 0)]
    print(f"# baseline probe {records[0]['probe_sec']}s", file=sys.stderr)
    built = 0
    for name in names:
        if recycle and built and built % recycle == 0:
            print(f"# recycling session after {built}", file=sys.stderr)
            spark.stop()
            spark = get_spark()
            sc = spark.sparkContext
        group = f"dragprobe-{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        done = threading.Event()
        q_timeout = max(timeout, HEAVY_TIMEOUT.get(name, 0.0))

        def watchdog(sc=sc, group=group, q_timeout=q_timeout) -> None:
            if not done.wait(q_timeout):
                sc.cancelJobGroup(group)

        threading.Thread(target=watchdog, daemon=True).start()
        t0 = time.time()
        status = "ok"
        try:
            QUERIES[name].build(spark, sf_dir).count()
        except Exception:  # noqa: BLE001
            status = "fail_or_timeout"
            try:
                spark.range(1).count()
            except Exception:  # noqa: BLE001
                print("# context died - restarting", file=sys.stderr)
                spark.stop()
                spark = get_spark()
                sc = spark.sparkContext
        finally:
            done.set()
            sc.setJobGroup("dragprobe-idle", "between queries")
            # --keep-blocks reproduces the pre-round-10 accumulating
            # behavior (the A/B lever for the drag experiment); default
            # is the volume_smoke hygiene.
            if not keep_blocks:
                drop_leftover_blocks(sc)
        built += 1
        dt = round(time.time() - t0, 1)
        print(f"# [{built}/{len(names)}] {name} {dt}s {status}", file=sys.stderr)
        if built % every == 0:
            rec = checkpoint(spark, built)
            records.append(rec)
            j = rec["jvm"]
            gc_ms = sum(g["time_ms"] for g in j["gc"].values())
            print(
                f"# CHECKPOINT built={built} probe={rec['probe_sec']}s "
                f"heap={j['heap_used_mb']}/{j['heap_max_mb']}MB "
                f"gc_total={gc_ms}ms classes={j['classes_loaded']} "
                f"pools={ {k: v['used_mb'] for k, v in j['pools'].items()} } "
                f"rdds={rec['spark'].get('persistent_rdds')} "
                f"storage={rec['spark'].get('storage_mem_mb')}MB",
                file=sys.stderr,
            )
        if out_path:
            with open(out_path, "w") as f:
                for r in records:
                    f.write(json.dumps(r) + "\n")
    records.append(checkpoint(spark, built))
    if out_path:
        with open(out_path, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    base, last = records[0]["probe_sec"], records[-1]["probe_sec"]
    print(json.dumps({"metric": "drag_probe_ratio",
                      "value": round(last / base, 3) if base else None,
                      "baseline_sec": base, "final_sec": last,
                      "checkpoints": len(records)}))
    spark.stop()


if __name__ == "__main__":
    main()
