"""Scale-stress harness: deliberate skew + memory pressure, measured.

Answers two questions the correctness gate can't: (1) what do the
skew-sensitive plans (shuffle join / aggregation) do when one key owns
40% of a 12M-row fact table - does AQE split it, does salting beat it,
does the unprotected plan straggle; (2) do the shuffle-heaviest catalog
queries COMPLETE (by spilling, not OOMing) when the executor heap is
capped far below the working set.

Each scenario runs in its OWN subprocess because driver/executor heap
is fixed at JVM launch. The parent assembles STRESS.md-ready markdown.

    python tools/stress.py               # all scenarios -> markdown on stdout
    python tools/stress.py --scenario skew_join   # one scenario -> one JSON line

The fixture is deterministic (xxhash64 of a range id - no RNG, no
wall-clock), sized at 12M facts x 50k dim keys with key 0 owning ~40%
of facts: the Zipf-head shape that breaks unprotected shuffle plans at
cluster scale.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/tmp/spark_graft_stress")
N_FACTS = 12_000_000
N_KEYS = 50_000
HOT_SHARE = 40  # percent of facts on key 0
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: The five heaviest shuffle plans in the catalog (by PLAN_AUDIT.md
#: exchange counts + bench cost) - the memory-pressure cohort.
TOP5_SHUFFLE = (
    "training_data_pipeline_v2",
    "training_data_pipeline",
    "training_shards_manifest",
    "q9_product_profit",
    "q18_large_volume_customers",
)


def _session(app: str, extra: dict[str, str] | None = None, cpus: int = 8):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.ui.showConsoleProgress", "false")
        # Roomy default heap for the skew scenarios (the candidate
        # blow-up measurements need headroom to measure, not die);
        # the spill scenarios override this DOWN via ``extra``.
        .config("spark.driver.memory", "8g")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def build_fixture() -> dict:
    """12M-row facts with a 40%-hot key + 50k-key dim, written once.
    Deterministic: every column derives from the range id via xxhash64."""
    from pyspark.sql import functions as F

    spark = _session("stress-fixture", cpus=16)
    t0 = time.time()
    facts = (
        spark.range(N_FACTS)
        .select(
            F.col("id"),
            F.when(F.pmod(F.xxhash64("id"), F.lit(100)) < HOT_SHARE, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_KEYS)))
            .alias("key"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)).alias("v"),
        )
    )
    facts.write.mode("overwrite").parquet(f"{FIXTURE_DIR}/facts.parquet")
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("key"),
        F.concat(F.lit("attr-"), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(97))).alias("attr"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(1000)).alias("weight"),
    )
    dim.write.mode("overwrite").parquet(f"{FIXTURE_DIR}/dim.parquet")
    hot = (
        spark.read.parquet(f"{FIXTURE_DIR}/facts.parquet")
        .filter(F.col("key") == 0)
        .count()
    )
    out = {
        "facts": N_FACTS,
        "dim": N_KEYS,
        "hot_key_rows": hot,
        "hot_share_pct": round(100.0 * hot / N_FACTS, 2),
        "build_sec": round(time.time() - t0, 1),
    }
    spark.stop()
    return out


def skew_join() -> dict:
    """Fact-dim join on the hot key, three ways. The dim (50k rows) is
    deliberately too 'big' to auto-broadcast (threshold lowered) so the
    shuffle-join skew machinery is actually exercised - at 100 TB the
    dim that doesn't fit in memory is exactly this shape."""
    from pyspark.sql import functions as F

    from reactive_data_pipeline_spark.operators.skew import salted_join

    spark = _session(
        "stress-skew-join",
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # let AQE see the skew: default thresholds need >256MB
            # partitions; scale them to this fixture so the SPLIT
            # mechanism (not the threshold constant) is what's tested
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        },
    )
    facts = spark.read.parquet(f"{FIXTURE_DIR}/facts.parquet")
    dim = spark.read.parquet(f"{FIXTURE_DIR}/dim.parquet")

    def agg(join_df):
        return join_df.groupBy("attr").agg(F.sum("v").alias("s"))

    def run(df) -> tuple[float, dict]:
        # collect() (97 result rows) rather than count(): it executes
        # THIS frame's QueryExecution, so the final adaptive plan is
        # readable afterwards - count()/noop-write execute a different
        # one and the plan read would be the pre-AQE initial plan (the
        # round-4 plan-audit trap, re-verified this round).
        t0 = time.time()
        rows = df.collect()
        return round(time.time() - t0, 2), {r.attr: r.s for r in rows}

    agg(facts.join(dim, "key")).collect()  # warm: JIT + page cache, untimed

    res: dict = {}

    # A1: AQE skew-join split (the runtime re-plan path)
    joined = agg(facts.join(dim, "key"))
    res["aqe_split_sec"], v1 = run(joined)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    res["aqe_detected_skew"] = "skew=true" in plan

    # A2: skew machinery off - the unprotected straggler plan
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    res["unprotected_sec"], v2 = run(agg(facts.join(dim, "key")))

    # A3: explicit salting (plan-stable form; AQE split still off)
    salted = salted_join(facts, dim, "key", "key", salt_on="id", n_salts=32)
    res["salted_sec"], v3 = run(agg(salted))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    res["results_identical"] = v1 == v2 == v3
    res["result_groups"] = len(v1)
    spark.stop()
    return res


def skew_agg() -> dict:
    """Aggregation over the hot key: the plain groupBy survives skew
    because partial aggregation (map-side combine) collapses the hot
    key to one row per map task BEFORE the shuffle - measured here so
    the claim is numbers, not prose. salted_agg is the form for the
    non-algebraic cases where partials can't collapse."""
    from pyspark.sql import functions as F

    from reactive_data_pipeline_spark.operators.skew import salted_agg

    spark = _session("stress-skew-agg")
    facts = spark.read.parquet(f"{FIXTURE_DIR}/facts.parquet")

    def plain_frame():
        return facts.groupBy("key").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
        )

    plain_frame().collect()  # warm, untimed

    t0 = time.time()
    plain = plain_frame()
    rows_plain = plain.collect()  # 50k groups; executes plain's own QE
    plain_sec = round(time.time() - t0, 2)
    plan = plain._jdf.queryExecution().executedPlan().toString()

    t0 = time.time()
    salted = salted_agg(
        facts,
        ["key"],
        {
            "s": (F.sum("v"), F.sum),
            "n": (F.count(F.lit(1)), F.sum),
        },
        n_salts=32,
        salt_on="id",
    )
    rows_salted = salted.collect()
    salted_sec = round(time.time() - t0, 2)

    d_plain = {r.key: (r.s, r.n) for r in rows_plain}
    d_salted = {r.key: (r.s, r.n) for r in rows_salted}
    spark.stop()
    return {
        "plain_sec": plain_sec,
        "salted_sec": salted_sec,
        "partial_agg_in_plan": plan.count("HashAggregate") >= 2,
        "groups": len(d_plain),
        "results_identical": d_plain == d_salted,
        "hot_key_rows": d_plain[0][1],
    }


def skew_dedup() -> dict:
    """The dedup families on duplicate-heavy (Zipf-content) corpora -
    the shape a boilerplate-ridden web crawl actually has.

    Part 1: exact dedup with a HOT content key (40% of 2M docs share
    one text). dedup_documents uses a min-over-window keyed on content;
    its docstring argues duplicate groups are tiny so the window is
    skew-free - here we measure the worst case where that assumption
    breaks (one 800k-row window group) against the agg+semi-join form
    that never materializes a per-group window.

    Part 2: MinHash LSH on a corpus where one content has m=2,000
    exact copies. Banding is QUADRATIC in duplicate multiplicity
    (every band bucket holds all m copies -> bands*m^2/2 candidate
    pairs), so the pipeline rule is EXACT DEDUP FIRST - measured here
    as naive-vs-composed candidate counts and wall clock.
    """
    from pyspark.sql import functions as F

    from reactive_data_pipeline_spark.dedup.exact import dedup_documents
    from reactive_data_pipeline_spark.dedup.minhash import minhash_lsh_pairs
    from reactive_data_pipeline_spark.functions.text import normalize_ws

    spark = _session("stress-skew-dedup", cpus=16)
    res: dict = {}

    # ---- part 1: hot-key exact dedup, window vs agg+join ----
    n_docs, hot_pct = 2_000_000, 40
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.pmod(F.xxhash64("id"), F.lit(100)) < hot_pct,
            F.lit("the hot boilerplate page body that repeats across the crawl"),
        )
        .otherwise(F.concat(F.lit("unique document body "), F.conv(F.hex(F.xxhash64("id", F.lit(1))), 16, 36)))
        .alias("text"),
    )
    docs.write.mode("overwrite").parquet(f"{FIXTURE_DIR}/docs_hot.parquet")
    hot_docs = spark.read.parquet(f"{FIXTURE_DIR}/docs_hot.parquet")

    dedup_documents(hot_docs).count()  # warm, untimed

    t0 = time.time()
    n_window = dedup_documents(hot_docs).count()
    res["exact_window_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    keeper = hot_docs.groupBy(normalize_ws("text").alias("__k")).agg(
        F.min("doc_id").alias("doc_id")
    )
    n_aggjoin = hot_docs.join(keeper, "doc_id", "left_semi").count()
    res["exact_aggjoin_sec"] = round(time.time() - t0, 2)
    res["exact_survivors_equal"] = n_window == n_aggjoin
    res["exact_survivors"] = n_window

    # ---- part 2: LSH banding on m exact copies: dedup-first rule ----
    m_copies, n_small = 2_000, 100_000
    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()
    base_text = " ".join(words)
    small = spark.range(n_small).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < m_copies, F.lit(base_text))
        .when(
            F.col("id") < m_copies + 1_000,
            # 20 near-dup clusters of 50: one trailing token varies per
            # member, so intra-cluster trigram jaccard stays >= 0.5
            F.concat(
                F.lit(base_text + " "),
                (F.col("id") % 50).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("unique "),
                F.conv(F.hex(F.xxhash64("id", F.lit(7))), 16, 36),
                F.lit(" body text with distinct shingles "),
                F.conv(F.hex(F.xxhash64("id", F.lit(8))), 16, 36),
            )
        )
        .alias("text"),
    )
    small.write.mode("overwrite").parquet(f"{FIXTURE_DIR}/docs_dup.parquet")
    dup_docs = spark.read.parquet(f"{FIXTURE_DIR}/docs_dup.parquet")

    t0 = time.time()
    naive_pairs = minhash_lsh_pairs(dup_docs).count()
    res["lsh_naive_sec"] = round(time.time() - t0, 2)
    res["lsh_naive_pairs"] = naive_pairs

    t0 = time.time()
    composed_pairs = minhash_lsh_pairs(dedup_documents(dup_docs)).count()
    res["lsh_dedup_first_sec"] = round(time.time() - t0, 2)
    res["lsh_dedup_first_pairs"] = composed_pairs
    res["m_copies"] = m_copies
    spark.stop()
    return res


def registry_merge() -> dict:
    """The streaming dedup registry's incremental-maintenance claim,
    measured: `merge_dedup_registry_batch` reads ONLY the buckets a
    batch touches (partition pruning), so per-trigger cost is O(touched
    state), not O(registry). Seed a 2M-fingerprint registry, then merge
    a 1k-row update batch confined to ONE bucket vs spread over ALL
    buckets vs a full-registry rebuild - the wall-clock ordering (and
    the ~B× spread between one-bucket and rebuild) is the evidence."""
    import shutil

    from pyspark.sql import functions as F

    from reactive_data_pipeline_spark.streaming.dedup import (
        REGISTRY_BUCKETS,
        merge_dedup_registry_batch,
    )

    spark = _session("stress-registry", cpus=16)
    out = f"{FIXTURE_DIR}/registry.parquet"
    shutil.rmtree(out, ignore_errors=True)

    def fp_frame(df):
        return df.select(
            F.concat(F.lit("fp-"), F.col("id").cast("string")).alias("fingerprint"),
            F.col("id").alias("keeper_doc_id"),
            F.lit(1).cast("long").alias("n_copies"),
        )

    seed = fp_frame(spark.range(2_000_000))
    t0 = time.time()
    merge_dedup_registry_batch(seed, out)
    seed_sec = round(time.time() - t0, 2)

    # 1k updates confined to ONE bucket: generate candidates and keep
    # those whose fingerprint hashes to bucket 0 (same rule the merge
    # uses), then cap at 1k.
    cands = fp_frame(spark.range(2_000_000, 2_128_000))
    one_bucket = (
        cands.filter(
            F.pmod(F.xxhash64("fingerprint"), F.lit(REGISTRY_BUCKETS)) == 0
        ).limit(1_000)
    ).localCheckpoint(eager=True)
    t0 = time.time()
    merge_dedup_registry_batch(one_bucket, out)
    one_bucket_sec = round(time.time() - t0, 2)

    # 1k updates spread over every bucket (the skew-free worst spread).
    spread = fp_frame(spark.range(3_000_000, 3_001_000)).localCheckpoint(eager=True)
    t0 = time.time()
    merge_dedup_registry_batch(spread, out)
    spread_sec = round(time.time() - t0, 2)

    n_rows = spark.read.parquet(out).count()
    spark.stop()
    return {
        "registry_rows": n_rows,
        "buckets": REGISTRY_BUCKETS,
        "seed_rebuild_sec": seed_sec,
        "merge_1k_one_bucket_sec": one_bucket_sec,
        "merge_1k_all_buckets_sec": spread_sec,
    }


def _rest_spill(spark) -> dict:
    """Sum spill/GC metrics over all completed stages via the UI REST
    API (the only spill counter PySpark exposes without a JVM
    listener)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.loads(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages").read()
    )
    return {
        "memory_spilled_mb": round(
            sum(s.get("memoryBytesSpilled", 0) for s in stages) / 1e6, 1
        ),
        "disk_spilled_mb": round(
            sum(s.get("diskBytesSpilled", 0) for s in stages) / 1e6, 1
        ),
        "stages": len(stages),
    }


def spill_fixture() -> dict:
    """Force a working set >> heap: global sort + wide join of the 12M
    fixture under a 1 GiB driver heap (local mode: executors share it),
    spark.memory.fraction squeezed. PASS = completes via ExternalSorter
    spill (REST counters nonzero), no OOM."""
    from pyspark.sql import functions as F

    spark = _session(
        "stress-spill",
        {
            "spark.driver.memory": "1g",
            "spark.memory.fraction": "0.2",
            "spark.ui.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",  # fixed 8-partition shuffles: big per-task sorts
            "spark.sql.shuffle.partitions": "8",
        },
        cpus=8,
    )
    facts = spark.read.parquet(f"{FIXTURE_DIR}/facts.parquet")
    t0 = time.time()
    # sort-merge self-join on a high-cardinality key: both sides sort
    # 12M rows through 8 reducers under ~25MB execution memory each
    a = facts.select(F.col("v").alias("k"), "id")
    b = facts.select(F.col("v").alias("k"), F.col("id").alias("id2"))
    n = a.join(b, "k").filter(F.col("id") != F.col("id2")).count()
    sec = round(time.time() - t0, 1)
    out = {"join_rows": n, "sec": sec, **_rest_spill(spark)}
    spark.stop()
    return out


def spill_catalog() -> dict:
    """The five shuffle-heaviest catalog queries at sf0.1 under the
    same capped heap - assert completion (the contract: constrained
    memory degrades to spill, never to wrong answers or OOM)."""
    from reactive_data_pipeline_spark.queries import QUERIES

    spark = _session(
        "stress-spill-catalog",
        {
            "spark.driver.memory": "1g",
            "spark.memory.fraction": "0.2",
            "spark.ui.enabled": "true",
        },
        cpus=8,
    )
    times: dict[str, float] = {}
    for name in TOP5_SHUFFLE:
        t0 = time.time()
        df = QUERIES[name].build(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 1)
    out = {"queries": times, **_rest_spill(spark)}
    spark.stop()
    return out


def _cluster_session(app: str):
    """A REAL multi-process cluster: local-cluster[2,2,1536] launches
    two standalone workers, each with its own executor JVM, heap, and
    shuffle directory - so killing an executor process actually loses
    its shuffle files and map outputs (in local[n] everything shares
    one JVM and 'executor loss' cannot be staged). AQE left on: its
    shuffle-read planning must also survive the FetchFailed replans."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(app)
        .master("local-cluster[2,2,1536]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _executor_pids() -> list[int]:
    out = subprocess.run(
        ["bash", "-c", "ps -eo pid,args | grep [C]oarseGrainedExecutorBackend"],
        capture_output=True,
        text=True,
    )
    return [int(ln.split()[0]) for ln in out.stdout.splitlines()]


def _kill_one_executor_after(delay_sec: float) -> list[float]:
    """Background killer: waits, then SIGKILLs one executor JVM.
    Returns a list that receives the kill wall-clock time (empty if no
    executor was found) - callers assert the kill landed INSIDE the
    timed region, otherwise the 'survived a kill' claim is vacuous."""
    import signal
    import threading

    killed_at: list[float] = []

    def job():
        time.sleep(delay_sec)
        pids = _executor_pids()
        if pids:
            os.kill(pids[0], signal.SIGKILL)
            killed_at.append(time.time())

    threading.Thread(target=job, daemon=True).start()
    return killed_at


def executor_loss() -> dict:
    """Round-6 scenario 8: lose an executor JVM mid-query and mid-stream
    (STRESS.md's missing fault axis - the task-retry story was pinned
    at task granularity by the local[2,2] test; this stages real
    process death). Batch: the 12M-fixture fact-dim join + group agg
    runs once undisturbed for ground truth, then re-runs with one
    executor SIGKILLed mid-flight - the dead executor's shuffle map
    outputs are gone, so the driver must FetchFailed-replan (stage
    resubmission) while the standalone master relaunches the executor.
    Streaming: the same aggregation as an availableNow file stream
    (one file per micro-batch), killed between triggers. PASS = both
    perturbed runs return EXACTLY the ground-truth rows (count +
    checksum), i.e. recovery changes time, never answers."""
    from pyspark.sql import functions as F

    def agg_frame(spark):
        facts = spark.read.parquet(f"{FIXTURE_DIR}/facts.parquet")
        dim = spark.read.parquet(f"{FIXTURE_DIR}/dim.parquet")
        return (
            facts.join(dim, "key")
            .groupBy("attr")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v") * F.col("weight")).alias("wv"),
            )
        )

    def checksum(rows) -> tuple[int, int]:
        return (len(rows), sum(hash((r["attr"], r["n"], r["wv"])) for r in rows))

    out: dict = {}

    # --- ground truth + timing baseline (undisturbed, same cluster) ---
    spark = _cluster_session("stress-exec-loss-truth")
    t0 = time.time()
    truth = checksum(agg_frame(spark).collect())
    base_sec = time.time() - t0
    out["batch_base_sec"] = round(base_sec, 1)
    spark.stop()
    time.sleep(2)  # let the old workers/executors exit

    # --- batch run with an executor killed mid-query ---
    spark = _cluster_session("stress-exec-loss-batch")
    # Warm TWICE and time the second: codegen + page cache make the
    # steady-state run ~4x faster than the cold one, and a kill delay
    # scaled to a slower estimate fires after the timed query already
    # finished and proves nothing.
    agg_frame(spark).count()
    t0 = time.time()
    agg_frame(spark).count()
    warm_sec = time.time() - t0
    out["batch_warm_sec"] = round(warm_sec, 1)
    n_before = len(_executor_pids())
    killed_at = _kill_one_executor_after(max(0.3, warm_sec * 0.4))
    t0 = time.time()
    got = checksum(agg_frame(spark).collect())
    t_end = time.time()
    out["batch_killed_sec"] = round(t_end - t0, 1)
    out["batch_executors_before"] = n_before
    out["batch_kill_landed_in_query"] = bool(killed_at) and killed_at[0] < t_end
    out["batch_match"] = got == truth
    spark.stop()
    time.sleep(2)

    # --- streaming run, executor killed mid-stream ---
    spark = _cluster_session("stress-exec-loss-stream")
    facts_schema = spark.read.parquet(f"{FIXTURE_DIR}/facts.parquet").schema
    dim = spark.read.parquet(f"{FIXTURE_DIR}/dim.parquet")
    stream = (
        spark.readStream.schema(facts_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{FIXTURE_DIR}/facts.parquet")
        .join(dim, "key")
        .groupBy("attr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") * F.col("weight")).alias("wv"),
        )
    )
    killed_s = _kill_one_executor_after(max(0.5, base_sec * 0.5))
    t0 = time.time()
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("exec_loss_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    t_end = time.time()
    out["stream_killed_sec"] = round(t_end - t0, 1)
    out["stream_kill_landed_in_query"] = bool(killed_s) and killed_s[0] < t_end
    got_s = checksum(spark.sql("SELECT * FROM exec_loss_totals").collect())
    out["stream_match"] = got_s == truth
    out["executors_after"] = len(_executor_pids())
    spark.stop()
    return out


SCENARIOS = {
    "fixture": build_fixture,
    "skew_join": skew_join,
    "skew_agg": skew_agg,
    "skew_dedup": skew_dedup,
    "registry_merge": registry_merge,
    "spill_fixture": spill_fixture,
    "spill_catalog": spill_catalog,
    "executor_loss": executor_loss,
}


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--scenario":
        print(json.dumps(SCENARIOS[sys.argv[2]]()))
        return
    results: dict[str, dict] = {}
    for name in SCENARIOS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scenario", name],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode != 0 or not lines:
            results[name] = {"FAILED": p.stderr[-2000:]}
        else:
            results[name] = json.loads(lines[-1])
        print(f"# {name}: {results[name]}", file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
