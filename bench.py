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


def run_median(spark, q, sf_dir: str, reps: int) -> float:
    samples = sorted(run_one(spark, q, sf_dir) for _ in range(reps))
    return samples[len(samples) // 2]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
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

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        if not q.bench:
            continue
        timings[name] = round(run_median(spark, q, sf_dir, reps), 3)
        print(f"# {name}: {timings[name]:.3f}s (median of {reps})", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
