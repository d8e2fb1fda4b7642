"""Stage-isolated timing for embedding_neardup_lsh (guide section 1:
measure first, noop sink, labelled jobs).

    python tools/profile_lsh.py [sf_dir]

Times, separately: (a) the signature/bucket stage for both signature
modes, (b) buckets + max_bucket cap, (c) candidate distinct, (d) the
full query - each via the noop sink on a fresh build (no cross-stage
cache reuse; the persist() inside the operator is within one build).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from reactive_data_pipeline_spark import get_spark  # noqa: E402
from reactive_data_pipeline_spark.dedup import embedding as E  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile-lsh", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    print(f"N = {n}")

    # Warm JVM + page cache.
    noop(emb.select(F.col("vec_id")))

    sc = spark.sparkContext
    for mode in ("sql", "matmul"):
        for reps in range(2):
            sc.setJobDescription(f"full:{mode}")
            full = E.embedding_neardup_lsh(
                emb, threshold=0.45, max_bucket=64, signatures=mode
            )
            t_full = noop(full)
            spark.catalog.clearCache()
            print(f"full[{mode}] rep{reps}: {t_full:.3f}s")

    # Signature stage only: replicate the internal buckets frame.
    from pyspark.sql.window import Window
    from reactive_data_pipeline_spark.functions.vectors import dot, l2_norm
    from reactive_data_pipeline_spark.operators.relational import ensure_parallelism

    for rep in range(2):
        sides = ensure_parallelism(emb).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v"),
            l2_norm("embedding").alias("nrm"),
        )
        plane_rows = E.md5_planes(32, 8, 64)
        planes_df = spark.createDataFrame(plane_rows, "band int, w long, plane array<double>")
        d = dot("v", "plane")
        contrib = F.when(d > 0, F.col("w")).otherwise(F.lit(0).cast("long"))
        buckets = (
            sides.select("id", "v")
            .crossJoin(F.broadcast(planes_df))
            .select("id", "band", contrib.alias("c"))
            .groupBy("id", "band")
            .agg(F.sum("c").alias("bucket"))
            .select("id", (F.col("bucket") + (F.col("band").cast("long") * F.lit(256))).alias("bk"))
        )
        sc.setJobDescription("sql signatures only")
        print(f"buckets[sql] rep{rep}: {noop(buckets):.3f}s")
        capped = (
            buckets.withColumn("__bn", F.count(F.lit(1)).over(Window.partitionBy("bk")))
            .filter(F.col("__bn") <= 64)
            .drop("__bn")
        )
        sc.setJobDescription("sql signatures + cap")
        print(f"buckets+cap[sql] rep{rep}: {noop(capped):.3f}s")

    spark.stop()


if __name__ == "__main__":
    main()
