"""Deterministic volume scaler for the driver testdata - the missing
axis of the stress/bench evidence.

STRESS.md measures skew, memory, streaming-merge cost, and executor
loss; BENCH_NOTES.md documents (but until round 6 never *measured*)
the claim that explains the entire paired ratio: Spark's ~0.3-0.5 s
per-query plan/codegen/scheduling floor dominates at sf0.1 (17 MB!)
and amortizes as data grows, so the 1.3-1.6x-of-DuckDB aggregate at
sf0.1 is a fixed-cost artifact, not a throughput gap. This tool makes
that claim falsifiable: it builds sf1/sf4-equivalent inputs so
bench.py and tools/bench_duckdb.py can run the UNCHANGED headline set
at 10x/40x volume and the ratio curve can be measured (SCALING.md).

Construction (no RNG anywhere - same rules as the driver data's
seeded generator and tools/stress.py's xxhash fixtures):

* Each output table is COPIES stacked images of the sf0.1 table. Copy
  0 is the identity image (byte-identical rows), so anchor rows that
  queries reference by literal key (e.g. ``vec_id = 0`` in
  knn_brute_cosine) keep existing with their original values.
* Every entity/foreign key gets ``key + copy * 10^9`` - copies are
  disjoint, referential integrity holds per copy, and per-key group
  sizes (orders per customer, lineitems per order, events per user)
  stay constant while group COUNTS scale - the way real corpora grow.
  ``nation``/``region`` stay fixed-size, as in TPC-H's spec scaling;
  timestamps keep their range (more activity per day, not a longer
  history), so date-bucketed aggregates grow per-group the way a
  bigger tenant's would.
* ``documents.text``: copy c is passed through ``translate`` with the
  9 most frequent letters rotated by ``c % 9`` - length (and
  ``n_chars``) is preserved, copy 0 is untouched, different rotations
  share almost no trigrams (so the near-dup families don't see a
  quadratic cross-copy pair blow-up), and copies 9 apart are EXACT
  duplicates under distinct doc_ids - deliberate realistic dup mass
  for the dedup queries.
* ``embeddings.embedding``: component i of copy c gets
  ``+ ((c*31 + i) % 7 - 3) * 0.01`` - a direction (not scale) change,
  so cosine neighborhoods differ per copy instead of collapsing into
  exact ties.

Usage:
    python tools/scale_data.py COPIES [--src /root/testdata/sf0.1]
        [--out /tmp/spark_graft_scale/sf<0.1*COPIES>]

Writes one parquet dir per table, fact tables split across
``min(64, 2*COPIES)`` files so the scan parallelizes like real input.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, functions as F

STRIDE = 1_000_000_000

#: key columns remapped per copy, by table. nation/region stay fixed
#: (spec-style dimension scaling); *_nationkey therefore stays too.
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: the 9 most frequent English letters; copy c rotates this alphabet
#: by c % 9 inside translate() - length-preserving, deterministic.
_ROT = "etaoinsrh"

FACT_FILES = {"lineitem", "orders", "events", "documents", "embeddings"}


def _one_copy(df: DataFrame, table: str, copy: int) -> DataFrame:
    if copy == 0:
        return df
    out = df
    for k in KEY_COLS.get(table, []):
        out = out.withColumn(k, (F.col(k) + F.lit(copy * STRIDE)).cast(df.schema[k].dataType))
    if table == "documents":
        r = copy % 9
        if r:
            rotated = _ROT[r:] + _ROT[:r]
            out = out.withColumn("text", F.translate("text", _ROT, rotated))
    if table == "embeddings":
        # A small additive perturbation alone leaves cross-copy cosine
        # ~0.987 (measured), i.e. every vector gets K-1 near-duplicates
        # and the banded near-dup queries face quadratic pair mass the
        # real corpus wouldn't have (this exact construction filled the
        # disk with 70 GB of sort spill at K=40). Cyclic-shift by
        # 17*c mod dim first - 17 is coprime with the 64-dim vectors,
        # so all copies get distinct directions - then perturb.
        out = out.withColumn(
            "embedding",
            F.expr(
                f"concat(slice(embedding, pmod({copy} * 17, size(embedding)) + 1,"
                f" size(embedding) - pmod({copy} * 17, size(embedding))),"
                f" slice(embedding, 1, pmod({copy} * 17, size(embedding))))"
            ),
        ).withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: (x + ((F.lit(copy * 31) + i) % 7 - 3) * 0.01).cast("float"),
            ),
        )
    return out


def scale_table(spark: SparkSession, src: str, out: str, table: str, copies: int) -> int:
    df = spark.read.parquet(f"{src}/{table}.parquet")
    if table in ("nation", "region"):
        scaled = df
    else:
        scaled = _one_copy(df, table, 0)
        for c in range(1, copies):
            scaled = scaled.unionByName(_one_copy(df, table, c))
    n_files = min(64, 2 * copies) if table in FACT_FILES else 1
    build = f"{out}/_build_{table}"
    scaled.repartition(n_files).write.mode("overwrite").parquet(build)

    # The driver testdata is one parquet FILE per table and
    # tools/bench_duckdb.py's views read exactly that layout, so
    # compact the Spark directory to a single file (default duckdb row
    # groups of ~122k rows keep the file splittable for Spark's scan).
    import shutil

    import duckdb

    con = duckdb.connect()
    con.sql(
        f"COPY (SELECT * FROM '{build}/*.parquet') TO '{out}/{table}.parquet' (FORMAT PARQUET)"
    )
    n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    con.close()
    shutil.rmtree(build)
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("copies", type=int)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sf = 0.1 * args.copies if "sf0.1" in args.src else args.copies
    out = args.out or f"/tmp/spark_graft_scale/sf{sf:g}"
    os.makedirs(out, exist_ok=True)

    from reactive_data_pipeline_spark import get_spark

    spark = get_spark("scale-data", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        n = scale_table(spark, args.src, out, t, args.copies)
        print(f"{t}: {n} rows -> {out}/{t}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
