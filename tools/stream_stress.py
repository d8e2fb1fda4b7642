"""Streaming ingest at volume (round-11 directive 4): drive the two
production streaming jobs through a MULTI-WAVE arrival schedule at
sf1/sf4 and measure the per-trigger cost curve that the design claims
(O(changed keys) state I/O + O(touched buckets) table rewrite for the
dedup registry; O(batch anti-join registry) for corpus ingest).

    python tools/stream_stress.py /tmp/spark_graft_scale/sf4 [--waves 8] [--job dedup|corpus|both]

Schedule per job (one long-lived session - the production driver
shape; each wave is one availableNow drain restarted from the same
checkpoint, the standard incremental-batch deployment):

* waves 0..W-1 - DISJOINT document slices (hash-split), ~N/W docs
  each: the registry grows linearly; the curve of wall seconds and
  state-rows-updated per wave is the scaling evidence.
* wave "replay" - no new files: availableNow must terminate without
  work (replay/no-op cost floor).
* wave "narrow" - 8 docs re-ingested under fresh doc_ids: same
  fingerprints as wave 0 members, <= 8 of the 16 registry buckets
  touched - demonstrates the partition-pruned merge reads a FRACTION
  of the registry (the bucket-layout contract; at corpus scale
  REGISTRY_BUCKETS is sized so incremental loads touch few buckets).

Emits one JSON line per wave:
  {job, wave, rows_in, wall_s, batch_ms, state_total, state_updated,
   registry_rows, registry_mb, shards}
``batch_ms`` sums the trigger durationMs.triggerExecution from the
query's recentProgress (excludes session/stream startup fixed cost,
which wall_s includes); state_* come from the progress stateOperators
(dedup only - corpus ingest keeps its registry in parquet, not the
state store).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from reactive_data_pipeline_spark import get_spark  # noqa: E402
from reactive_data_pipeline_spark.streaming import await_finished  # noqa: E402
from reactive_data_pipeline_spark.streaming.corpus import corpus_ingest_run  # noqa: E402
from reactive_data_pipeline_spark.streaming.dedup import (  # noqa: E402
    streaming_dedup_update_run,
)


def _dir_mb(path: str) -> float:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return round(total / 1e6, 1)


def _progress_stats(q) -> tuple[int, int, int]:
    batch_ms = state_total = state_updated = 0
    for p in q.recentProgress:
        batch_ms += int(p.get("durationMs", {}).get("triggerExecution", 0))
        for so in p.get("stateOperators", []):
            state_total = max(state_total, int(so.get("numRowsTotal", 0)))
            state_updated += int(so.get("numRowsUpdated", 0))
    return batch_ms, state_total, state_updated


def prepare_waves(spark, sf_dir: str, work: str, waves: int) -> list[str]:
    """Split documents into ``waves`` disjoint single-file arrival
    slices (hash of doc_id - deterministic, scale-invariant)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    split_root = f"{work}/split"
    (
        docs.withColumn("__wave", F.pmod(F.xxhash64("doc_id"), F.lit(waves)))
        .repartition("__wave")
        .write.partitionBy("__wave")
        .parquet(split_root)
    )
    out = []
    for w in range(waves):
        parts = sorted(glob.glob(f"{split_root}/__wave={w}/part-*.parquet"))
        assert parts, f"wave {w} is empty"
        if len(parts) > 1:  # repartition("__wave") puts one file per wave
            raise RuntimeError(f"wave {w}: {len(parts)} files, expected 1")
        out.append(parts[0])
    # the narrow wave: 8 wave-0 docs under fresh doc_ids (same text ->
    # same fingerprints -> <= 8 of 16 buckets touched)
    narrow = f"{work}/narrow"
    (
        spark.read.parquet(out[0])
        .orderBy("doc_id")
        .limit(8)
        .withColumn("doc_id", F.col("doc_id") + F.lit(900_000_000))
        .coalesce(1)
        .write.parquet(narrow)
    )
    out.append(sorted(glob.glob(f"{narrow}/part-*.parquet"))[0])
    return out


def run_job(spark, job: str, wave_files: list[str], work: str, timeout: int) -> None:
    src = f"{work}/{job}_src"
    reg = f"{work}/{job}_registry"
    ckpt = f"{work}/{job}_ckpt"
    shards = f"{work}/{job}_shards"
    os.makedirs(src, exist_ok=True)
    waves = len(wave_files) - 1
    labels = [str(w) for w in range(waves)] + ["narrow"]
    # replay wave inserted before narrow: no new file arrives
    schedule = [(lbl, wave_files[i]) for i, lbl in enumerate(labels)]
    schedule.insert(waves, ("replay", None))
    for lbl, path in schedule:
        rows_in = 0
        if path is not None:
            dst = f"{src}/wave_{lbl}.parquet"
            shutil.copy(path, dst)
            rows_in = spark.read.parquet(dst).count()
        t0 = time.time()
        if job == "dedup":
            q = streaming_dedup_update_run(spark, src, reg, ckpt, available_now=True)
        else:
            q = corpus_ingest_run(spark, src, reg, shards, ckpt, available_now=True)
        await_finished(q, timeout=timeout)
        wall = time.time() - t0
        batch_ms, state_total, state_updated = _progress_stats(q)
        try:
            registry_rows = spark.read.parquet(reg).count()
        except Exception:
            registry_rows = 0
        rec = {
            "job": job,
            "wave": lbl,
            "rows_in": rows_in,
            "wall_s": round(wall, 2),
            "batch_ms": batch_ms,
            "state_total": state_total,
            "state_updated": state_updated,
            "registry_rows": registry_rows,
            "registry_mb": _dir_mb(reg),
        }
        if job == "corpus":
            rec["shards"] = len(glob.glob(f"{shards}/ingest_batch=*"))
        print(json.dumps(rec), flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1"
    waves = int(sys.argv[sys.argv.index("--waves") + 1]) if "--waves" in sys.argv else 8
    job = sys.argv[sys.argv.index("--job") + 1] if "--job" in sys.argv else "both"
    timeout = int(sys.argv[sys.argv.index("--timeout") + 1]) if "--timeout" in sys.argv else 600
    work = f"/tmp/stream_stress_{os.path.basename(sf_dir.rstrip('/'))}_{int(time.time())}"
    os.makedirs(work)
    spark = get_spark("stream-stress")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"sf_dir": sf_dir, "waves": waves, "work": work}), flush=True)
    wave_files = prepare_waves(spark, sf_dir, work, waves)
    for j in ("dedup", "corpus") if job == "both" else (job,):
        run_job(spark, j, wave_files, work, timeout)


if __name__ == "__main__":
    main()
