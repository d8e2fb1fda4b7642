"""Streaming near-dup registry tests: the banded-simhash stream must
reproduce the batch operator's pair set exactly (candidate generation
is the same pigeonhole banding, split across arrival batches), and
replaying a batch must be a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from reactive_data_pipeline_spark.dedup import simhash_near_pairs
from reactive_data_pipeline_spark.sources import read_table
from reactive_data_pipeline_spark.streaming import (
    neardup_registry_batch,
    read_neardup_pairs,
    streaming_neardup_run,
)

from .conftest import SF_DIR


def _pairs_set(df):
    return {(r.doc_a, r.doc_b, r.hamming) for r in df.collect()}


def test_stream_equals_batch_across_waves(spark, tmp_path):
    src = tmp_path / "docs_in"
    src.mkdir()
    reg = str(tmp_path / "registry")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    docs = read_table(spark, SF_DIR, "documents")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    q = streaming_neardup_run(spark, str(src), reg, pairs, ckpt, available_now=True)
    assert q.awaitTermination(120)
    got = _pairs_set(read_neardup_pairs(spark, pairs))
    want = _pairs_set(simhash_near_pairs(docs, max_hamming=3))
    assert got == want and want, (len(got), len(want))


def test_batch_replay_is_noop(spark, tmp_path):
    reg = str(tmp_path / "registry")
    pairs = str(tmp_path / "pairs")
    docs = read_table(spark, SF_DIR, "documents")
    wave0 = docs.filter(F.col("doc_id") % 2 == 0)
    wave1 = docs.filter(F.col("doc_id") % 2 == 1)
    neardup_registry_batch(wave0, 0, reg, pairs)
    neardup_registry_batch(wave1, 1, reg, pairs)
    before = _pairs_set(read_neardup_pairs(spark, pairs))
    n_reg_before = spark.read.parquet(reg).count()
    # crash-replay of batch 1: same directory overwrite, no re-register
    neardup_registry_batch(wave1, 1, reg, pairs)
    assert _pairs_set(read_neardup_pairs(spark, pairs)) == before
    assert spark.read.parquet(reg).count() == n_reg_before
    # and the two-wave union still equals the batch operator
    assert before == _pairs_set(simhash_near_pairs(docs, max_hamming=3))


def test_registry_compaction_preserves_pruned_layout(spark, tmp_path):
    """Per-trigger appends accumulate small files inside the registry's
    hash-bucket partitions; layout-preserving compaction must merge
    them while keeping the bucket directories (and therefore the
    pruned probe) intact."""
    import glob

    from reactive_data_pipeline_spark.sources.registry import compact_dataset

    reg = str(tmp_path / "registry")
    pairs = str(tmp_path / "pairs")
    docs = read_table(spark, SF_DIR, "documents")
    for i in range(3):
        neardup_registry_batch(docs.filter(F.col("doc_id") % 3 == i), i, reg, pairs)
    before = {
        tuple(r) for r in spark.read.parquet(reg).collect()
    }
    n_before = len(glob.glob(f"{reg}/rbucket=*/*.parquet"))
    compact_dataset(spark, reg, partition_by=["rbucket"])
    n_after = len(glob.glob(f"{reg}/rbucket=*/*.parquet"))
    assert n_after < n_before
    assert glob.glob(f"{reg}/rbucket=*"), "bucket dirs must survive"
    after = {tuple(r) for r in spark.read.parquet(reg).collect()}
    assert after == before
