"""Training-shard export tests: deterministic placement, in-shard
ordering, manifest integrity, and corruption detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from reactive_data_pipeline_spark.export import (
    assign_shards,
    export_training_shards,
    read_manifest,
    verify_export,
)
from reactive_data_pipeline_spark.functions.chunking import chunk_documents, pack_bins
from reactive_data_pipeline_spark.sources import read_table

from .conftest import SF_DIR


def _chunks(spark):
    docs = read_table(spark, SF_DIR, "documents")
    return pack_bins(chunk_documents(docs, chunk_tokens=32, overlap=8).drop("chunk_text"))


def test_export_roundtrip_and_verify(spark, tmp_path):
    path = str(tmp_path / "shards")
    chunks = _chunks(spark)
    manifest = export_training_shards(chunks, path, n_shards=4)
    rows = {r.shard: r for r in manifest.collect()}
    assert set(rows) == {0, 1, 2, 3}
    back = spark.read.parquet(path)
    assert back.count() == chunks.count()
    # the stored manifest verifies against a recount of the written data
    assert verify_export(spark, path)
    # totals line up with the source
    assert sum(r.n_chunks for r in rows.values()) == chunks.count()


def test_export_is_deterministic(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    chunks = _chunks(spark)
    m1 = export_training_shards(chunks, p1, n_shards=4)
    m2 = export_training_shards(chunks, p2, n_shards=4)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


def test_shards_internally_sorted(spark, tmp_path):
    path = str(tmp_path / "shards")
    export_training_shards(_chunks(spark), path, n_shards=2)
    one = spark.read.parquet(f"{path}/shard=0")
    got = [(r.doc_id, r.chunk_idx) for r in one.collect()]
    assert got == sorted(got)


def test_verify_detects_tamper(spark, tmp_path):
    import glob
    import os

    path = str(tmp_path / "shards")
    export_training_shards(_chunks(spark), path, n_shards=2)
    # drop one shard's data files entirely
    for f in glob.glob(f"{path}/shard=1/*.parquet"):
        os.remove(f)
    assert not verify_export(spark, path)
