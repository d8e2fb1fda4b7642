"""Reactive corpus-ingest tests: incremental arrival, re-delivery
idempotence, and equivalence with the batch pipeline over everything
seen."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from reactive_data_pipeline_spark.dedup import dedup_documents
from reactive_data_pipeline_spark.functions.chunking import chunk_documents
from reactive_data_pipeline_spark.functions.text import lang_id, quality_score
from reactive_data_pipeline_spark.sources import read_table
from reactive_data_pipeline_spark.streaming.corpus import corpus_ingest_run

from .conftest import SF_DIR


def _run(spark, src, reg, shards, ckpt):
    q = corpus_ingest_run(spark, str(src), reg, shards, ckpt, available_now=True)
    q.awaitTermination(120)
    assert not q.isActive


def _expected_chunks(spark, docs):
    kept = dedup_documents(docs).filter(
        (quality_score("text") >= 0.5) & (lang_id("text") == "en")
    )
    return chunk_documents(kept, chunk_tokens=32, overlap=8).count()


def test_ingest_accumulates_and_never_reprocesses(spark, tmp_path):
    src = tmp_path / "docs_in"
    src.mkdir()
    reg = str(tmp_path / "registry")
    shards = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    docs = read_table(spark, SF_DIR, "documents")

    first = docs.filter(F.col("doc_id") % 2 == 0)
    first.coalesce(1).write.mode("append").parquet(str(src))
    _run(spark, src, reg, shards, ckpt)
    reg1 = spark.read.parquet(reg).count()
    assert reg1 == dedup_documents(first).count()
    chunks1 = spark.read.parquet(shards).count()
    assert chunks1 == _expected_chunks(spark, first)

    # second arrival: only new content lands in registry + new shard dirs
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    _run(spark, src, reg, shards, ckpt)
    assert spark.read.parquet(reg).count() == dedup_documents(docs).count()
    total = spark.read.parquet(shards).count()
    assert total == _expected_chunks(spark, docs)
    assert len(glob.glob(f"{shards}/ingest_batch=*")) == 2


def test_redelivered_content_is_a_noop(spark, tmp_path):
    """The same documents arriving again (new file, fresh checkpoint -
    the poison case for a blind append pipeline) must not grow the
    registry or the shard set."""
    src = tmp_path / "docs_in"
    src.mkdir()
    reg = str(tmp_path / "registry")
    shards = str(tmp_path / "shards")
    docs = read_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 100)

    docs.coalesce(1).write.mode("append").parquet(str(src))
    _run(spark, src, reg, shards, str(tmp_path / "ck1"))
    reg1 = spark.read.parquet(reg).count()
    chunks1 = spark.read.parquet(shards).count()

    docs.coalesce(1).write.mode("append").parquet(str(src))  # re-delivery
    _run(spark, src, reg, shards, str(tmp_path / "ck2"))  # even a NEW checkpoint
    assert spark.read.parquet(reg).count() == reg1
    assert spark.read.parquet(shards).count() == chunks1
