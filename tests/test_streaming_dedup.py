"""Streaming dedup-registry tests: stream-batch equivalence and
incremental convergence as new document files arrive."""

from __future__ import annotations

from pyspark.sql import functions as F

from reactive_data_pipeline_spark.dedup import exact_dedup_groups
from reactive_data_pipeline_spark.sources import read_table
from reactive_data_pipeline_spark.streaming import streaming_dedup_run

from .conftest import SF_DIR
from .helpers import assert_df_equal


def _run(spark, src, out, ckpt):
    q = streaming_dedup_run(spark, str(src), out, ckpt, available_now=True)
    q.awaitTermination(120)
    assert not q.isActive


def test_streaming_registry_equals_batch(spark, tmp_path):
    src = tmp_path / "docs_in"
    src.mkdir()
    out, ckpt = str(tmp_path / "registry"), str(tmp_path / "ckpt")
    docs = read_table(spark, SF_DIR, "documents")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    _run(spark, src, out, ckpt)
    assert_df_equal(spark.read.parquet(out), exact_dedup_groups(docs))


def test_streaming_registry_converges_on_arrival(spark, tmp_path):
    """A new file shifts only the groups it touches; after the second
    drain the registry equals the batch aggregate over everything."""
    src = tmp_path / "docs_in"
    src.mkdir()
    out, ckpt = str(tmp_path / "registry"), str(tmp_path / "ckpt")
    docs = read_table(spark, SF_DIR, "documents")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    _run(spark, src, out, ckpt)
    n_first = spark.read.parquet(out).count()
    assert n_first > 0
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    _run(spark, src, out, ckpt)  # same checkpoint: only the new file replays
    assert_df_equal(spark.read.parquet(out), exact_dedup_groups(docs))
