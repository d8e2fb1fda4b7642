"""Multimodal column support (SURVEY.md section 7.5).

Images/audio/video are carried as opaque ``binary`` payload columns with
a typed metadata struct; per-item decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` (the only sanctioned Python hot path in
the engine - one Python worker per partition, columnar transfer, no
per-row pickling).

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_media`` raises NotImplementedError by design, and
``extract_features`` computes deterministic byte-level pseudo-features so
the Spark-side plumbing (schema, batching, partitioning) is fully real
and testable. Swapping in a real decoder touches only ``_FEATURE_FN``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata carried with every payload.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("encoding", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum_mod", T.LongType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Lift a text column into the opaque-binary multimodal layout
    (payload + typed metadata struct). Real image/audio tables arrive in
    this exact shape from their connectors."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit("utf-8").alias("encoding"),
        ),
    )


def payload_meta(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """JVM-side metadata projection over the multimodal layout (no
    Python): sizes + content digest."""
    with_p = attach_payload(docs, text_col)
    return with_p.select(
        F.col(id_col),
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.sha2(F.col(text_col), 256).alias("sha256_hex"),
    )


def decode_media(docs: DataFrame, media_type: str) -> DataFrame:
    """STUB: real decode (image resize, audio resample, video frame
    sampling) requires codec libraries not present in this container."""
    raise NotImplementedError(
        "media decode is stubbed in this environment; plug a decoder into "
        "extract_features(feature_fn=...) - the Spark plumbing is real."
    )


def _default_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic byte-level pseudo-features standing in for a real
    decoder; vectorized over the Arrow batch."""
    payloads = batch["payload"]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": payloads.map(len).astype("int64"),
            "byte_sum_mod": payloads.map(lambda b: sum(b) % 997).astype("int64"),
            "head_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
        }
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(docs: DataFrame, width: int, height: int, text_col: str = "text") -> DataFrame:
    """Resize plumbing: 1 row in -> 1 row out with a bounded payload.

    A real decoder maps (payload, w, h) -> resized pixels; the container
    has no codecs, so the deterministic stand-in truncates/zero-pads the
    payload to exactly ``width*height`` bytes - same schema, same batch
    shape, same Arrow path a real resize takes.
    """
    size = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "payload": batch["payload"].map(
                        lambda b: bytes(b[:size]).ljust(size, b"\0")
                    ),
                    "width": width,
                    "height": height,
                }
            )

    src = attach_payload(docs, text_col).select("doc_id", "payload")
    return src.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(docs: DataFrame, frame_bytes: int = 64, every_n: int = 4,
                  text_col: str = "text") -> DataFrame:
    """Frame-sampling plumbing: 1 row in -> N rows out (the flatMap batch
    shape a video keyframe sampler has). The stand-in treats the payload
    as fixed-size 'frames' of ``frame_bytes`` and keeps every
    ``every_n``-th one."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                frames = [
                    payload[off : off + frame_bytes]
                    for off in range(0, len(payload), frame_bytes)
                ]
                for idx in range(0, len(frames), every_n):
                    f = bytes(frames[idx])
                    rows.append((int(doc_id), idx, f, len(f)))
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    src = attach_payload(docs, text_col).select("doc_id", "payload")
    return src.mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(docs: DataFrame, text_col: str = "text", feature_fn=None) -> DataFrame:
    """Arrow-batched feature extraction over payload binaries.

    ``feature_fn: pd.DataFrame -> pd.DataFrame`` maps a batch with
    (doc_id, payload) to FEATURE_SCHEMA rows; defaults to the
    deterministic stub.
    """
    fn = feature_fn or _default_features
    src = attach_payload(docs, text_col).select("doc_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield fn(batch)

    return src.mapInPandas(run, schema=FEATURE_SCHEMA)
