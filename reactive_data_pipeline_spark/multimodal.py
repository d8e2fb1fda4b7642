"""Multimodal column support (SURVEY.md section 7.5).

Images/audio/video are carried as opaque ``binary`` payload columns with
a typed metadata struct; per-item decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` (the only sanctioned Python hot path in
the engine - one Python worker per partition, columnar transfer, no
per-row pickling).

The container has no image/audio codec libraries, but it doesn't need
them: :mod:`.media_codecs` + :mod:`.jpeg` implement real pixel decode
(and encode, for round-trip testing) for PNG (zlib + the five scanline
filters), GIF (LZW + palette), BMP, and baseline JPEG (Huffman +
dequant + IDCT), plus chunk-walking WAV PCM decode - all from the
public specs - so :func:`stdlib_decoder` returns DECODED-image
dimensions/channels (palette expansion included) and
:func:`pixel_aware_resizer` performs an actual nearest-neighbor pixel
resize, in every environment. ``decode_media`` stays pluggable: the
header probe (:func:`probe_media_header`) covers shapes outside the
stdlib envelope (progressive JPEG, Adam7 PNG), and a PIL/ffmpeg-backed
decoder drops in without touching the Spark plumbing.
``extract_features`` similarly computes deterministic byte-level
pseudo-features by default.
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


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def probe_media_header(b: bytes) -> dict:
    """Pure-stdlib container-header decode: identifies the format from
    magic bytes and extracts the cheap structural metadata (image
    dimensions, WAV audio layout) without any codec library. The default
    ``decoder`` for :func:`decode_media`; a PIL/ffmpeg decoder returning
    the same dict shape plugs in unchanged."""
    out = {"media_type": None, "width": None, "height": None,
           "channels": None, "sample_rate": None}
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        out["media_type"] = "image/png"
        out["width"] = int.from_bytes(b[16:20], "big")
        out["height"] = int.from_bytes(b[20:24], "big")
    elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        out["media_type"] = "image/gif"
        out["width"] = int.from_bytes(b[6:8], "little")
        out["height"] = int.from_bytes(b[8:10], "little")
    elif b[:2] == b"BM" and len(b) >= 26:
        out["media_type"] = "image/bmp"
        out["width"] = int.from_bytes(b[18:22], "little", signed=True)
        out["height"] = abs(int.from_bytes(b[22:26], "little", signed=True))
    elif b[:2] == b"\xff\xd8":
        out["media_type"] = "image/jpeg"
        i = 2
        while i + 9 < len(b) and b[i] == 0xFF:
            marker, seg_len = b[i + 1], int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                out["height"] = int.from_bytes(b[i + 5 : i + 7], "big")
                out["width"] = int.from_bytes(b[i + 7 : i + 9], "big")
                break
            i += 2 + seg_len
    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 28:
        out["media_type"] = "audio/wav"
        out["channels"] = int.from_bytes(b[22:24], "little")
        out["sample_rate"] = int.from_bytes(b[24:28], "little")
    else:
        try:
            b.decode("utf-8")
            out["media_type"] = "text/plain"
        except (UnicodeDecodeError, AttributeError):
            out["media_type"] = "application/octet-stream"
    return out


def pil_decoder(b: bytes) -> dict:
    """Real pixel-level image decode via PIL when it is installed:
    opens the payload, reads verified dimensions and channel count from
    the decoded image (not the container header), and falls back to
    :func:`probe_media_header` for non-image payloads or when PIL is
    absent. Same dict shape as the header probe, so it plugs into
    :func:`decode_media` unchanged. Import happens inside the call (on
    the executor) so clusters with PIL on workers but not the driver
    still work - and vice versa the fallback keeps the pipeline total.
    """
    try:
        import io

        from PIL import Image
    except ImportError:
        return probe_media_header(b)
    out = probe_media_header(b)
    if out["media_type"] and out["media_type"].startswith("image/"):
        with Image.open(io.BytesIO(b)) as im:
            out["width"], out["height"] = im.size
            out["channels"] = len(im.getbands())
    return out


def stdlib_decoder(b: bytes) -> dict:
    """Real pixel/sample decode with no codec library (round-7 gap #3):
    PNG (zlib + scanline unfiltering), GIF (LZW + palette), BMP, and
    baseline JPEG (Huffman + dequant + IDCT) payloads are fully
    decoded (:func:`.media_codecs.decode_pixels`)
    so width/height/channels come from the DECODED image - palette
    expansion included, which the header probe cannot see - and WAV
    payloads get a chunk-walking PCM decode
    (:func:`.media_codecs.wav_decode`) instead of fixed-offset field
    reads. Shapes outside the supported envelope (progressive JPEG,
    Adam7 PNG, 16-bit depth, RLE BMP) fall back to the header probe
    rather than mis-decoding.
    """
    from . import media_codecs

    out = probe_media_header(b)
    try:
        if out["media_type"] in (
            "image/png", "image/gif", "image/bmp", "image/jpeg",
        ):
            out["width"], out["height"], out["channels"], _ = (
                media_codecs.decode_pixels(b)
            )
        elif out["media_type"] == "audio/wav":
            d = media_codecs.wav_decode(b)
            out["channels"], out["sample_rate"] = d["channels"], d["sample_rate"]
    except ValueError:
        pass  # unsupported envelope: the probe's header fields stand
    return out


def best_decoder():
    """The strongest decoder available in this environment: PIL-backed
    when importable, else the stdlib pixel decoder (real PNG/GIF/BMP/
    baseline-JPEG pixel and WAV sample decode; header probe only for
    shapes outside that envelope)."""
    try:
        import PIL  # noqa: F401

        return pil_decoder
    except ImportError:
        return stdlib_decoder


def decode_media(
    docs: DataFrame,
    decoder=None,
    text_col: str = "text",
    payload_col: str | None = None,
) -> DataFrame:
    """Per-payload media decode as an Arrow-batched 1->1 map.

    ``decoder: bytes -> dict`` supplies the decode itself (default:
    :func:`probe_media_header`, stdlib-only header parsing - real in
    every environment; swap in PIL/ffmpeg for pixel/sample access).
    Decoder exceptions land in the ``(ok, error)`` columns instead of
    killing the job - at corpus scale a few corrupt payloads are data,
    not a crash.

    With ``payload_col`` the input already carries binary payloads
    (the real multimodal layout); otherwise ``text_col`` is lifted via
    :func:`attach_payload` (the driver corpus shape).
    """
    fn = decoder or probe_media_header
    if payload_col is None:
        src = attach_payload(docs, text_col).select("doc_id", "payload")
    else:
        src = docs.select("doc_id", F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    d = fn(raw)
                    rows.append(
                        (int(doc_id), d.get("media_type"), d.get("width"),
                         d.get("height"), d.get("channels"), d.get("sample_rate"),
                         len(raw), True, None)
                    )
                except Exception as e:  # corrupt payload -> data, not crash
                    rows.append((int(doc_id), None, None, None, None, None,
                                 len(raw), False, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    return src.mapInPandas(run, schema=DECODE_SCHEMA)


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


def byte_resizer(b: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resizer: truncate/zero-pad the payload to
    exactly ``width*height`` bytes - same schema, batch shape and Arrow
    path a real resize takes, defined for ANY payload."""
    size = width * height
    return bytes(b[:size]).ljust(size, b"\0")


def pixel_aware_resizer(b: bytes, width: int, height: int) -> bytes:
    """Real resize where the payload allows it: PNG/GIF/BMP payloads go
    through an actual pixel decode -> nearest-neighbor sample ->
    re-encode as PNG (:func:`.media_codecs.png_resize_nearest`, pure
    stdlib+numpy); everything else (and images outside the supported
    envelope) takes the byte stand-in, keeping the operator total over
    mixed corpora."""
    from . import media_codecs

    try:
        return media_codecs.png_resize_nearest(bytes(b), width, height)
    except ValueError:
        return byte_resizer(b, width, height)


def resize_media(
    docs: DataFrame,
    width: int,
    height: int,
    text_col: str = "text",
    resizer=None,
    payload_col: str | None = None,
) -> DataFrame:
    """Resize plumbing: 1 row in -> 1 row out with a bounded payload.

    ``resizer: (bytes, w, h) -> bytes`` supplies the resize itself.
    The default stays the deterministic byte stand-in (the driver
    corpus is text payloads, where "resize" has no pixel meaning);
    :func:`pixel_aware_resizer` plugs in a REAL pixel resize for PNG/GIF/BMP
    payloads with no change to the Spark plumbing. ``payload_col``
    mirrors :func:`decode_media`: binary payloads pass through as-is,
    otherwise ``text_col`` is lifted via :func:`attach_payload`.
    """
    fn = resizer or byte_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "payload": batch["payload"].map(
                        lambda b: fn(b, width, height)
                    ),
                    "width": width,
                    "height": height,
                }
            )

    if payload_col is None:
        src = attach_payload(docs, text_col).select("doc_id", "payload")
    else:
        src = docs.select("doc_id", F.col(payload_col).alias("payload"))
    return src.mapInPandas(run, schema=RESIZE_SCHEMA)


def byte_frame_sampler(b: bytes, frame_bytes: int, every_n: int) -> list:
    """Deterministic stand-in sampler: the payload as fixed-size byte
    'frames', keeping every ``every_n``-th - defined for ANY payload."""
    frames = [b[off : off + frame_bytes] for off in range(0, len(b), frame_bytes)]
    return [(idx, bytes(frames[idx])) for idx in range(0, len(frames), every_n)]


def gif_aware_frame_sampler(b: bytes, frame_bytes: int, every_n: int) -> list:
    """Real keyframe sampling where the payload allows it: animated-GIF
    payloads are decoded frame by frame with the spec's disposal
    composition (:func:`.media_codecs.gif_decode_frames`) and every
    ``every_n``-th composited frame comes back PNG-encoded; everything
    else takes the byte stand-in, keeping the operator total over
    mixed corpora. ``frame_idx`` is the GIF frame number on the real
    path (the byte-window index on the stand-in path)."""
    from . import media_codecs

    if bytes(b[:6]) in (b"GIF87a", b"GIF89a"):
        try:
            _sw, _sh, frames = media_codecs.gif_decode_frames(bytes(b))
            return [
                (idx, media_codecs.png_encode(frames[idx]))
                for idx in range(0, len(frames), every_n)
            ]
        except (ValueError, MemoryError):
            # MemoryError joins ValueError (the decode_pixels
            # normalization, round-9 advice): a hostile payload that
            # slips past the volume caps must degrade to the byte
            # stand-in, not kill the executor task.
            pass
    return byte_frame_sampler(b, frame_bytes, every_n)


def sample_frames(docs: DataFrame, frame_bytes: int = 64, every_n: int = 4,
                  text_col: str = "text", sampler=None,
                  payload_col: str | None = None) -> DataFrame:
    """Frame-sampling plumbing: 1 row in -> N rows out (the flatMap batch
    shape a video keyframe sampler has).

    ``sampler: (bytes, frame_bytes, every_n) -> [(idx, frame_bytes)]``
    supplies the sampling itself. The default stays the deterministic
    byte stand-in (the driver corpus is text payloads, where 'frame'
    has no pixel meaning); :func:`gif_aware_frame_sampler` plugs in
    REAL animated-GIF keyframe extraction with no change to the Spark
    plumbing. ``payload_col`` mirrors :func:`decode_media`."""
    fn = sampler or byte_frame_sampler

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                for idx, f in fn(payload, frame_bytes, every_n):
                    rows.append((int(doc_id), int(idx), f, len(f)))
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    if payload_col is None:
        src = attach_payload(docs, text_col).select("doc_id", "payload")
    else:
        src = docs.select("doc_id", F.col(payload_col).alias("payload"))
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
