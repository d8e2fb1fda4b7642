"""Text-function edge cases + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reactive_data_pipeline_spark import multimodal
from reactive_data_pipeline_spark.functions import text as TX


def _one(spark, text, expr):
    return spark.range(1).select(expr(F.lit(text)).alias("v")).collect()[0].v


def test_word_count_and_normalize(spark):
    assert _one(spark, "  Hello   WORLD  ", TX.word_count) == 2
    assert _one(spark, "  Hello   WORLD  ", TX.normalize_ws) == "hello world"


def test_token_count_bpe_ish(spark):
    assert _one(spark, "abc 123 a-b", TX.token_count) == 5  # abc,123,a,-,b


def test_lang_id_priority_and_und(spark):
    assert _one(spark, "the cat and the hat", TX.lang_id) == "en"
    assert _one(spark, "el gato que salta y corre", TX.lang_id) == "es"
    assert _one(spark, "zzz qqq www", TX.lang_id) == "und"
    # 'la de un' hits both es and fr; es wins by fixed priority
    assert _one(spark, "la de un", TX.lang_id) == "es"


def test_rolling_fingerprint_matches_python(spark):
    text = "Hello  World"
    norm = "hello world"
    expected = 0
    for ch in norm:
        expected = (expected * 31 + ord(ch)) % TX.FINGERPRINT_MOD
    assert _one(spark, text, TX.fingerprint_rolling) == expected


def test_multimodal_features_deterministic(spark):
    docs = spark.createDataFrame(
        [(7, "abcd", "en", "s", 4)], "doc_id long, text string, lang string, source string, n_chars long"
    )
    row = multimodal.extract_features(docs).collect()[0]
    payload = b"abcd"
    assert row.doc_id == 7
    assert row.n_bytes == 4
    assert row.byte_sum_mod == sum(payload) % 997
    assert row.head_hex == payload[:4].hex()


def _png(w: int, h: int) -> bytes:
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00")


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def _bmp(w: int, h: int) -> bytes:
    return (b"BM" + b"\x00" * 16 + w.to_bytes(4, "little")
            + h.to_bytes(4, "little") + b"\x00" * 4)


def _jpeg(w: int, h: int) -> bytes:
    sof0 = (b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03\x01\x11\x00")
    return b"\xff\xd8" + b"\xff\xe0" + (4).to_bytes(2, "big") + b"JF" + sof0


def _wav(channels: int, rate: int) -> bytes:
    return (b"RIFF" + b"\x00" * 4 + b"WAVE" + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
            + rate.to_bytes(4, "little") + b"\x00" * 8)


def test_decode_media_parses_real_container_headers(spark):
    """The stdlib header probe decodes constructed PNG/GIF/BMP/JPEG/WAV
    payloads through the full Arrow mapInPandas path."""
    rows = [
        (1, _png(640, 480)),
        (2, _gif(320, 200)),
        (3, _bmp(800, 600)),
        (4, _jpeg(1024, 768)),
        (5, _wav(2, 44100)),
        (6, b"plain utf-8 text"),
        (7, b"\xff\xfe\x00\x01garbage"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in multimodal.decode_media(docs, payload_col="payload").collect()}
    assert (got[1].media_type, got[1].width, got[1].height) == ("image/png", 640, 480)
    assert (got[2].media_type, got[2].width, got[2].height) == ("image/gif", 320, 200)
    assert (got[3].media_type, got[3].width, got[3].height) == ("image/bmp", 800, 600)
    assert (got[4].media_type, got[4].width, got[4].height) == ("image/jpeg", 1024, 768)
    assert (got[5].media_type, got[5].channels, got[5].sample_rate) == ("audio/wav", 2, 44100)
    assert got[6].media_type == "text/plain"
    assert got[7].media_type == "application/octet-stream"
    assert all(r.ok for r in got.values())


def test_pil_decoder_without_pil_matches_header_probe():
    """pil_decoder degrades to the header probe byte-for-byte when PIL
    is not importable (this container), and best_decoder() picks the
    strongest available implementation."""
    payloads = [_png(640, 480), _wav(2, 44100), b"plain utf-8 text"]
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        assert multimodal.best_decoder() is multimodal.pil_decoder
    else:
        # round-8: the no-PIL best is the stdlib PIXEL decoder (real PNG
        # pixel / WAV chunk-walk decode), no longer just the header probe
        assert multimodal.best_decoder() is multimodal.stdlib_decoder
        for b in payloads:
            assert multimodal.pil_decoder(b) == multimodal.probe_media_header(b)
            # on header-probe-shaped canonical payloads the stdlib
            # decoder agrees on every field the probe can fill
            probe = multimodal.probe_media_header(b)
            full = multimodal.stdlib_decoder(b)
            for k, v in probe.items():
                if v is not None:
                    assert full[k] == v


def test_decode_media_pil_real_pixels(spark):
    """When PIL exists, pil_decoder reads verified dimensions/channels
    from the DECODED image (not the container header) through the full
    Arrow path. Skips cleanly where PIL is absent."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, "PNG")
    docs = spark.createDataFrame([(1, buf.getvalue())], "doc_id long, payload binary")
    got = multimodal.decode_media(
        docs, decoder=multimodal.pil_decoder, payload_col="payload"
    ).collect()[0]
    assert (got.media_type, got.width, got.height, got.channels) == ("image/png", 12, 7, 3)
    assert got.ok


def test_decode_media_pluggable_decoder_and_error_capture(spark):
    """A custom decoder plugs in; its exceptions become (ok=False, error)
    rows instead of failing the job."""

    def decoder(b: bytes) -> dict:
        if b.startswith(b"BAD"):
            raise ValueError("corrupt payload")
        return {"media_type": "custom/x", "width": len(b), "height": 1}

    docs = spark.createDataFrame(
        [(1, b"hello"), (2, b"BAD...")], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in
           multimodal.decode_media(docs, decoder=decoder, payload_col="payload").collect()}
    assert got[1].ok and got[1].media_type == "custom/x" and got[1].width == 5
    assert not got[2].ok and "corrupt payload" in got[2].error
    assert got[2].media_type is None


def test_resize_media_pads_and_truncates(spark):
    from reactive_data_pipeline_spark import multimodal

    docs = spark.createDataFrame(
        [(1, "x" * 300), (2, "y")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in multimodal.resize_media(docs, 16, 16).collect()}
    assert all(len(r.payload) == 256 and r.width == 16 for r in rows.values())
    assert bytes(rows[1].payload) == b"x" * 256  # truncated
    assert bytes(rows[2].payload) == b"y" + b"\0" * 255  # zero-padded


def test_sample_frames_one_to_many(spark):
    from reactive_data_pipeline_spark import multimodal

    docs = spark.createDataFrame([(7, "a" * 64 * 9)], "doc_id long, text string")
    rows = multimodal.sample_frames(docs, frame_bytes=64, every_n=4).collect()
    assert [(r.doc_id, r.frame_idx, r.n_bytes) for r in rows] == [
        (7, 0, 64), (7, 4, 64), (7, 8, 64),
    ]


def test_chunking_windows_and_overlap(spark):
    from reactive_data_pipeline_spark.functions.chunking import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    docs = spark.createDataFrame([(1, text), (2, "solo")], "doc_id long, text string")
    rows = {(r.doc_id, r.chunk_idx): r for r in chunk_documents(docs, 4, 2).collect()}
    # stride 2: starts 0,2,4,6 while start <= len-overlap -> ceil((10-2)/2)=4 chunks
    assert sorted(k for k in rows if k[0] == 1) == [(1, i) for i in range(4)]
    assert rows[(1, 0)].chunk_text == "w0 w1 w2 w3"
    assert rows[(1, 1)].chunk_text == "w2 w3 w4 w5"  # 2-token overlap
    assert rows[(1, 3)].chunk_text == "w6 w7 w8 w9"
    assert rows[(2, 0)].chunk_text == "solo" and rows[(2, 0)].n_tokens == 1


def test_pack_bins_running_sum_rule(spark):
    from reactive_data_pipeline_spark.functions.chunking import pack_bins

    chunks = spark.createDataFrame(
        [(1, 0, 60), (1, 1, 60), (2, 0, 60), (2, 1, 60)],
        "doc_id long, chunk_idx long, n_tokens long",
    )
    # global opt-in (num_buckets=None): one corpus-wide running sum -
    # running sums before: 0,60,120,180 -> bins 0,0,0,1
    got = {
        (r.doc_id, r.chunk_idx): r.bin_id
        for r in pack_bins(chunks, 128, num_buckets=None).collect()
    }
    assert got == {(1, 0): 0, (1, 1): 0, (2, 0): 0, (2, 1): 1}
    # default bucketed form: doc 1 -> bucket 1, doc 2 -> bucket 2 (mod 32);
    # each bucket packs independently (before-sums 0,60 -> local bin 0),
    # composite bin_id = local_bin * 32 + bucket
    got = {(r.doc_id, r.chunk_idx): r.bin_id for r in pack_bins(chunks, 128).collect()}
    assert got == {(1, 0): 1, (1, 1): 1, (2, 0): 2, (2, 1): 2}


def test_pack_bins_custom_bucket_expr(spark):
    """The production bucket_col override (e.g. xxhash64 residue for
    string/skewed ids) must drive both the partitioning and the
    composite id, with the same within-bucket running-sum rule."""
    from pyspark.sql import functions as F

    from reactive_data_pipeline_spark.functions.chunking import pack_bins

    rows = [(d, i, 40) for d in range(40) for i in range(2)]
    chunks = spark.createDataFrame(rows, "doc_id long, chunk_idx long, n_tokens long")
    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(16))
    packed = pack_bins(
        chunks, bin_tokens=100, num_buckets=16, bucket_col=bucket
    ).collect()
    # recompute the expected bucket Spark-side and verify the rule
    bmap = {
        r.doc_id: r.b
        for r in chunks.select("doc_id", bucket.alias("b")).distinct().collect()
    }
    by_bucket = {}
    for r in sorted(packed, key=lambda r: (r.doc_id, r.chunk_idx)):
        b = bmap[r.doc_id]
        run = by_bucket.get(b, 0)
        assert r.bin_id == (run // 100) * 16 + b, (r, b, run)
        by_bucket[b] = run + r.n_tokens


def test_pack_bins_bucketed_matches_global_rule_per_bucket(spark):
    """The bucketed default's local running-sum rule is exactly the
    global rule applied to each residue class; bin ids never collide
    across buckets."""
    from reactive_data_pipeline_spark.functions.chunking import pack_bins

    rows = [(d, i, 30 + 7 * ((d + i) % 5)) for d in range(70) for i in range(3)]
    chunks = spark.createDataFrame(rows, "doc_id long, chunk_idx long, n_tokens long")
    packed = pack_bins(chunks, bin_tokens=100, num_buckets=8).collect()
    # reconstruct per-bucket expectation from the opt-in global rule
    for b in range(8):
        sub = [r for r in sorted(rows) if r[0] % 8 == b]
        run, expect = 0, {}
        for d, i, n in sub:
            expect[(d, i)] = (run // 100) * 8 + b
            run += n
        got = {(r.doc_id, r.chunk_idx): r.bin_id for r in packed if r.doc_id % 8 == b}
        assert got == expect


def test_tokens_direct_split_identity(spark):
    """tokens() is one split on \\s+; it must stay token-for-token equal
    to the old normalize_ws + split(" ") form, INCLUDING the ""-sentinel
    edges: trim() strips only ASCII spaces, so leading/trailing tab or
    newline survives into an empty first/last token either way."""
    cases = [
        "plain words here",
        "  Hello   WORLD  ",
        "tab\tseparated\twords",
        "\tleading tab",
        "trailing newline\n",
        "mixed \t\n whitespace nbsp",  # NBSP is NOT \s in Java regex
        "",
        "   ",
        "one",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    old = F.split(F.regexp_replace(F.lower(F.trim(F.col("t"))), r"\s+", " "), " ")
    mismatch = df.select(
        (TX.tokens("t") == old).alias("eq"), "t"
    ).filter(~F.col("eq"))
    assert mismatch.count() == 0, mismatch.collect()


def test_token_count_decomposition_matches_pattern(spark):
    """token_count()'s decomposed form (two single-class regex counts +
    translate-length for lone symbols) must equal
    regexp_count(TOKEN_PATTERN) for ANY input: the alternation's
    branches partition its matches, so the identity is structural, not
    data-dependent. Randomized over a unicode-ish alphabet plus the
    hand-picked edges (empty, all-ws, unicode ws, emoji, digit/letter
    boundaries)."""
    import random

    rng = random.Random(20260815)
    alphabet = list("abzAZ019 \t\n\x0b\f\r.,!?-_# é中") + ["\U0001f600"]
    cases = ["", "   ", "\t\n", "a1!", "a b", "café 123", "\U0001f600x9"]
    cases += ["".join(rng.choices(alphabet, k=rng.randrange(0, 40))) for _ in range(300)]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    ref = F.regexp_count(F.col("t"), F.lit(TX.TOKEN_PATTERN))
    bad = df.select("t", ref.alias("a"), TX.token_count("t").alias("b")).filter(
        F.col("a") != F.col("b")
    )
    rows = bad.collect()
    assert not rows, [(r.t, r.a, r.b) for r in rows[:5]]
