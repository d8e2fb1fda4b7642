"""Pure-stdlib PNG/GIF/BMP/WAV codecs (media_codecs.py) - the round-7
gap-#3 closure: real pixel/sample decode with no PIL/ffmpeg in the
container (baseline JPEG is covered separately in test_jpeg_codec.py).

The encoder exists partly FOR these tests: filtering (encode) has no
sequential dependence and is written independently from reconstruction
(decode), so a pixel-exact round-trip through every filter type / color
type pair is a real check of the unfiltering math, not a tautology.
Reference vectors for the filter arithmetic come from the public PNG
spec (section 6, filter types 0-4) and were cross-checked against PIL
on a machine that has it; in-container the spec math is the oracle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from reactive_data_pipeline_spark import media_codecs as MC
from reactive_data_pipeline_spark import multimodal


def _pixels(h: int, w: int, c: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_every_filter_and_color_type(filter_type, channels):
    px = _pixels(13, 9, channels, seed=filter_type * 10 + channels)
    blob = MC.png_encode(px, filter_type=filter_type)
    w, h, c, got = MC.png_decode(blob)
    assert (w, h, c) == (9, 13, channels)
    np.testing.assert_array_equal(got, px)


def test_png_decode_known_vector_sub_filter():
    """Hand-computed spec vector: a 3px gray row stored with filter 1
    (Sub) as raw deltas (10, 20, 30) must reconstruct to the prefix
    sums (10, 30, 60) - pins the filter math to the spec, independent
    of the encoder."""
    row = b"\x01" + bytes([10, 20, 30])
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 0, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + MC._chunk(b"IHDR", ihdr)
        + MC._chunk(b"IDAT", zlib.compress(row))
        + MC._chunk(b"IEND", b"")
    )
    _, _, _, px = MC.png_decode(blob)
    assert px.reshape(-1).tolist() == [10, 30, 60]


def test_png_palette_expansion_with_and_without_trns():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx_rows = [b"\x00" + bytes([0, 1, 2]), b"\x00" + bytes([2, 2, 0])]
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    base = b"\x89PNG\r\n\x1a\n" + MC._chunk(b"IHDR", ihdr) + MC._chunk(b"PLTE", pal)
    idat = MC._chunk(b"IDAT", zlib.compress(b"".join(idx_rows)))
    end = MC._chunk(b"IEND", b"")

    w, h, c, px = MC.png_decode(base + idat + end)
    assert (w, h, c) == (3, 2, 3)
    assert px[0, 1].tolist() == [0, 255, 0] and px[1, 0].tolist() == [0, 0, 255]

    trns = MC._chunk(b"tRNS", bytes([128]))  # entry 0 translucent
    w, h, c, px = MC.png_decode(base + trns + idat + end)
    assert c == 4
    assert px[0, 0].tolist() == [255, 0, 0, 128]
    assert px[0, 1].tolist() == [0, 255, 0, 255]


def test_png_decode_rejects_unsupported_envelope_loudly():
    px = _pixels(4, 4, 3)
    blob = bytearray(MC.png_encode(px))
    # IHDR data starts at 16: width(4) height(4) depth color comp filt ilace
    depth_off, interlace_off = 16 + 8, 16 + 12

    bad = bytearray(blob)
    bad[depth_off] = 16
    with pytest.raises(ValueError, match="bit depth"):
        MC.png_decode(bytes(_fix_ihdr_crc(bad)))

    bad = bytearray(blob)
    bad[interlace_off] = 1
    with pytest.raises(ValueError, match="interlace"):
        MC.png_decode(bytes(_fix_ihdr_crc(bad)))

    with pytest.raises(ValueError, match="not a PNG"):
        MC.png_decode(b"plainly not a png")


def _fix_ihdr_crc(blob: bytearray) -> bytearray:
    crc = zlib.crc32(bytes(blob[12:29])) & 0xFFFFFFFF
    blob[29:33] = struct.pack(">I", crc)
    return blob


def test_png_resize_nearest_known_mapping():
    """4x4 -> 2x2 nearest with the pixel-center rule keeps sources
    (1,1), (1,3), (3,1), (3,3)."""
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = MC.png_resize_nearest(MC.png_encode(px), 2, 2)
    _, _, _, got = MC.png_decode(out)
    assert got.reshape(-1).tolist() == [5, 7, 13, 15]


def test_png_resize_upscale_replicates():
    px = np.array([[[10], [200]]], dtype=np.uint8)  # 1x2
    _, _, _, got = MC.png_decode(MC.png_resize_nearest(MC.png_encode(px), 4, 2))
    assert got.reshape(2, 4).tolist() == [[10, 10, 200, 200]] * 2


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_lzw_and_interlace(interlace):
    """Real LZW both ways: the encoder builds its own dictionary, so
    the round-trip exercises the decoder's table growth and code-size
    bumps, including on the 4-pass interlaced row order."""
    rng = np.random.RandomState(3)
    # 31 distinct colors over a 17x11 image -> plenty of LZW runs
    pal = rng.randint(0, 256, size=(31, 3), dtype=np.uint8)
    px = pal[rng.randint(0, 31, size=(17, 11))]
    w, h, c, got = MC.gif_decode(MC.gif_encode(px, interlace=interlace))
    assert (w, h, c) == (11, 17, 3)
    np.testing.assert_array_equal(got, px)


def test_gif_decode_transparency_and_code_growth():
    # enough distinct pixels to force the LZW table past 2^(min+1)
    rng = np.random.RandomState(9)
    px = np.repeat(
        rng.randint(0, 256, size=(64, 64, 1), dtype=np.uint8), 3, axis=2
    )  # gray ramp noise, <=256 distinct colors by construction
    blob = MC.gif_encode(px)
    w, h, c, got = MC.gif_decode(blob)
    assert (w, h, c) == (64, 64, 3)
    np.testing.assert_array_equal(got, px)

    # splice a GIF89a graphic-control extension marking index 0
    # transparent: decode must return 4 channels with alpha 0 exactly
    # where the palette's first (lowest-sorted) color sits
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    size_bits = (blob[10] & 0x07) + 1  # GCT follows the 13-byte header
    gct_end = 13 + 3 * (1 << size_bits)
    blob89 = b"GIF89a" + blob[6:gct_end] + gce + blob[gct_end:]
    w, h, c, got = MC.gif_decode(blob89)
    assert (c, got.shape) == (4, (64, 64, 4))
    lowest = px.reshape(-1, 3).min(axis=0)  # palette entry 0 (sorted)
    transparent_mask = (px == lowest).all(axis=2)
    np.testing.assert_array_equal(got[:, :, 3] == 0, transparent_mask)
    assert transparent_mask.any()  # the spliced flag actually fired


def test_gif_encode_rejects_more_than_256_colors():
    rng = np.random.RandomState(1)
    px = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    if len(np.unique(px.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError, match="256"):
            MC.gif_encode(px)


@pytest.mark.parametrize("channels", [3, 4])
def test_bmp_roundtrip_with_row_padding(channels):
    # width 3 with 3 channels -> 9-byte rows padded to 12: exercises
    # the 4-byte stride logic both ways
    px = _pixels(5, 3, channels, seed=channels)
    w, h, c, got = MC.bmp_decode(MC.bmp_encode(px))
    assert (w, h, c) == (3, 5, channels)
    np.testing.assert_array_equal(got, px)


def test_bmp_decode_rejects_compressed():
    blob = bytearray(MC.bmp_encode(_pixels(2, 2, 3)))
    blob[30] = 1  # BI_RLE8
    with pytest.raises(ValueError, match="unsupported BMP"):
        MC.bmp_decode(bytes(blob))


def test_decode_pixels_dispatch_and_unknown_rejection():
    px = _pixels(3, 3, 3)
    for blob in (MC.png_encode(px), MC.gif_encode(px), MC.bmp_encode(px)):
        w, h, c, got = MC.decode_pixels(blob)
        assert (w, h, c) == (3, 3, 3)
        np.testing.assert_array_equal(got, px)
    with pytest.raises(ValueError, match="no stdlib pixel decoder"):
        MC.decode_pixels(b"not any container")
    # corrupt JPEG sniffs to the JPEG decoder, which raises its own error
    with pytest.raises(ValueError, match="JPEG"):
        MC.decode_pixels(b"\xff\xd8\xff\xe0fake-jpeg")


def test_pixel_resizer_covers_gif_and_bmp():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)[:, :, None].repeat(3, axis=2)
    for blob in (MC.gif_encode(px), MC.bmp_encode(px)):
        out = multimodal.pixel_aware_resizer(blob, 2, 2)
        _, _, _, got = MC.png_decode(out)
        assert got[:, :, 0].reshape(-1).tolist() == [5, 7, 13, 15]


def test_wav_decode_walks_chunks_and_decodes_pcm():
    # 16-bit stereo PCM with a junk chunk BEFORE fmt (the fixed-offset
    # header probe mis-reads this shape; the chunk walk must not).
    frames = np.array([[100, -100], [2000, -2000], [32767, -32768]], dtype=np.int16)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    body = (
        b"junk" + struct.pack("<I", 3) + b"xyz\x00"  # word-aligned junk chunk
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", frames.nbytes) + frames.tobytes()
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    d = MC.wav_decode(blob)
    assert (d["channels"], d["sample_rate"], d["n_samples"]) == (2, 8000, 3)
    np.testing.assert_array_equal(d["samples"], frames)
    assert d["duration_sec"] == pytest.approx(3 / 8000)

    with pytest.raises(ValueError, match="PCM"):
        MC.wav_decode(
            b"RIFF" + struct.pack("<I", 28) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", 0)
        )


def test_stdlib_decoder_returns_decoded_not_header_fields():
    """Palette PNG: the header probe cannot know channels at all; the
    stdlib decoder reports the EXPANDED channel count - proof the
    fields come from real pixel decode."""
    pal = bytes([1, 2, 3] * 4)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + MC._chunk(b"IHDR", ihdr)
        + MC._chunk(b"PLTE", pal)
        + MC._chunk(b"IDAT", zlib.compress(b"\x00\x00\x01"))
        + MC._chunk(b"IEND", b"")
    )
    d = multimodal.stdlib_decoder(blob)
    assert (d["media_type"], d["width"], d["height"], d["channels"]) == (
        "image/png", 2, 1, 3,
    )
    assert multimodal.probe_media_header(blob)["channels"] is None

    # Unsupported envelope (16-bit depth): quiet fallback to the probe.
    deep = bytearray(MC.png_encode(_pixels(2, 2, 3)))
    deep[24] = 16
    d = multimodal.stdlib_decoder(bytes(_fix_ihdr_crc(deep)))
    assert d["media_type"] == "image/png" and d["channels"] is None


def test_best_decoder_is_stdlib_decoder_without_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed: best_decoder correctly prefers it")
    except ImportError:
        pass
    assert multimodal.best_decoder() is multimodal.stdlib_decoder


def test_decode_media_with_stdlib_decoder_through_spark(spark):
    """The real-pixel decoder through the full Arrow mapInPandas path:
    decoded (not header) channel counts land in the DataFrame."""
    rows = [
        (1, MC.png_encode(_pixels(5, 4, 4))),
        (2, b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
            + b"data" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"),
        (3, b"plain utf-8 text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r
        for r in multimodal.decode_media(
            docs, decoder=multimodal.stdlib_decoder, payload_col="payload"
        ).collect()
    }
    assert (got[1].media_type, got[1].width, got[1].height, got[1].channels) == (
        "image/png", 4, 5, 4,
    )
    assert (got[2].media_type, got[2].channels, got[2].sample_rate) == (
        "audio/wav", 1, 44100,
    )
    assert got[3].media_type == "text/plain" and all(
        got[i].ok for i in (1, 2, 3)
    )


def test_resize_media_png_aware_real_resize_through_spark(spark):
    """pixel_aware_resizer through resize_media over a MIXED corpus: PNG
    payloads come back as REAL resized PNGs (decode-verified through
    the Arrow path), non-PNG payloads keep the byte stand-in - one
    operator, total over both."""
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    docs = spark.createDataFrame(
        [(1, MC.png_encode(px)), (2, b"abc")], "doc_id long, payload binary"
    )
    got = {
        r.doc_id: r
        for r in multimodal.resize_media(
            docs, 2, 2, resizer=multimodal.pixel_aware_resizer,
            payload_col="payload",
        ).collect()
    }
    _, _, _, resized = MC.png_decode(bytes(got[1].payload))
    assert resized.reshape(-1).tolist() == [5, 7, 13, 15]
    assert bytes(got[2].payload) == b"abc\x00"  # stand-in pad to 2*2
    assert (got[1].width, got[1].height) == (2, 2)


# ---------------------------------------------------------------------------
# property-based: codecs are total over hostile input (corrupt payloads
# are DATA at corpus scale - exactly one failure mode, no bombs)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

FAST = settings(max_examples=150, deadline=None)  # pure Python, no Spark


@FAST
@given(
    st.sampled_from(
        [b"", b"\x89PNG\r\n\x1a\n", b"GIF87a", b"GIF89a", b"BM", b"\xff\xd8"]
    ),
    st.binary(max_size=300),
)
def test_decode_pixels_total_over_garbage(prefix, junk):
    """Any sniffable prefix + random bytes either decodes or raises
    ValueError - never another exception type, never a hang, never a
    giant allocation (MAX_PIXELS guards)."""
    try:
        w, h, c, px = MC.decode_pixels(prefix + junk)
        assert px.shape == (h, w, c)
        assert w * h <= MC.MAX_PIXELS
    except ValueError:
        pass


@FAST
@given(st.binary(max_size=300))
def test_stdlib_decoder_total_over_garbage(junk):
    """The multimodal decoder slot never leaks a parse exception: every
    input maps to the probe dict shape."""
    d = multimodal.stdlib_decoder(junk)
    assert set(d) >= {"media_type", "width", "height", "channels", "sample_rate"}


def test_png_rejects_dimension_bomb_before_allocating():
    """A 74-byte payload claiming 65535x65535 must be refused by the
    MAX_PIXELS guard (not by exhausting memory)."""
    ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 0, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + MC._chunk(b"IHDR", ihdr)
        + MC._chunk(b"IDAT", zlib.compress(b"\x00"))
        + MC._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        MC.png_decode(blob)


def test_png_bounded_inflate_rejects_zlib_bomb():
    """An IDAT that inflates to more than the header promises is cut
    off at the promised size and refused - the decompressobj never
    materializes the excess."""
    px = _pixels(2, 2, 1)
    good = MC.png_encode(px)
    # re-build with an IDAT that inflates to 100x the promised size
    bomb = zlib.compress(b"\x00" * ((2 * 1 + 1) * 2 * 100))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + MC._chunk(b"IHDR", ihdr)
        + MC._chunk(b"IDAT", bomb)
        + MC._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        MC.png_decode(blob)
    MC.png_decode(good)  # the guard does not break valid payloads


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 12), st.integers(1, 12),
    st.sampled_from([1, 2, 3, 4]), st.sampled_from([0, 1, 2, 3, 4]),
    st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_property(h, w, c, filter_type, seed):
    px = np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)
    w2, h2, c2, got = MC.png_decode(MC.png_encode(px, filter_type=filter_type))
    assert (w2, h2, c2) == (w, h, c)
    np.testing.assert_array_equal(got, px)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.booleans(),
       st.integers(0, 2**32 - 1))
def test_gif_roundtrip_property(h, w, interlace, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (min(h * w, 256), 3), dtype=np.uint8)
    px = pal[rng.randint(0, len(pal), (h, w))]
    w2, h2, c2, got = MC.gif_decode(MC.gif_encode(px, interlace=interlace))
    assert (w2, h2, c2) == (w, h, 3)
    np.testing.assert_array_equal(got, px)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.sampled_from([3, 4]),
       st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_property(h, w, c, seed):
    px = np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)
    w2, h2, c2, got = MC.bmp_decode(MC.bmp_encode(px))
    assert (w2, h2, c2) == (w, h, c)
    np.testing.assert_array_equal(got, px)


# ---------------------------------------------------------------------------
# animated GIF: multi-frame decode with disposal composition
# ---------------------------------------------------------------------------


def _animated_gif(frames, sw, sh, disposals=None, transparents=None,
                  offsets=None) -> bytes:
    """Hand-assemble a multi-frame GIF89a: shared global palette derived
    from all frames, one image block per frame with optional per-frame
    GCE (disposal + transparent index), placement offsets, real LZW."""
    all_px = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors = np.unique(all_px, axis=0)
    assert len(colors) <= 256
    size_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    pal = np.zeros((2**size_bits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (size_bits - 1), 0, 0]) + pal.tobytes()
    min_code = max(2, size_bits)
    for k, f in enumerate(frames):
        disp = (disposals or [0] * len(frames))[k]
        trans = (transparents or [None] * len(frames))[k]
        left, top = (offsets or [(0, 0)] * len(frames))[k]
        if disp or trans is not None:
            packed = (disp << 2) | (1 if trans is not None else 0)
            out += bytes([0x21, 0xF9, 4, packed, 0, 0, trans or 0, 0])
        h, w, _ = f.shape
        out += b"\x2c" + struct.pack("<HHHH", left, top, w, h) + bytes([0])
        idx = bytes(lut[tuple(p)] for p in f.reshape(-1, 3))
        lzw = MC._lzw_encode(idx, min_code)
        out += bytes([min_code])
        for o in range(0, len(lzw), 255):
            chunk = lzw[o : o + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _solid(h, w, rgb):
    return np.tile(np.array(rgb, np.uint8), (h, w, 1))


def test_gif_frames_composition_leave_and_offsets():
    """Frame 2 paints a 2x2 patch at (1,1) over frame 1's canvas
    (disposal 0 = leave): the composited second frame shows the patch
    on top, everything else unchanged."""
    f1 = _solid(4, 4, (10, 20, 30))
    f2 = _solid(2, 2, (200, 0, 0))
    blob = _animated_gif([f1, f2], 4, 4, offsets=[(0, 0), (1, 1)])
    sw, sh, frames = MC.gif_decode_frames(blob)
    assert (sw, sh, len(frames)) == (4, 4, 2)
    np.testing.assert_array_equal(frames[0][:, :, :3], f1)
    assert (frames[0][:, :, 3] == 255).all()
    expect = f1.copy()
    expect[1:3, 1:3] = (200, 0, 0)
    np.testing.assert_array_equal(frames[1][:, :, :3], expect)


def test_gif_frames_disposal_background_clears_region():
    """Disposal 2 on frame 1: after it is emitted, its region clears to
    transparent, so frame 2 (a small patch) composites onto a mostly
    empty canvas."""
    f1 = _solid(4, 4, (10, 20, 30))
    f2 = _solid(1, 1, (0, 200, 0))
    blob = _animated_gif([f1, f2], 4, 4, disposals=[2, 0],
                         offsets=[(0, 0), (3, 3)])
    _, _, frames = MC.gif_decode_frames(blob)
    assert (frames[0][:, :, 3] == 255).all()
    # frame 2's canvas: only the (3,3) pixel is painted
    assert frames[1][3, 3].tolist() == [0, 200, 0, 255]
    assert (frames[1][:, :, 3] == 255).sum() == 1


def test_gif_frames_disposal_previous_restores():
    """Disposal 3 on frame 2: frame 3 composites against the canvas as
    it was BEFORE frame 2 painted."""
    f1 = _solid(3, 3, (1, 2, 3))
    f2 = _solid(3, 3, (100, 100, 100))
    f3 = _solid(1, 1, (200, 0, 200))
    blob = _animated_gif([f1, f2, f3], 3, 3, disposals=[0, 3, 0])
    _, _, frames = MC.gif_decode_frames(blob)
    np.testing.assert_array_equal(frames[1][:, :, :3], f2)
    expect = f1.copy()
    expect[0, 0] = (200, 0, 200)
    np.testing.assert_array_equal(frames[2][:, :, :3], expect)


def test_gif_frames_transparent_index_skips_pixels():
    """A transparent pixel in frame 2 leaves frame 1's pixel visible -
    the delta-frame encoding every real animated GIF uses."""
    f1 = _solid(2, 2, (9, 9, 9))
    f2 = np.array([[[9, 9, 9], [50, 60, 70]],
                   [[50, 60, 70], [9, 9, 9]]], np.uint8)
    # (9,9,9) sorts before (50,60,70) -> palette index 0; mark it
    # transparent in frame 2 so those pixels show through
    blob = _animated_gif([f1, f2], 2, 2, transparents=[None, 0])
    _, _, frames = MC.gif_decode_frames(blob)
    np.testing.assert_array_equal(
        frames[1][:, :, :3],
        np.array([[[9, 9, 9], [50, 60, 70]],
                  [[50, 60, 70], [9, 9, 9]]], np.uint8),
    )
    assert (frames[1][:, :, 3] == 255).all()  # underlying pixels remain


def test_gif_aware_frame_sampler_through_spark(spark):
    """Real GIF keyframes through the sample_frames Arrow path: 4-frame
    GIF sampled every 2 -> frames 0 and 2 as PNGs; text payloads keep
    the byte stand-in in the same operator run."""
    frames = [_solid(3, 3, (i * 40, 0, 0)) for i in range(4)]
    blob = _animated_gif(frames, 3, 3)
    docs = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"0123456789abcdef" * 12))],
        "doc_id long, payload binary",
    )
    out = multimodal.sample_frames(
        docs, frame_bytes=64, every_n=2,
        sampler=multimodal.gif_aware_frame_sampler, payload_col="payload",
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.frame_idx for r in by_doc[1]] == [0, 2]
    for r in by_doc[1]:
        _, _, _, px = MC.png_decode(bytes(r.frame_payload))
        np.testing.assert_array_equal(px[:, :, 0], np.full((3, 3), r.frame_idx * 40))
    assert [r.frame_idx for r in by_doc[2]] == [0, 2]  # byte stand-in path
    assert len(by_doc[2][0].frame_payload) == 64


def test_gif_cumulative_frame_pixel_cap(monkeypatch):
    """Round-9 advice: per-frame caps alone let an animated payload
    declare MANY frames and drive multi-GB growth. The decoder must
    bound the CUMULATIVE decoded grid pixels across blocks."""
    monkeypatch.setattr(MC, "MAX_PIXELS", 100)
    f = _solid(4, 4, (10, 20, 30))
    blob = _animated_gif([f] * 7, 4, 4)  # 7 * 16 = 112 > 100
    with pytest.raises(ValueError, match="cumulative frame pixels"):
        MC.gif_decode_frames(blob)
    with pytest.raises(ValueError, match="cumulative frame pixels"):
        MC.gif_decode(blob)  # the cap sits in the shared block walk
    # at the real cap the same payload is far below threshold
    monkeypatch.setattr(MC, "MAX_PIXELS", 1 << 26)
    _, _, frames = MC.gif_decode_frames(blob)
    assert len(frames) == 7


def test_gif_composited_canvas_volume_cap(monkeypatch):
    """Tiny 1x1 blocks on a big screen pass the grid-pixel cap, but
    every EMITTED frame is a full-canvas RGBA copy - frames x screen
    must also be bounded (first-frame decode stays fine)."""
    monkeypatch.setattr(MC, "MAX_PIXELS", 100)
    dot = _solid(1, 1, (5, 5, 5))
    blob = _animated_gif([dot] * 3, 8, 8)  # grids: 3 px; canvas: 3*64 = 192 > 100
    with pytest.raises(ValueError, match="composited frame volume"):
        MC.gif_decode_frames(blob)
    w, h, c, px = MC.gif_decode(blob)  # single-frame path unaffected
    assert (w, h) == (1, 1)


def test_gif_sampler_normalizes_memoryerror(monkeypatch):
    """gif_aware_frame_sampler must degrade a hostile payload that
    still manages a MemoryError to the byte stand-in (round-9 advice:
    ValueError-only handling let MemoryError kill the executor task)."""
    def boom(_b):
        raise MemoryError("hostile payload")

    monkeypatch.setattr(MC, "gif_decode_frames", boom)
    blob = _animated_gif([_solid(2, 2, (1, 2, 3))], 2, 2)
    got = multimodal.gif_aware_frame_sampler(blob, frame_bytes=8, every_n=1)
    expect = multimodal.byte_frame_sampler(blob, 8, 1)
    assert got == expect


def test_gif_encode_animation_roundtrip_disposals_and_transparency():
    """Round-11: gif_encode_animation (the encode half of
    gif_decode_frames, used by the oracle-checked mm_frame_sample
    synthesis) round-trips through the decoder with disposal 0/2/3 and
    a transparent index, against hand-computed composited expectations."""
    gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    g0 = np.arange(16, dtype=np.uint8).reshape(4, 4)
    g1 = (np.arange(8, dtype=np.uint8) + 100).reshape(2, 4)
    blob = MC.gif_encode_animation(
        [
            {"grid": g0},
            {"grid": g1},  # top half repaint, disposal 0 (leave)
            {"grid": np.full((2, 2), 200, np.uint8), "left": 1, "top": 1,
             "disposal": 2},
            {"grid": np.full((2, 2), 222, np.uint8), "left": 2, "top": 2,
             "disposal": 3},
            {"grid": np.full((1, 1), 50, np.uint8), "left": 0, "top": 3},
        ],
        4, 4, gray,
    )
    sw, sh, frames = MC.gif_decode_frames(blob)
    assert (sw, sh, len(frames)) == (4, 4, 5)
    assert (frames[0][:, :, 0] == g0).all() and (frames[0][:, :, 3] == 255).all()
    exp1 = g0.copy()
    exp1[:2] = g1
    assert (frames[1][:, :, 0] == exp1).all()
    exp2 = exp1.copy()
    exp2[1:3, 1:3] = 200
    assert (frames[2][:, :, 0] == exp2).all()
    # disposal 2 cleared frame 2's region to transparent...
    assert (frames[3][1:3, 1:3, 3] == np.array([[0, 0], [0, 255]])).all()
    # ...and frame 3 painted its own patch at (2,2)
    assert (frames[3][2:4, 2:4, 0] == 222).all()
    # disposal 3 restored the pre-frame-3 canvas before frame 4
    assert frames[4][2, 2, 3] == 0 and frames[4][3, 3, 0] == exp1[3, 3]
    assert frames[4][3, 0, 0] == 50
    # transparency: painted transparent-index pixels keep the canvas
    blob2 = MC.gif_encode_animation(
        [{"grid": g0}, {"grid": np.array([[5, 7], [7, 5]], np.uint8),
                        "transparent": 7}],
        4, 4, gray,
    )
    _, _, fr2 = MC.gif_decode_frames(blob2)
    assert fr2[1][0, 0, 0] == 5 and fr2[1][0, 1, 0] == g0[0, 1]
