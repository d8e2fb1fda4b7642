"""Baseline JPEG codec (jpeg.py): the last PIL-gated format.

JPEG is lossy, so encoder->decoder round-trips assert tolerances - and
tolerance tests alone could hide a convention error shared by both
halves (a flipped zigzag agrees with itself). The decoder is therefore
ALSO pinned by hand-assembled bitstreams built directly from the
spec's Annex K Huffman tables and hand-chosen quantizers, where the
expected pixels are derivable on paper (DC-only blocks decode to a
constant: IDCT of a lone DC coefficient d*q is d*q/8 per sample).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from reactive_data_pipeline_spark import jpeg as J
from reactive_data_pipeline_spark import media_codecs as MC
from reactive_data_pipeline_spark import multimodal


# ---------------------------------------------------------------------------
# hand-assembled bitstreams (encoder-independent decoder pins)
# ---------------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _gray_headers(w: int, h: int, q0: int, dri: int = 0) -> bytes:
    """SOI + all-q0 quant table + SOF0 gray + Annex K luma Huffman
    tables (+ optional DRI) + SOS, ready for a hand-packed scan."""
    qzz = bytes([q0] * 64)
    out = b"\xff\xd8" + _seg(0xDB, bytes([0]) + qzz)
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS))
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return out


class _Bits:
    def __init__(self):
        self.s = ""

    def put(self, code: int, length: int):
        self.s += format(code, f"0{length}b") if length else ""

    def bytes(self) -> bytes:
        s = self.s + "1" * (-len(self.s) % 8)
        raw = bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))
        return raw.replace(b"\xff", b"\xff\x00")  # byte stuffing


def _dc_codes():
    return J._huffman_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)


def _ac_codes():
    return J._huffman_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)


def _put_dc_only_block(bits: _Bits, diff: int):
    """DC diff + EOB, encoded with the standard tables by hand."""
    size = abs(diff).bit_length()
    ln, code = _dc_codes()[size]
    bits.put(code, ln)
    if size:
        bits.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    ln, code = _ac_codes()[0x00]  # EOB
    bits.put(code, ln)


def test_decode_hand_assembled_dc_only_block():
    """One 8x8 gray block, quantizer 16, DC diff +5: the decoder must
    reconstruct q*dc/8 + 128 = 16*5/8 + 128 = 138 at every pixel -
    derivable on paper, no encoder involved."""
    bits = _Bits()
    _put_dc_only_block(bits, 5)
    blob = _gray_headers(8, 8, 16) + bits.bytes() + b"\xff\xd9"
    w, h, c, px = J.jpeg_decode(blob)
    assert (w, h, c) == (8, 8, 1)
    np.testing.assert_array_equal(px, np.full((8, 8, 1), 138, np.uint8))


def test_decode_hand_assembled_dc_prediction_chain():
    """Two MCUs: DC is differentially coded, so diffs (+5, -3) decode
    to absolute DC 5 then 2 -> pixels 138 then 132 (16*2/8+128)."""
    bits = _Bits()
    _put_dc_only_block(bits, 5)
    _put_dc_only_block(bits, -3)
    blob = _gray_headers(16, 8, 16) + bits.bytes() + b"\xff\xd9"
    w, h, c, px = J.jpeg_decode(blob)
    assert (w, h) == (16, 8)
    np.testing.assert_array_equal(px[:, :8, 0], np.full((8, 8), 138))
    np.testing.assert_array_equal(px[:, 8:, 0], np.full((8, 8), 132))


def test_decode_hand_assembled_restart_resets_dc_predictor():
    """DRI=1 with an RST0 between the two MCUs: the second block's
    diff +5 is against a RESET predictor (0), so both decode to 138.
    Without the reset it would read 16*10/8+128 = 148."""
    b1, b2 = _Bits(), _Bits()
    _put_dc_only_block(b1, 5)
    _put_dc_only_block(b2, 5)
    blob = (
        _gray_headers(16, 8, 16, dri=1)
        + b1.bytes() + b"\xff\xd0" + b2.bytes() + b"\xff\xd9"
    )
    w, h, c, px = J.jpeg_decode(blob)
    assert set(np.unique(px)) == {138}


def test_decode_hand_assembled_single_ac_coefficient():
    """DC 0 + one AC at zigzag position 1 (natural (0,1) - horizontal
    frequency 1) with run 0, value +4, quantizer 16: per T.81 A.3.3 the
    block is f(y,x) = (1/4)*C(0)*C(1)*64*cos((2x+1)pi/16)
    = (64/(2*sqrt(2)*2)) * cos((2x+1)pi/16), constant down columns -
    computed here from the spec formula, independently of the codec's
    own IDCT helper."""
    bits = _Bits()
    ln, code = _dc_codes()[0]
    bits.put(code, ln)  # DC diff 0
    s = 3  # |4| -> 3 bits
    ln, code = _ac_codes()[(0 << 4) | s]
    bits.put(code, ln)
    bits.put(4, s)
    ln, code = _ac_codes()[0x00]
    bits.put(code, ln)
    blob = _gray_headers(8, 8, 16) + bits.bytes() + b"\xff\xd9"
    _, _, _, px = J.jpeg_decode(blob)
    xs = np.arange(8)
    amp = 64.0 * 0.25 * (1.0 / np.sqrt(2.0))  # (1/4)*C(0)*C(1)*coeff
    col = amp * np.cos((2 * xs + 1) * np.pi / 16.0) + 128.0
    expected = np.clip(np.round(np.tile(col, (8, 1))), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(px[:, :, 0], expected)


# ---------------------------------------------------------------------------
# encoder round-trips (tolerance: JPEG is lossy)
# ---------------------------------------------------------------------------


def test_roundtrip_grayscale_gradient_tight():
    y, x = np.mgrid[0:24, 0:40]
    px = ((x * 3 + y * 2) % 256).astype(np.uint8)
    w, h, c, got = J.jpeg_decode(J.jpeg_encode(px, quality=95))
    assert (w, h, c) == (40, 24, 1)
    err = np.abs(got[:, :, 0].astype(int) - px.astype(int))
    assert err.max() <= 12 and err.mean() < 2.5


def test_roundtrip_rgb_smooth():
    y, x = np.mgrid[0:16, 0:16]
    px = np.stack(
        [(x * 8).astype(np.uint8), (y * 8).astype(np.uint8),
         ((x + y) * 4).astype(np.uint8)], axis=2
    )
    w, h, c, got = J.jpeg_decode(J.jpeg_encode(px, quality=95))
    assert (w, h, c) == (16, 16, 3)
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 14 and err.mean() < 3.0


def test_roundtrip_rgb_420_subsampled():
    """4:2:0 exercises the decoder's multi-block MCU loop (4 luma
    blocks per MCU) and the chroma upsampler; smooth chroma keeps the
    box-average/replicate error small."""
    y, x = np.mgrid[0:20, 0:28]
    px = np.stack(
        [(x * 6).astype(np.uint8), (y * 6).astype(np.uint8),
         np.full_like(x, 90, dtype=np.uint8)], axis=2
    )
    w, h, c, got = J.jpeg_decode(J.jpeg_encode(px, quality=95, subsampling="420"))
    assert (w, h, c) == (28, 20, 3)
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 20 and err.mean() < 4.0


def test_roundtrip_solid_colors_exact_dims_odd_size():
    """Non-multiple-of-8 dims exercise edge replication + crop; solid
    blocks are DC-only, so reconstruction is near-exact."""
    px = np.full((13, 21, 3), [200, 64, 130], dtype=np.uint8)
    w, h, c, got = J.jpeg_decode(J.jpeg_encode(px, quality=90))
    assert (w, h, c) == (21, 13, 3)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 4


def test_envelope_rejections():
    with pytest.raises(ValueError, match="not a JPEG"):
        J.jpeg_decode(b"nope")
    # progressive: flip the encoder's SOF0 marker to SOF2
    blob = bytearray(J.jpeg_encode(np.zeros((8, 8), np.uint8)))
    i = bytes(blob).index(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        J.jpeg_decode(bytes(blob))


# ---------------------------------------------------------------------------
# integration with the dispatch + multimodal layers
# ---------------------------------------------------------------------------


def test_decode_pixels_dispatches_jpeg():
    px = np.full((8, 8, 3), [10, 200, 90], dtype=np.uint8)
    w, h, c, got = MC.decode_pixels(J.jpeg_encode(px, quality=95))
    assert (w, h, c) == (8, 8, 3)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 4


def test_stdlib_decoder_fills_jpeg_channels():
    """The header probe gets JPEG dimensions from the SOF marker but
    never a channel count; the stdlib decoder now decodes the pixels
    and reports it."""
    blob = J.jpeg_encode(np.zeros((9, 7), np.uint8), quality=85)
    probe = multimodal.probe_media_header(blob)
    assert (probe["media_type"], probe["channels"]) == ("image/jpeg", None)
    d = multimodal.stdlib_decoder(blob)
    assert (d["media_type"], d["width"], d["height"], d["channels"]) == (
        "image/jpeg", 7, 9, 1,
    )


def test_pixel_resizer_covers_jpeg():
    px = np.full((8, 8, 3), [10, 200, 90], dtype=np.uint8)
    out = multimodal.pixel_aware_resizer(J.jpeg_encode(px, quality=95), 2, 2)
    w, h, c, got = MC.png_decode(out)  # re-encoded as PNG
    assert (w, h, c) == (2, 2, 3)
    assert np.abs(got.astype(int) - np.array([10, 200, 90])).max() <= 4


def test_fill_bytes_before_markers_are_consumed():
    """B.1.1.2: any marker may be preceded by any number of 0xFF fill
    bytes - both between segments and inside entropy data before the
    EOI (round-9 advice: these spec-legal payloads previously raised)."""
    rng = np.random.RandomState(3)
    px = np.clip(rng.normal(128, 20, (16, 16)).astype(np.int64), 0, 255).astype(np.uint8)
    blob = J.jpeg_encode(px, quality=95)
    base = J.jpeg_decode(blob)

    seg_fill = blob[:2] + b"\xff\xff" + blob[2:]          # fill after SOI
    assert blob.endswith(b"\xff\xd9")
    ent_fill = blob[:-2] + b"\xff" + blob[-2:]            # fill before EOI
    for variant in (seg_fill, ent_fill):
        w, h, c, got = J.jpeg_decode(variant)
        assert (w, h, c) == base[:3]
        np.testing.assert_array_equal(got, base[3])


def test_peek_decode_matches_per_bit_walk():
    """The round-9 LUT fast path (peek_decode) must be bit-for-bit
    equivalent to the per-bit reference walk (decode_symbol) - same
    symbol sequence, same consumed-bit positions, same ValueError on a
    prefix no code owns - across the Annex K AC luma table (the
    densest: 162 codes, lengths 2-16) on pseudorandom bitstreams."""
    rng = np.random.RandomState(17)
    table = J.build_huffman(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    lut_len, lut_sym = J._decode_lut(table)
    for trial in range(20):
        data = rng.bytes(64).replace(b"\xff", b"\x7f")  # no marker ambiguity
        fast, slow = J._BitReader(data, 0), J._BitReader(data, 0)
        for _ in range(100):
            try:
                a = fast.peek_decode(lut_len, lut_sym)
            except ValueError:
                with pytest.raises(ValueError):
                    slow.decode_symbol(table)
                break
            assert a == slow.decode_symbol(table)
            # logical consumed-bit position (readers fill at different
            # granularity; no 0xFF in the fixture, so loaded = pos*8)
            assert fast.pos * 8 - fast.nbits == slow.pos * 8 - slow.nbits


def test_decode_lut_memoized_per_table_content():
    """Round-10 (r9 advice, low): _decode_lut rebuilds two 65536-entry
    Python lists; that fixed cost dominated tiny-image decodes on the
    mm_codec_roundtrip path when paid per scan per table. The LUTs are
    memoized on table CONTENT (not id(), which CPython reuses after
    GC), so a repeated decode - and an equal table parsed from another
    image's DHT segment - returns the same cached objects."""
    table = J.build_huffman(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    first = J._decode_lut(table)
    assert J._decode_lut(table) is first
    # an equal-content table parsed independently hits the same entry
    copy = dict(J.build_huffman(list(J.DC_LUMA_BITS), list(J.DC_LUMA_VALS)))
    assert J._decode_lut(copy) is first
    # a different table does not
    other = J.build_huffman(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    assert J._decode_lut(other) is not first
