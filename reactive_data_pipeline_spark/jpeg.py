"""Pure-stdlib+numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The last format :mod:`.media_codecs` left to PIL was JPEG; this module
closes it for the baseline process (SOF0: sequential DCT, 8-bit,
Huffman): marker parse -> entropy decode -> dequantize -> 8x8 IDCT ->
chroma upsample -> YCbCr->RGB. Everything comes from the public spec:
the zigzag order (T.81 figure 5), the canonical Huffman construction
(annex C), the EXTEND sign rule (F.2.2.1), the DC-predictor reset on
restart markers (F.2.1.3.1), and the JFIF full-range YCbCr matrix.
Progressive (SOF2), arithmetic coding, 12-bit precision and lossless
modes raise ``ValueError`` - callers fall back to the header probe.
Within the baseline process the envelope is SINGLE-SCAN interleaved
files (the overwhelmingly common baseline shape): a multi-scan
non-interleaved baseline file decodes only its first SOS and fails the
dimension check loudly into the same ValueError fallback. 0xFF fill
bytes before markers (B.1.1.2) are consumed both between segments and
inside entropy data.

The encoder exists for the same reason as the PNG/GIF ones: JPEG is
lossy, so round-trips assert a tolerance, and tolerance tests alone
could hide a convention error shared by both halves (e.g. a flipped
zigzag agrees with itself). The decoder is therefore ALSO pinned by a
hand-assembled bitstream built directly from the spec's Annex K
tables in the tests - encoder-independent.

Entropy decode is Python - correct and deterministic first. Round 9
replaced the per-bit tree walk with a 16-bit-peek LUT
(:func:`_decode_lut` / ``_BitReader.peek_decode``, equivalence-pinned
against the per-bit reference walk) and fixed a hidden bignum
quadratic (``_fill`` never trimmed consumed high bits, so the bit
buffer accreted the whole scan). Measured single-core throughput
(local[32] box, q85), cost tracks the ENTROPY-CODED byte count:

* 256x256 RGB smooth gradient (6.2 KB): 37 ms/decode (~6 ms per
  compressed KB, ~0.2 us/px) - was 78 ms per-bit
* same + mild sensor-like noise (19.3 KB): 56 ms (~2.9 ms/KB) - was 402 ms
* worst-case dense noise (71.8 KB): 130 ms (~1.8 ms/KB, ~0.7 us/px)
  - was 7.4 s (the bignum quadratic dominated)
* 64x64 grayscale noise (2.4 KB): 4.5 ms (~1.9 ms/KB) - was 13.6 ms

Rule of thumb: **~2-6 ms per compressed KB per core** (vs 10-100
pre-LUT); libjpeg via PIL remains ~1-2 orders faster and
:func:`..multimodal.best_decoder` prefers it wherever installed.
Install PIL when the JPEG-dominant corpus volume exceeds roughly a
few hundred compressed MB per available core; below that the stdlib
path is the dependency-free envelope (the driver's text-payload
corpus pays ~62 us/doc in mm_codec_roundtrip - its synthesized
JPEGs are tiny).
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

#: T.81 figure 5 - zigzag index of each coefficient in an 8x8 block
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K.1 - luminance / chrominance quantization tables (zigzag order
#: is NOT used here; these are in natural row-major order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Annex K.3 - standard Huffman tables as (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: 8x8 DCT-II basis: T[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(coeff: np.ndarray) -> np.ndarray:
    return _T.T @ coeff @ _T


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


def build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Annex C canonical construction: map (length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Inverse form for the encoder: symbol -> (length, code)."""
    return {v: (ln, c) for (ln, c), v in build_huffman(bits, vals).items()}


def _extend(value: int, size: int) -> int:
    """F.2.2.1: map ``size`` received bits to the signed coefficient."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _decode_lut(table: dict[tuple[int, int], int]) -> tuple[bytes, bytes]:
    """16-bit-peek decode tables: every 16-bit window value maps to the
    unique code that prefixes it (canonical Huffman codes are prefix-
    free; max length 16 per T.81). ``lut_len[v] == 0`` marks a window
    no code prefixes - an invalid bitstream. Replaces the per-bit tree
    walk with one index + one subtraction per symbol.

    Memoized on the table CONTENT (round-10, r9 advice): the LUTs cost
    ~1 ms to build, which dominated the decode of the tiny synthesized
    JPEGs on the ``mm_codec_roundtrip`` path when rebuilt per scan per
    table. Keying on content (not ``id``, which CPython reuses after
    GC) makes repeated decodes and the Annex-K standard tables hit
    across images.

    The cached form is two 64 KiB ``bytes`` (round-11 advice: the
    previous 65536-entry Python LISTS pinned ~1 MB+ per table, up to
    64 tables, per executor Python worker for the process lifetime -
    tens of MB on a many-custom-DHT corpus). JPEG Huffman symbols and
    code lengths are both 8-bit, ``bytes`` indexing yields a plain int
    as fast as list indexing in the scan hot loop, and immutability
    makes the sharing contract structural instead of documented."""
    return _decode_lut_cached(tuple(sorted(table.items())))


@lru_cache(maxsize=64)
def _decode_lut_cached(items: tuple) -> tuple[bytes, bytes]:
    ln_arr = np.zeros(65536, np.uint8)
    sym_arr = np.zeros(65536, np.uint8)
    for (ln, code), s in items:
        start = code << (16 - ln)
        ln_arr[start : start + (1 << (16 - ln))] = ln
        sym_arr[start : start + (1 << (16 - ln))] = s
    return ln_arr.tobytes(), sym_arr.tobytes()


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, RSTn handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        # Drop already-consumed high bits FIRST: reads only ever
        # decrement nbits, so without the mask bitbuf accretes every
        # byte of the scan and each shift goes bignum-quadratic in the
        # scan length (round-9 profile: this alone was most of the
        # "103 ms per compressed KB" figure on dense payloads).
        self.bitbuf &= (1 << self.nbits) - 1
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # spec allows the decoder to pad past the segment end
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed 0xFF data byte
                    self.pos += 2
                elif nxt == 0xFF:
                    # B.1.1.2: any marker may be preceded by any number
                    # of 0xFF fill bytes - skip the fill, re-examine
                    self.pos += 1
                    continue
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    # restart/EOI marker: stop consuming, pad with 1s
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()  # post-fill nbits >= 25 >= any JPEG field (16 max)
        self.nbits -= n
        return (self.bitbuf >> self.nbits) & ((1 << n) - 1)

    def peek_decode(self, lut_len: bytes, lut_sym: bytes) -> int:
        """One Huffman symbol via the 16-bit window LUT - consumes
        exactly the matched code's length, like the per-bit walk, and
        raises the same ValueError on a prefix no code owns."""
        if self.nbits < 16:
            self._fill()
        idx = (self.bitbuf >> (self.nbits - 16)) & 0xFFFF
        ln = lut_len[idx]
        if ln == 0:
            raise ValueError("invalid JPEG Huffman code")
        self.nbits -= ln
        return lut_sym[idx]

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        """Per-bit reference walk (kept for tests/tools; the scan loop
        uses :meth:`peek_decode`, which must stay bit-for-bit
        equivalent)."""
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align_restart(self):
        """Consume up to the next RSTn marker and skip it (F.2.1.3.1)."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing JPEG restart marker")


def jpeg_decode(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline (SOF0) JPEG to ``(width, height, channels,
    pixels)`` - grayscale -> 1 channel, YCbCr -> 3 (RGB)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        marker = b[i + 1]
        if marker == 0xFF:  # B.1.1.2 fill byte before a marker
            i += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        seg = b[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quantization tables not supported")
                zz = np.frombuffer(seg, np.uint8, 64, j + 1).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qt[tid] = nat.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                (dc_tables if cls == 0 else ac_tables)[tid] = build_huffman(bits, vals)
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG not supported")
            h0, w0 = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w0, "h": h0, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS -> entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan_sel[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                b, i + 2 + seg_len, frame, scan_sel, qt, dc_tables,
                ac_tables, restart_interval,
            )
        elif marker == 0xD9:
            break
        i += 2 + seg_len
    raise ValueError("JPEG has no scan data")


def _decode_scan(b, pos, frame, scan_sel, qt, dc_tables, ac_tables,
                 restart_interval):
    w0, h0, comps = frame["w"], frame["h"], frame["comps"]
    if w0 == 0 or h0 == 0:
        raise ValueError("zero-dimension JPEG")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise ValueError("sampling factors above 2 not supported")
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise ValueError("per-component sampling factors must be 1 or 2")
    from .media_codecs import MAX_PIXELS

    if w0 * h0 > MAX_PIXELS:
        raise ValueError("JPEG dimensions exceed MAX_PIXELS")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w0 // mcu_w)
    mcus_y = -(-h0 // mcu_h)
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        for c in comps
    }
    reader = _BitReader(b, pos)
    dc_luts = {t: _decode_lut(tab) for t, tab in dc_tables.items()}
    ac_luts = {t: _decode_lut(tab) for t, tab in ac_tables.items()}
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                td, ta = scan_sel[c["id"]]
                dc_len, dc_sym = dc_luts[td]
                ac_len, ac_sym = ac_luts[ta]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = reader.peek_decode(dc_len, dc_sym)
                        diff = _extend(reader.read_bits(size), size)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.peek_decode(ac_len, ac_sym)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coeff = np.zeros(64, dtype=np.int64)
                        coeff[ZIGZAG] = zz
                        block = _idct2((coeff.reshape(8, 8) * q).astype(np.float64))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # level shift, upsample each plane to full resolution, crop
    full = []
    for c in comps:
        p = planes[c["id"]] + 128.0
        if c["h"] != hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:h0, :w0])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return int(w0), int(h0), 1, gray[:, :, None]
    if len(full) != 3:
        raise ValueError(f"{len(full)}-component JPEG not supported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return int(w0), int(h0), 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4 or grayscale, standard tables)
# ---------------------------------------------------------------------------


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality->scaling convention."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    coeff = np.round(_fdct2(block.astype(np.float64)) / q).astype(np.int64)
    zz = coeff.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    size = int(diff).bit_length() if diff else 0
    ln, code = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        ln, code = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        ln, code = ac_codes[0x00]
        bw.write(code, ln)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def jpeg_encode(
    pixels: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode an (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8
    array as a baseline JPEG with the Annex K tables scaled by
    ``quality``. ``subsampling``: "444" (one block per component per
    MCU) or "420" (2x2 luma blocks + box-averaged chroma per 16x16
    MCU - exists chiefly so the decoder's multi-block MCU loop and
    chroma upsampler get a real round-trip test)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("pixels must be (h, w) gray or (h, w, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h0, w0, nch = px.shape
    if h0 == 0 or w0 == 0:
        raise ValueError("zero-dimension image")
    if nch == 3:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        bl = px[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * bl,
            -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0,
        ]
        qts = [_quality_scale(QUANT_LUMA, quality).reshape(8, 8),
               _quality_scale(QUANT_CHROMA, quality).reshape(8, 8)]
        comp_q = [0, 1, 1]
        dc_codes = [_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                    _huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
        ac_codes = [_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                    _huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]
        comp_t = [0, 1, 1]
    else:
        planes = [px[:, :, 0].astype(np.float64)]
        qts = [_quality_scale(QUANT_LUMA, quality).reshape(8, 8)]
        comp_q = [0]
        dc_codes = [_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
        ac_codes = [_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
        comp_t = [0]

    if nch == 3 and subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w0 // (8 * hmax))
    mcus_y = -(-h0 // (8 * vmax))

    def _pad_edge(p: np.ndarray, th: int, tw: int) -> np.ndarray:
        sh0, sw0 = p.shape
        pad = np.empty((th, tw))
        pad[:sh0, :sw0] = p
        pad[:sh0, sw0:] = p[:, sw0 - 1 :]
        pad[sh0:, :] = pad[sh0 - 1 : sh0, :]
        return pad

    padded = []
    for c, p in enumerate(planes):
        sh, sv = samp[c]
        if (sh, sv) != (hmax, vmax):  # downsample chroma by box average
            fx, fy = hmax // sh, vmax // sv
            even = _pad_edge(p, -(-h0 // fy) * fy, -(-w0 // fx) * fx)
            p = even.reshape(
                even.shape[0] // fy, fy, even.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        padded.append(_pad_edge(p, mcus_y * sv * 8, mcus_x * sh * 8) - 128.0)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qts):
        out += _seg(0xDB, bytes([tid]) + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h0, w0) + bytes([len(planes)])
    for c in range(len(planes)):
        sof += bytes([c + 1, (samp[c][0] << 4) | samp[c][1], comp_q[c]])
    out += _seg(0xC0, sof)
    emitted = set()
    for c in range(len(planes)):
        t = comp_t[c]
        if t in emitted:
            continue
        emitted.add(t)
        if t == 0:
            out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
            out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
        else:
            out += _seg(0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
            out += _seg(0xC4, bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    sos = bytes([len(planes)])
    for c in range(len(planes)):
        sos += bytes([c + 1, (comp_t[c] << 4) | comp_t[c]])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c, p in enumerate(padded):
                sh, sv = samp[c]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        preds[c] = _encode_block(
                            bw, p[y0 : y0 + 8, x0 : x0 + 8], qts[comp_q[c]],
                            dc_codes[comp_t[c]], ac_codes[comp_t[c]], preds[c],
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
