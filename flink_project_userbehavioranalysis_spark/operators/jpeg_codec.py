"""Dependency-free baseline JPEG codec (ITU-T T.81, public spec).

Closes the last honest codec stub in the multimodal pillar: r8 made
BMP real, r9 made PNG/WAV/AVI real, and ``decode_real`` still raised
``NotImplementedError`` for ``image/jpeg``. This module implements
DCT JPEG from the public spec alone — baseline sequential for 8-bit
GRAYSCALE (one component) and, since r10, 3-component YCbCr COLOR
with 4:2:0 chroma subsampling (the format real-world corpora
overwhelmingly contain) plus PROGRESSIVE (SOF2) — grayscale AND
color — with full successive approximation:

* forward/inverse 8x8 DCT via the orthonormal DCT-II matrix (numpy),
* the Annex K.1 luminance and K.2 chrominance quantization tables
  with IJG quality scaling,
* the Annex K.3 standard DC/AC luminance AND chrominance Huffman
  tables (canonical code construction per Annex C),
* zigzag coefficient ordering, differential DC per component,
  run-length AC with ZRL/EOB, MSB-first bit packing with 0xFF byte
  stuffing,
* JFIF RGB<->YCbCr color conversion, 2x2-mean chroma subsampling,
  and generic MCU interleave (per-component Hi x Vi blocks per MCU,
  spec A.2.3),
* restart intervals (DRI segment + byte-aligned RSTm markers with
  modulo-8 sequence checking and per-interval DC-predictor resets,
  spec E.1.4) — the resync structure real-world encoders emit,
* progressive multi-scan decode and a four-scan encoder (spectral
  selection + successive approximation per Annex G: DC first/refine,
  AC band first/refine with EOB runs and buffered correction bits),
* a full marker writer/parser (SOI/APP0/DQT/SOF0/DHT/SOS/EOI) with
  per-id quant/Huffman table selection.

JPEG is lossy, so unlike the BMP/PNG scanline oracles the pixel
round-trip is certified by a BOUND (see ``multimodal.jpeg_roundtrip``)
plus an EXACT losslessness check of the entropy layer: the decoder's
quantized coefficients must equal the encoder's bit for bit, per
component (``tests/test_jpeg_codec.py``). Anything the codec does not
support (12-bit, arithmetic coding, lossless/hierarchical SOFs)
raises loudly instead of guessing.

No reference analog (the Flink project is scalar-only); this follows
the builder brief's multimodal pillar. Scale shape: the codec runs
inside Arrow-batched ``mapInPandas`` passes (map-only, no shuffle) —
see ``multimodal.py``.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ------------------------------------------------------------- tables

#: Annex K.1 luminance quantization table (row-major 8x8).
BASE_LUMA_QT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

#: Annex K.2 chrominance quantization table (row-major 8x8).
BASE_CHROMA_QT = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

#: Annex K.3.1 — standard DC luminance Huffman spec (BITS, HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))

#: Annex K.3.3 — standard DC chrominance Huffman spec.
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

#: Annex K.3.4 — standard AC chrominance Huffman spec.
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: Annex K.3.2 — standard AC luminance Huffman spec.
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag() -> list[tuple[int, int]]:
    """Zigzag scan order: diagonals s = r+c; even diagonals run
    bottom-left -> top-right, odd ones top-right -> bottom-left."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        order.extend(diag[::-1] if s % 2 == 0 else diag)
    return order


ZIGZAG = _zigzag()

#: Orthonormal DCT-II matrix: F = C @ X @ C.T, X = C.T @ F @ C.
_C = np.array(
    [
        [
            math.sqrt((1.0 if u == 0 else 2.0) / 8.0)
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


_QT_CACHE: dict[tuple[int, bytes], np.ndarray] = {}


def quality_scaled_qt(quality: int, base: np.ndarray | None = None) -> np.ndarray:
    """IJG quality scaling of an Annex K table (K.1 luma by default,
    pass ``BASE_CHROMA_QT`` for K.2): scale = 5000/Q for Q < 50 else
    200 - 2Q; each entry floor((base*scale + 50)/100), clamped to
    [1, 255]. Memoized per (quality, base identity) — the encoders
    rebuild the same table for every one of thousands of tiny corpus
    images (r12 profile)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    if base is None:
        base = BASE_LUMA_QT
    key = (quality, base.tobytes())
    cached = _QT_CACHE.get(key)
    if cached is not None:
        return cached
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (base * scale + 50) // 100
    out = np.clip(qt, 1, 255).astype(np.int64)
    out.setflags(write=False)
    _QT_CACHE[key] = out
    return out


# -------------------------------------------------- Huffman (Annex C)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment: value -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


#: Memoized standard-table encoder codes (rebuilt tables measured on
#: the profile when encoding thousands of tiny corpus images).
_STD_DC_CODES = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
_STD_AC_CODES = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
_STD_DC_CHROMA_CODES = _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
_STD_AC_CHROMA_CODES = _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)


# ----------------------------------------------------- bit I/O layers


class _BitWriter:
    """MSB-first bit packer with 0xFF -> 0xFF 0x00 byte stuffing.
    Per-SYMBOL integer shifts (not per-bit loops) keep the pure-Python
    encoder off the profile: one append per emitted byte."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        # accumulate into one big int and drain in bulk: the per-write
        # cost is two int ops instead of a per-byte Python loop, and
        # the 0xFF byte-stuffing (spec F.1.2.3) happens once per drain
        # as a C-speed bytes.replace (r12; byte-identical output)
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        if self._n >= 8192:
            self._drain()

    def _drain(self) -> None:
        nbytes = self._n >> 3
        if nbytes:
            rem = self._n & 7
            chunk = (self._acc >> rem).to_bytes(nbytes, "big")
            self.buf += chunk.replace(b"\xff", b"\xff\x00")
            self._acc &= (1 << rem) - 1
            self._n = rem

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (spec F.1.2.3)."""
        if self._n & 7:
            pad = 8 - (self._n & 7)
            self._acc = (self._acc << pad) | ((1 << pad) - 1)
            self._n += pad
        self._drain()

    def restart_marker(self, m: int) -> None:
        """Byte-align (1-bit padding, stuffing applies) and emit RSTm
        (spec E.1.4) — the marker bytes themselves are NOT stuffed."""
        self.flush()
        self.buf += bytes([0xFF, 0xD0 + (m % 8)])


class _BitReader:
    """MSB-first bit reader that un-stuffs 0xFF 0x00 and raises on a
    real marker inside the entropy stream (restart via
    ``consume_restart``).

    r12 shape: the whole entropy segment (up to the next real marker)
    is located and un-stuffed ONCE per scan with C-speed
    ``bytes.find`` / slicing, and ``peek`` is a 4-byte
    ``int.from_bytes`` window over the un-stuffed buffer — no per-byte
    Python fill loop, no growing int window. ``peek(16)`` feeds the
    Huffman LUT in one lookup. Peeking past the end of real data pads
    with virtual 1-bits (so the final code of a scan can be looked
    up), but CONSUMING virtual bits raises — a code that needs padding
    bits means the stream is truncated or a marker interrupted it."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self._scan_segment(pos)

    def _scan_segment(self, pos: int) -> None:
        """Un-stuff from ``pos`` up to the first real marker (0xFF
        followed by anything but 0x00) or end of data."""
        data = self.data
        n = len(data)
        chunks = []
        i = pos
        while True:
            j = data.find(b"\xff", i)
            if j == -1:
                chunks.append(data[i:])
                self._marker_pos = n
                self._end_marker = None
                self._end_reason = "truncated entropy-coded stream"
                break
            if j + 1 < n and data[j + 1] == 0x00:
                chunks.append(data[i : j + 1])  # keep the 0xFF, drop stuffing
                i = j + 2
                continue
            chunks.append(data[i:j])
            self._marker_pos = j
            self._end_marker = (0xFF00 | data[j + 1]) if j + 1 < n else None
            self._end_reason = "marker inside entropy-coded stream"
            break
        self._bytes = b"".join(chunks)
        self._nbits = len(self._bytes) * 8
        self._cur = 0

    def _remaining(self) -> int:
        return self._nbits - self._cur

    def peek(self, k: int) -> int:
        byte_i = self._cur >> 3
        off = self._cur & 7
        chunk = self._bytes[byte_i : byte_i + 4]
        word = int.from_bytes(chunk, "big")
        short = 4 - len(chunk)
        if short:
            # virtual 1-bit padding past the real data
            word = (word << (8 * short)) | ((1 << (8 * short)) - 1)
        return (word >> (32 - off - k)) & ((1 << k) - 1)

    def consume(self, k: int) -> None:
        if self._cur + k > self._nbits:
            raise ValueError(self._end_reason or "truncated entropy-coded stream")
        self._cur += k

    def read_bits(self, n: int) -> int:
        if not n:
            return 0
        v = self.peek(n)
        self.consume(n)
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)

    def at_scan_end(self) -> bool:
        """True iff only the final partial byte's padding (< 8 real
        bits) remains unconsumed."""
        return self._remaining() <= 7

    def consume_restart(self, expected_m: int) -> None:
        """Cross an expected RSTm boundary (spec E.1.4): only the
        final partial byte's 1-bit padding may remain before it, the
        marker index must match the modulo-8 sequence, and reading
        resumes bit-aligned right after the two marker bytes."""
        if not self.at_scan_end():
            raise ValueError("restart marker not byte-aligned")
        if self._end_marker != 0xFFD0 + (expected_m % 8):
            raise ValueError(
                f"expected RST{expected_m % 8}, got "
                f"{self._end_marker:#06x}" if self._end_marker is not None
                else "truncated stream at restart boundary"
            )
        self._scan_segment(self._marker_pos + 2)


def _huff_lut(bits: list[int], vals: list[int]) -> list[tuple[int, int]]:
    """16-bit-prefix lookup table: lut[peek16] = (value, code_length),
    (0, 0) where no code matches. One array index replaces the
    per-bit canonical-tree walk."""
    lut = [(0, 0)] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            prefix = code << (16 - length)
            span = 1 << (16 - length)
            entry = (vals[k], length)
            lut[prefix : prefix + span] = [entry] * span
            code += 1
            k += 1
        code <<= 1
    return lut


_LUT_CACHE: dict[tuple[tuple[int, ...], tuple[int, ...]], list[tuple[int, int]]] = {}


def _huff_lut_cached(bits: list[int], vals: list[int]) -> list[tuple[int, int]]:
    key = (tuple(bits), tuple(vals))
    lut = _LUT_CACHE.get(key)
    if lut is None:
        lut = _LUT_CACHE[key] = _huff_lut(bits, vals)
    return lut


def _read_huff(r: _BitReader, lut: list[tuple[int, int]]) -> int:
    v, ln = lut[r.peek(16)]
    if ln == 0:
        raise ValueError("invalid Huffman code")
    r.consume(ln)
    return v


# ------------------------------------------- coefficient coding (F.1)


def _bitsize(v: int) -> int:
    """Magnitude category SSSS: number of bits in |v|."""
    return int(abs(v)).bit_length()


def _enc_magnitude(v: int, s: int) -> int:
    """Spec F.1.2.1 magnitude bits: v itself if positive, else
    v + 2^s - 1 (one's-complement style)."""
    return v if v >= 0 else v + (1 << s) - 1


def _extend(v: int, s: int) -> int:
    """Spec F.2.2.1 EXTEND: undo ``_enc_magnitude``."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


_ZZ_R = np.array([rc[0] for rc in ZIGZAG])
_ZZ_C = np.array([rc[1] for rc in ZIGZAG])


def _split_blocks(img: np.ndarray) -> np.ndarray:
    """(h, w) -> (n_blocks, 8, 8) in row-major block order (one
    reshape/transpose, no Python loop)."""
    h, w = img.shape
    return (
        img.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def forward_blocks(img: np.ndarray, qt: np.ndarray) -> list[np.ndarray]:
    """Level-shift, 8x8 block DCT, quantize, zigzag. ``img`` must be
    (h, w) uint8 with h, w multiples of 8 (caller pads). Returns one
    int32[64] zigzag vector per block, row-major block order. The DCT
    runs BATCHED over all blocks (one einsum), not per-block."""
    x = _split_blocks(img).astype(np.float64) - 128.0
    f = _C @ x @ _C.T  # (8,8) broadcasts over the (n,8,8) block stack
    q = np.rint(f / qt).astype(np.int32)
    zz = q[:, _ZZ_R, _ZZ_C]
    return list(zz)


def _inverse_blocks(zz_blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Dequantize (n, 64) zigzag vectors, batched IDCT, level-shift
    back, clip: returns (n, 8, 8) uint8."""
    n = zz_blocks.shape[0]
    f = np.zeros((n, 8, 8), dtype=np.float64)
    f[:, _ZZ_R, _ZZ_C] = zz_blocks.astype(np.float64) * qt[_ZZ_R, _ZZ_C]
    x = _C.T @ f @ _C + 128.0  # batched inverse over (n,8,8)
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)


# ------------------------------------------------------ color space

# JFIF (ITU-R BT.601 full-range) RGB <-> YCbCr coefficients.
_YCC_FWD = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168735892, -0.331264108, 0.5],
        [0.5, -0.418687589, -0.081312411],
    ]
)


def rgb_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 RGB -> three (h, w) uint8 planes (Y, Cb, Cr),
    JFIF full-range BT.601, rounded to the nearest integer (the
    precision every baseline encoder quantizes the planes to)."""
    f = img.astype(np.float64)
    ycc = f @ _YCC_FWD.T
    ycc[..., 1:] += 128.0
    ycc = np.clip(np.rint(ycc), 0, 255).astype(np.uint8)
    return ycc[..., 0], ycc[..., 1], ycc[..., 2]


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Three (h, w) planes -> (h, w, 3) uint8 RGB (JFIF inverse)."""
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136286 * cbf - 0.714136286 * crf
    b = yf + 1.772 * cbf
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------- encoder


def _emit_block(
    bw: _BitWriter,
    zz: np.ndarray,
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-encode one zigzag block (differential DC + RLE AC with
    ZRL/EOB, spec F.1.2); returns the new DC predictor. Shared by the
    grayscale scan and each component of the interleaved color scan."""
    diff = int(zz[0]) - prev_dc
    s = _bitsize(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(_enc_magnitude(diff, s), s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL: sixteen zeros
            bw.write(code, length)
            run -= 16
        s = _bitsize(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(_enc_magnitude(v, s), s)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _edge_pad(img: np.ndarray, pad_h: int, pad_w: int) -> np.ndarray:
    """Bottom/right edge-replication to the block grid. Equivalent to
    ``np.pad(..., mode="edge")`` on those two axes but ~5x cheaper —
    np.pad's generic machinery was visible on the r12 encode profile
    at thousands of tiny frames. Works for (h, w) and (h, w, 3)."""
    if pad_w:
        img = np.concatenate([img, np.repeat(img[:, -1:], pad_w, axis=1)], axis=1)
    if pad_h:
        img = np.concatenate([img, np.repeat(img[-1:], pad_h, axis=0)], axis=0)
    return img


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht(table_class: int, table_id: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(
        0xFFC4, bytes([(table_class << 4) | table_id]) + bytes(bits) + bytes(vals)
    )


_DQT_CACHE: dict[tuple[int, bytes], bytes] = {}


def _dqt(table_id: int, qt: np.ndarray) -> bytes:
    # DQT payload is stored in ZIGZAG order (spec B.2.4.1). Memoized:
    # the per-entry genexpr showed up on the r12 profile when encoding
    # thousands of frames with the same table.
    key = (table_id, qt.tobytes())
    seg = _DQT_CACHE.get(key)
    if seg is None:
        seg = _DQT_CACHE[key] = _seg(
            0xFFDB, bytes([table_id]) + bytes(int(qt[r, c]) for r, c in ZIGZAG)
        )
    return seg


_JFIF_APP0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"


def encode_jpeg(
    img: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Encode a (h, w) uint8 grayscale array as a baseline sequential
    JFIF JPEG (one component, 8-bit, no subsampling). Non-multiple-
    of-8 dimensions are edge-replicated to the block grid; the decoder
    crops back using the SOF0 dimensions. ``restart_interval`` > 0
    emits a DRI segment and RSTm markers every that-many MCUs (one
    block per MCU for single-component scans) with DC-predictor resets
    — the resync structure real-world encoders emit (r10)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("expected a (h, w) uint8 grayscale array")
    h, w = img.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("dimensions out of JPEG range")
    qt = quality_scaled_qt(quality)
    pad_h, pad_w = (-h) % 8, (-w) % 8
    padded = _edge_pad(img, pad_h, pad_w)

    bw = _BitWriter()
    prev_dc = 0
    for i, zz in enumerate(forward_blocks(padded, qt)):
        if restart_interval and i and i % restart_interval == 0:
            bw.restart_marker(i // restart_interval - 1)
            prev_dc = 0
        prev_dc = _emit_block(bw, zz, prev_dc, _STD_DC_CODES, _STD_AC_CODES)
    bw.flush()

    dri = (
        [_seg(0xFFDD, struct.pack(">H", restart_interval))]
        if restart_interval
        else []
    )
    return b"".join(
        [
            b"\xff\xd8",  # SOI
            _seg(0xFFE0, _JFIF_APP0),
            _dqt(0, qt),
            _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"),
            _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
            *dri,
            _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00"),
            bytes(bw.buf),
            b"\xff\xd9",  # EOI
        ]
    )


def encode_jpeg_color(
    img: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Encode a (h, w, 3) uint8 RGB array as a baseline sequential
    JFIF JPEG with YCbCr 4:2:0 subsampling — the layout real corpora
    contain: SOF0 components Y(id 1, sampling 2x2, luma tables) and
    Cb/Cr (ids 2/3, 1x1, chroma tables), MCU-interleaved scan (four Y
    blocks then one Cb and one Cr per 16x16 MCU, spec A.2.3), per-
    component differential-DC predictors. Dimensions are edge-padded
    to the MCU grid; the decoder crops back via SOF0. Chroma planes
    are 2x2-MEAN subsampled (deterministic; the decoder upsamples by
    replication — both halves of the bound-certified lossy contract)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected a (h, w, 3) uint8 RGB array")
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("dimensions out of JPEG range")
    qt_y = quality_scaled_qt(quality)
    qt_c = quality_scaled_qt(quality, BASE_CHROMA_QT)
    pad_h, pad_w = (-h) % 16, (-w) % 16
    padded = _edge_pad(img, pad_h, pad_w)
    y, cb, cr = rgb_to_ycbcr(padded)
    ph, pw = y.shape

    def sub(plane: np.ndarray) -> np.ndarray:
        m = plane.astype(np.float64).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        return np.clip(np.rint(m), 0, 255).astype(np.uint8)

    yb = np.stack(forward_blocks(y, qt_y))  # row-major (ph/8, pw/8) grid
    cbb = np.stack(forward_blocks(sub(cb), qt_c))  # (ph/16, pw/16) grid
    crb = np.stack(forward_blocks(sub(cr), qt_c))
    mcux, mcuy = pw // 16, ph // 16
    ybw = pw // 8  # Y block-grid width

    bw = _BitWriter()
    prev = [0, 0, 0]
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            bw.restart_marker(m // restart_interval - 1)
            prev = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for v in (0, 1):  # 4 Y blocks per MCU, raster order
            for hh in (0, 1):
                zz = yb[(2 * my + v) * ybw + (2 * mx + hh)]
                prev[0] = _emit_block(bw, zz, prev[0], _STD_DC_CODES, _STD_AC_CODES)
        ci = my * mcux + mx
        prev[1] = _emit_block(
            bw, cbb[ci], prev[1], _STD_DC_CHROMA_CODES, _STD_AC_CHROMA_CODES
        )
        prev[2] = _emit_block(
            bw, crb[ci], prev[2], _STD_DC_CHROMA_CODES, _STD_AC_CHROMA_CODES
        )
    bw.flush()

    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    dri = (
        [_seg(0xFFDD, struct.pack(">H", restart_interval))]
        if restart_interval
        else []
    )
    return b"".join(
        [
            b"\xff\xd8",  # SOI
            _seg(0xFFE0, _JFIF_APP0),
            _dqt(0, qt_y),
            _dqt(1, qt_c),
            _seg(0xFFC0, sof),
            _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
            _dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            _dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
            *dri,
            _seg(0xFFDA, sos),
            bytes(bw.buf),
            b"\xff\xd9",  # EOI
        ]
    )


# ---------------------------------------------------------- decoder


def _walk_segments(b: bytes):
    """Yield (marker, payload_start, payload_len) for every marker
    segment up to and including SOS; the caller takes over at the
    entropy-coded data."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = (b[pos] << 8) | b[pos + 1]
        if marker == 0xFFD9:  # EOI before SOS
            raise ValueError("no scan data")
        (ln,) = struct.unpack_from(">H", b, pos + 2)
        yield marker, pos + 4, ln - 2
        pos += 2 + ln
        if marker == 0xFFDA:
            return
    raise ValueError("truncated JPEG (no SOS)")


def decode_jpeg_meta(b: bytes) -> tuple[int, int, int, int]:
    """Parse (width, height, precision, n_components) from the SOF0
    (baseline) or SOF2 (progressive, r10) frame header. Every other
    SOF flavor (extended sequential, lossless, arithmetic) raises."""
    for marker, start, ln in _walk_segments(b):
        if marker in (0xFFC0, 0xFFC2):
            precision, h, w, ncomp = struct.unpack_from(">BHHB", b, start)
            return w, h, precision, ncomp
        if 0xFFC1 <= marker <= 0xFFCF and marker not in (0xFFC4, 0xFFC8, 0xFFCC):
            raise NotImplementedError(
                f"only SOF0/SOF2 are supported (got {marker:#06x})"
            )
    raise ValueError("no SOF frame header")


def _decode_block(
    r: _BitReader,
    dc_tbl: list[tuple[int, int]],
    ac_tbl: list[tuple[int, int]],
    prev_dc: int,
) -> tuple[np.ndarray, int]:
    """Entropy-decode one block (the inverse of ``_emit_block``);
    returns (zigzag int32[64], new DC predictor)."""
    zz = np.zeros(64, dtype=np.int32)
    s = _read_huff(r, dc_tbl)
    diff = _extend(r.read_bits(s), s) if s else 0
    prev_dc += diff
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = _read_huff(r, ac_tbl)
        if sym == 0x00:  # EOB
            break
        run, s = sym >> 4, sym & 0x0F
        if s == 0:
            if run != 15:
                raise ValueError("invalid AC symbol")
            k += 16
            # a ZRL landing exactly on 64 fills the block with
            # zeros (decodable, if wasteful vs EOB); past 64 the
            # run overflows the block — malformed, raise loudly
            # like the coefficient path below does.
            if k > 64:
                raise ValueError("ZRL run overflows block")
            continue
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(r.read_bits(s), s)
        k += 1
    return zz, prev_dc


def decode_jpeg_components(
    b: bytes,
) -> tuple[int, int, list[dict]]:
    """Parse the full baseline frame and entropy-decode the scan
    WITHOUT the inverse DCT. Returns (width, height, components) where
    each component is a dict with ``cid``, sampling factors ``hi`` /
    ``vi``, its quant table ``qt`` (8x8), its block grid ``blocks``
    (np (n, 64) int32, row-major over ``bh x bw`` blocks), and the
    grid dims ``bw`` / ``bh``. Single-component scans decode
    non-interleaved; multi-component scans decode MCU-interleaved
    (per-component Hi x Vi blocks per MCU, spec A.2.3) with
    per-component DC predictors. This is the exact-losslessness seam
    the tests compare bit-for-bit against ``forward_blocks``.

    Progressive payloads (SOF2, r10) route to the multi-scan decoder
    and come back in the same component structure."""
    if _is_progressive(b):
        return _decode_progressive(b)
    qts: dict[int, np.ndarray] = {}
    dims: tuple[int, int] | None = None
    frame_comps: list[tuple[int, int, int, int]] | None = None  # cid,hi,vi,tq
    dhts: dict[tuple[int, int], list[tuple[int, int]]] = {}
    scan_comps: list[tuple[int, int, int]] | None = None  # cid, td, ta
    scan_start = None
    restart_interval = 0
    for marker, start, ln in _walk_segments(b):
        if marker == 0xFFDB:
            # one or more (Pq/Tq, 64 entries) tables per segment
            p = start
            while p < start + ln:
                pq_tq = b[p]
                if pq_tq >> 4 != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int64)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = b[p + 1 + k]
                qts[pq_tq & 0x0F] = tbl
                p += 65
        elif marker == 0xFFC0:
            precision, h, w, ncomp = struct.unpack_from(">BHHB", b, start)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if ln < 6 + 3 * ncomp:
                raise ValueError("truncated SOF0 component list")
            dims = (w, h)
            frame_comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", b, start + 6 + 3 * i)
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("invalid sampling factors")
                frame_comps.append((cid, hi, vi, tq))
        elif 0xFFC1 <= marker <= 0xFFCF and marker not in (
            0xFFC4,
            0xFFC8,
            0xFFCC,
        ):
            raise NotImplementedError("only baseline SOF0 is supported")
        elif marker == 0xFFC4:
            p = start
            while p < start + ln:
                tc_th = b[p]
                bits = list(b[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(b[p + 17 : p + 17 + nvals])
                dhts[(tc_th >> 4, tc_th & 0x0F)] = _huff_lut_cached(bits, vals)
                p += 17 + nvals
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack_from(">H", b, start)
        elif marker == 0xFFDA:
            ns = b[start]
            scan_comps = []
            for i in range(ns):
                cid = b[start + 1 + 2 * i]
                tdta = b[start + 2 + 2 * i]
                scan_comps.append((cid, tdta >> 4, tdta & 0x0F))
            scan_start = start + ln
    if not qts or dims is None or frame_comps is None or not dhts:
        raise ValueError("missing DQT/SOF0/DHT before SOS")
    if scan_start is None or scan_comps is None:
        raise ValueError("no scan data")
    w, h = dims
    if [c[0] for c in scan_comps] != [c[0] for c in frame_comps]:
        raise NotImplementedError(
            "scan component order must match the frame (single full scan)"
        )
    by_cid = {cid: (hi, vi, tq) for cid, hi, vi, tq in frame_comps}
    hmax = max(hi for _, hi, _, _ in frame_comps)
    vmax = max(vi for _, _, vi, _ in frame_comps)

    comps: list[dict] = []
    for cid, td, ta in scan_comps:
        hi, vi, tq = by_cid[cid]
        if tq not in qts:
            raise ValueError(f"missing quant table {tq}")
        if (0, td) not in dhts or (1, ta) not in dhts:
            raise ValueError("missing Huffman table referenced by scan")
        if len(scan_comps) == 1:
            # non-interleaved: the block grid covers the component's
            # own dimensions (== frame dims for single-component)
            bw_c = (w * hi + 8 * hmax - 1) // (8 * hmax)
            bh_c = (h * vi + 8 * vmax - 1) // (8 * vmax)
        else:
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            bw_c, bh_c = mcux * hi, mcuy * vi
        comps.append(
            {
                "cid": cid,
                "hi": hi,
                "vi": vi,
                "qt": qts[tq],
                "dc": dhts[(0, td)],
                "ac": dhts[(1, ta)],
                "bw": bw_c,
                "bh": bh_c,
                "blocks": np.zeros((bh_c * bw_c, 64), dtype=np.int32),
                "prev": 0,
            }
        )

    r = _BitReader(b, scan_start)

    def maybe_restart(mcu_index: int) -> None:
        # DRI: an RSTm boundary every restart_interval MCUs, marker
        # index cycling mod 8, every DC predictor reset (spec E.1.4)
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            r.consume_restart(mcu_index // restart_interval - 1)
            for c in comps:
                c["prev"] = 0

    if len(comps) == 1:
        c = comps[0]
        for i in range(c["bh"] * c["bw"]):
            maybe_restart(i)  # single-component MCU = one block
            zz, c["prev"] = _decode_block(r, c["dc"], c["ac"], c["prev"])
            c["blocks"][i] = zz
    else:
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        for m in range(mcux * mcuy):
            maybe_restart(m)
            my, mx = divmod(m, mcux)
            for c in comps:
                for v in range(c["vi"]):
                    for hh in range(c["hi"]):
                        zz, c["prev"] = _decode_block(r, c["dc"], c["ac"], c["prev"])
                        row = my * c["vi"] + v
                        col = mx * c["hi"] + hh
                        c["blocks"][row * c["bw"] + col] = zz
    # the scan must terminate at EOI right after the final block — an
    # over-long entropy stream (extra blocks, trailing garbage) is a
    # decode error, not a silent success. Only the final byte's
    # padding bits (< 8 real bits) may remain unconsumed, and the
    # terminating marker must be EOI.
    if not r.at_scan_end() or r._end_marker != 0xFFD9:
        raise ValueError("entropy stream does not end at EOI")
    for c in comps:
        del c["dc"], c["ac"], c["prev"]
    return w, h, comps


def decode_jpeg_coeffs(
    b: bytes,
) -> tuple[int, int, np.ndarray, list[np.ndarray]]:
    """Single-component (grayscale) view of
    :func:`decode_jpeg_components`: returns (width, height,
    quant_table_8x8, zigzag coefficient vectors in row-major block
    order). Raises for multi-component payloads — color callers use
    the component API."""
    w, h, comps = decode_jpeg_components(b)
    if len(comps) != 1:
        raise NotImplementedError(
            "multi-component payload: use decode_jpeg_components"
        )
    c = comps[0]
    return w, h, c["qt"], list(c["blocks"])


def _comp_plane(c: dict) -> np.ndarray:
    """Dequantize + IDCT one component's block grid into its full
    (bh*8, bw*8) pixel plane."""
    px = _inverse_blocks(c["blocks"], c["qt"])
    return (
        px.reshape(c["bh"], c["bw"], 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(c["bh"] * 8, c["bw"] * 8)
    )


def decode_jpeg(b: bytes) -> np.ndarray:
    """Full decode: entropy layer + dequantize + IDCT + (for color)
    chroma upsampling and YCbCr->RGB, cropped to the SOF0 dimensions.
    Returns (h, w) uint8 for grayscale, (h, w, 3) uint8 RGB for
    3-component YCbCr."""
    w, h, comps = decode_jpeg_components(b)
    if len(comps) == 1:
        return _comp_plane(comps[0])[:h, :w]
    if len(comps) != 3:
        raise NotImplementedError(f"unsupported component count {len(comps)}")
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    planes = []
    for c in comps:
        plane = _comp_plane(c)
        # upsample by replication to the full-resolution grid, then
        # crop to the frame dims (nearest-neighbor — deterministic,
        # inside the bound-certified lossy contract)
        fy, fx = vmax // c["vi"], hmax // c["hi"]
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:h, :w])
    return ycbcr_to_rgb(*planes)


# --------------------------------------- progressive DCT (SOF2, r10)
#
# Full successive-approximation progressive — GRAYSCALE and, in the
# same pass, 3-component YCbCr 4:2:0 COLOR — implemented from T.81
# Annex G alone, in the libjpeg-default scan style: interleaved DC
# first at Al=1, per-component AC band first at Al=1, DC refinement,
# per-component AC refinement. Successive approximation is LOSSLESS
# on the quantized coefficients once every refinement scan lands, so
# the tests compare the accumulated grids bit-for-bit against
# ``forward_blocks`` exactly like the baseline entropy seam. Two
# structural spec rules the code pins:
#   * interleaved scans (ns > 1) are DC-only in progressive (spec
#     G.1.1.1) and cover the MCU-padded grid;
#   * non-interleaved scans cover the COMPONENT's own ceil(dims/8)
#     grid (spec A.2.2) — for 4:2:0 Y that grid can be NARROWER than
#     the MCU-padded one, so AC never lands on pure-pad blocks (they
#     stay DC-only flat, entirely outside the crop).
# The encoder caps EOB runs at 1 (always the EOB0 symbol) so the
# standard Annex K tables cover every emitted symbol; the decoder
# implements the general EOBn run. Restart markers inside progressive
# scans raise loudly.


def _is_progressive(b: bytes) -> bool:
    for marker, _start, _ln in _walk_segments(b):
        if marker == 0xFFC2:
            return True
        if marker == 0xFFC0:
            return False
    return False


# ----- per-scan encoders (shared by the gray and color progressive
# ----- entry points; ``blocks`` is an iterable of zigzag int32[64])


def _enc_ac_first(bw: _BitWriter, blocks, ac_codes, al: int) -> None:
    """AC band [1..63] first scan at successive-approximation level
    ``al`` (truncating point transform), EOB run capped at one block.

    r13 shape: the point transform runs BATCHED over the whole scan's
    block stack and the Python loop visits only the NONZERO
    coefficients (np.nonzero is row-major, i.e. exactly encoding
    order) — the r12 per-coefficient loop paid ~63 int()/abs() calls
    per block for mostly-zero bands. Byte-identical streams
    (conformance-pinned): runs are reconstructed from the nonzero
    positions' gaps, trailing zeros become the same capped EOB."""
    arr = np.asarray(blocks)
    if arr.size == 0:
        return
    a = arr[:, 1:].astype(np.int64)
    mag = np.abs(a) >> al
    r = np.where(a < 0, -mag, mag)
    nzb, nzk = np.nonzero(r)
    vals = r[nzb, nzk].tolist()
    blocks_idx = nzb.tolist()
    ks = (nzk + 1).tolist()  # back to zigzag positions 1..63
    zrl_code, zrl_len = ac_codes[0xF0]
    eob_code, eob_len = ac_codes[0x00]
    bi = 0  # current block
    prev = 0  # zigzag position of the last nonzero in current block
    for b, k, v in zip(blocks_idx, ks, vals):
        while bi < b:
            if prev != 63:  # trailing zeros (or an all-zero block)
                bw.write(eob_code, eob_len)
            bi += 1
            prev = 0
        run = k - prev - 1
        prev = k
        while run > 15:
            bw.write(zrl_code, zrl_len)
            run -= 16
        s = v.bit_length() if v >= 0 else (-v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
    while bi < arr.shape[0]:
        if prev != 63:
            bw.write(eob_code, eob_len)
        bi += 1
        prev = 0


def _enc_ac_refine(bw: _BitWriter, blocks, ac_codes, al: int) -> None:
    """AC band [1..63] refinement scan to level ``al`` (G.1.2.3):
    newly nonzero coefficients run-length coded over zero-at-this-
    level slots with a sign bit; buffered correction bits for
    nonzero-history positions flush after each symbol."""
    # r13 shape (mirrors _enc_ac_first): batch the point transform,
    # visit only the VISIBLE (t != 0) coefficients — the zero-at-this-
    # level run between two visible positions is exactly their zigzag
    # gap, because every in-between position has t == 0 by definition.
    # Byte-identical streams (conformance-pinned).
    arr = np.asarray(blocks)
    if arr.size == 0:
        return
    a = arr[:, 1:].astype(np.int64)
    t_all = np.abs(a) >> al
    nzb, nzk = np.nonzero(t_all)
    ts = t_all[nzb, nzk].tolist()
    signs = (a[nzb, nzk] > 0).astype(np.int64).tolist()
    blocks_idx = nzb.tolist()
    ks = (nzk + 1).tolist()
    zrl_code, zrl_len = ac_codes[0xF0]
    eob_code, eob_len = ac_codes[0x00]
    new_code, new_len = ac_codes[0x01]  # (run 0, size 1) fast path
    bi = 0
    prev = 0
    run = 0
    pending: list[int] = []
    for b, k, t, pos in zip(blocks_idx, ks, ts, signs):
        while bi < b:
            run += 63 - prev  # trailing zero-at-this-level slots
            if run or pending:
                bw.write(eob_code, eob_len)
                for bit in pending:
                    bw.write(bit, 1)
            bi += 1
            prev = 0
            run = 0
            pending = []
        run += k - prev - 1
        prev = k
        # a visible (t != 0) position guarantees k <= EOB, so any
        # backlog of >15 zero-at-this-level positions flushes as
        # ZRL HERE — before the correction-vs-new split, exactly
        # the spec ordering
        while run > 15:
            bw.write(zrl_code, zrl_len)
            run -= 16
            for bit in pending:
                bw.write(bit, 1)
            pending = []
        if t > 1:
            # nonzero history: one buffered correction bit
            pending.append(t & 1)
            continue
        # newly nonzero at this level: t == 1
        if run:
            code, length = ac_codes[(run << 4) | 1]
            bw.write(code, length)
        else:
            bw.write(new_code, new_len)
        bw.write(pos, 1)
        for bit in pending:
            bw.write(bit, 1)
        pending = []
        run = 0
    while bi < arr.shape[0]:
        run += 63 - prev
        if run or pending:
            bw.write(eob_code, eob_len)
            for bit in pending:
                bw.write(bit, 1)
        bi += 1
        prev = 0
        run = 0
        pending = []


def _sos_prog(comps: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
    """Progressive SOS header: comps = [(cid, (Td<<4)|Ta), ...]."""
    body = bytes([len(comps)])
    for cid, tdta in comps:
        body += bytes([cid, tdta])
    return _seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode a (h, w) uint8 grayscale array as PROGRESSIVE (SOF2)
    JFIF JPEG with the four-scan successive-approximation script
    ``DC@Al=1 → AC[1..63]@Al=1 → DC refine → AC refine``. The
    coefficient content is identical to :func:`encode_jpeg`'s (same
    quant table, same forward path) — only the scan packaging
    differs, so the full decode is bit-identical to the baseline
    decode (test-asserted)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("expected a (h, w) uint8 grayscale array")
    h, w = img.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("dimensions out of JPEG range")
    qt = quality_scaled_qt(quality)
    padded = _edge_pad(img, (-h) % 8, (-w) % 8)
    blocks = forward_blocks(padded, qt)

    # --- scan 1: DC first, Al=1 (arithmetic shift, diff-coded)
    bw = _BitWriter()
    prev = 0
    for zz in blocks:
        red = int(zz[0]) >> 1
        diff = red - prev
        prev = red
        s = _bitsize(diff)
        code, length = _STD_DC_CODES[s]
        bw.write(code, length)
        if s:
            bw.write(_enc_magnitude(diff, s), s)
    bw.flush()
    scan_dc1 = _sos_prog([(1, 0x00)], 0, 0, 0, 1) + bytes(bw.buf)

    # --- scan 2: AC band first, Al=1
    bw = _BitWriter()
    _enc_ac_first(bw, blocks, _STD_AC_CODES, 1)
    bw.flush()
    scan_ac1 = _sos_prog([(1, 0x00)], 1, 63, 0, 1) + bytes(bw.buf)

    # --- scan 3: DC refinement (one raw bit per block)
    bw = _BitWriter()
    for zz in blocks:
        bw.write(int(zz[0]) & 1, 1)
    bw.flush()
    scan_dc2 = _sos_prog([(1, 0x00)], 0, 0, 1, 0) + bytes(bw.buf)

    # --- scan 4: AC refinement
    bw = _BitWriter()
    _enc_ac_refine(bw, blocks, _STD_AC_CODES, 0)
    bw.flush()
    scan_ac2 = _sos_prog([(1, 0x00)], 1, 63, 1, 0) + bytes(bw.buf)

    return b"".join(
        [
            b"\xff\xd8",
            _seg(0xFFE0, _JFIF_APP0),
            _dqt(0, qt),
            _seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"),
            _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
            scan_dc1,
            scan_ac1,
            scan_dc2,
            scan_ac2,
            b"\xff\xd9",
        ]
    )


def encode_jpeg_color_progressive(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode a (h, w, 3) uint8 RGB array as PROGRESSIVE (SOF2) YCbCr
    4:2:0 JPEG — the libjpeg-default shape real photo corpora contain:
    an INTERLEAVED DC first scan (all three components, MCU order,
    Al=1), per-component AC band first scans (non-interleaved over
    each component's ceil(dims/8) grid, spec A.2.2), an interleaved DC
    refinement, and per-component AC refinements. Coefficient content
    matches :func:`encode_jpeg_color` exactly on every block the
    non-interleaved grids cover, so the CROPPED pixel decode is
    bit-identical to the baseline color decode (test-asserted; MCU-pad
    blocks outside the crop stay DC-only flat)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected a (h, w, 3) uint8 RGB array")
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("dimensions out of JPEG range")
    qt_y = quality_scaled_qt(quality)
    qt_c = quality_scaled_qt(quality, BASE_CHROMA_QT)
    pad_h, pad_w = (-h) % 16, (-w) % 16
    padded = _edge_pad(img, pad_h, pad_w)
    y, cb, cr = rgb_to_ycbcr(padded)
    ph, pw = y.shape

    def sub(plane: np.ndarray) -> np.ndarray:
        m = plane.astype(np.float64).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        return np.clip(np.rint(m), 0, 255).astype(np.uint8)

    yb = np.stack(forward_blocks(y, qt_y))  # (ph/8 x pw/8) grid, row-major
    cbb = np.stack(forward_blocks(sub(cb), qt_c))  # (ph/16 x pw/16)
    crb = np.stack(forward_blocks(sub(cr), qt_c))
    mcux, mcuy = pw // 16, ph // 16
    ybw = pw // 8
    # non-interleaved (ceil-dims) grids per component
    ybw_n, ybh_n = (w + 7) // 8, (h + 7) // 8
    y_noint = [
        yb[row * ybw + col] for row in range(ybh_n) for col in range(ybw_n)
    ]

    def mcu_blocks():
        """(comp_index, zz) pairs in MCU-interleave order."""
        for m in range(mcuy * mcux):
            my, mx = divmod(m, mcux)
            for v in (0, 1):
                for hh in (0, 1):
                    yield 0, yb[(2 * my + v) * ybw + (2 * mx + hh)]
            yield 1, cbb[my * mcux + mx]
            yield 2, crb[my * mcux + mx]

    all_comps = [(1, 0x00), (2, 0x11), (3, 0x11)]

    # --- scan 1: interleaved DC first, Al=1
    bw = _BitWriter()
    prev = [0, 0, 0]
    for ci, zz in mcu_blocks():
        red = int(zz[0]) >> 1
        diff = red - prev[ci]
        prev[ci] = red
        dc = _STD_DC_CODES if ci == 0 else _STD_DC_CHROMA_CODES
        s = _bitsize(diff)
        code, length = dc[s]
        bw.write(code, length)
        if s:
            bw.write(_enc_magnitude(diff, s), s)
    bw.flush()
    scan_dc1 = _sos_prog(all_comps, 0, 0, 0, 1) + bytes(bw.buf)

    # --- scans 2-4: per-component AC first (non-interleaved grids)
    ac_scans_first = []
    for cid, blocks, codes in (
        (1, y_noint, _STD_AC_CODES),
        (2, cbb, _STD_AC_CHROMA_CODES),
        (3, crb, _STD_AC_CHROMA_CODES),
    ):
        bw = _BitWriter()
        _enc_ac_first(bw, blocks, codes, 1)
        bw.flush()
        ta = 0x00 if cid == 1 else 0x01
        ac_scans_first.append(_sos_prog([(cid, ta)], 1, 63, 0, 1) + bytes(bw.buf))

    # --- scan 5: interleaved DC refinement (one raw bit per block)
    bw = _BitWriter()
    for _ci, zz in mcu_blocks():
        bw.write(int(zz[0]) & 1, 1)
    bw.flush()
    scan_dc2 = _sos_prog(all_comps, 0, 0, 1, 0) + bytes(bw.buf)

    # --- scans 6-8: per-component AC refinement
    ac_scans_refine = []
    for cid, blocks, codes in (
        (1, y_noint, _STD_AC_CODES),
        (2, cbb, _STD_AC_CHROMA_CODES),
        (3, crb, _STD_AC_CHROMA_CODES),
    ):
        bw = _BitWriter()
        _enc_ac_refine(bw, blocks, codes, 0)
        bw.flush()
        ta = 0x00 if cid == 1 else 0x01
        ac_scans_refine.append(_sos_prog([(cid, ta)], 1, 63, 1, 0) + bytes(bw.buf))

    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    return b"".join(
        [
            b"\xff\xd8",
            _seg(0xFFE0, _JFIF_APP0),
            _dqt(0, qt_y),
            _dqt(1, qt_c),
            _seg(0xFFC2, sof),
            _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
            _dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            _dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
            scan_dc1,
            *ac_scans_first,
            scan_dc2,
            *ac_scans_refine,
            b"\xff\xd9",
        ]
    )


def _finish_scan(r: _BitReader) -> int:
    """Check a finished scan sits at its terminating marker: only the
    final partial byte's padding may remain. Returns the byte offset
    of the marker's 0xFF."""
    if not r.at_scan_end():
        raise ValueError("scan data not exhausted at scan end")
    if r._end_marker is None:
        raise ValueError(r._end_reason or "truncated scan")
    return r._marker_pos


def _dec_ac_first_block(
    r: _BitReader, ac_tbl, coef_row: np.ndarray, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """Decode one block's AC-first band; returns the remaining eobrun."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_huff(r, ac_tbl)
        run, s = sym >> 4, sym & 0x0F
        if s == 0:
            if run == 15:
                k += 16
                if k > se + 1:
                    raise ValueError("ZRL overflows band")
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += r.read_bits(run)
            break
        k += run
        if k > se:
            raise ValueError("AC run overflows band")
        coef_row[k] = _extend(r.read_bits(s), s) << al
        k += 1
    return eobrun


def _dec_ac_refine_block(
    r: _BitReader, ac_tbl, coef_row: np.ndarray, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """Decode one block's AC-refinement band; returns remaining eobrun."""
    pos_bit = 1 << al
    neg_bit = -pos_bit
    # work on a plain Python list: this loop touches (almost) every
    # band coefficient per block, and CPython list indexing is several
    # times cheaper than numpy scalar indexing (r12; written back once)
    row = coef_row.tolist()

    def correct(k: int) -> None:
        if r.read_bit() and not (abs(row[k]) & pos_bit):
            row[k] += pos_bit if row[k] > 0 else neg_bit

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_huff(r, ac_tbl)
            run, s = sym >> 4, sym & 0x0F
            newval = 0
            if s == 0:
                if run != 15:  # EOBn
                    eobrun = 1 << run
                    if run:
                        eobrun += r.read_bits(run)
                    break
                # ZRL: exactly 16 zeros skipped — run 15 + terminal k++
            elif s == 1:
                newval = pos_bit if r.read_bit() else neg_bit
            else:
                raise ValueError("invalid refinement symbol")
            # advance: correct nonzero coefs along the way; break AT
            # the (run+1)-th zero (the slot the new value lands in;
            # the terminal k++ consumes it for ZRL)
            while k <= se:
                if row[k] != 0:
                    correct(k)
                else:
                    run -= 1
                    if run < 0:
                        break
                k += 1
            if newval:
                if k > se:
                    raise ValueError("refinement run overflows band")
                row[k] = newval
            k += 1
    if eobrun:
        # EOB run covers the REST of this block's band: correction
        # bits still arrive for nonzero-history coefficients
        while k <= se:
            if row[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    coef_row[ss : se + 1] = row[ss : se + 1]
    return eobrun


def _decode_progressive(b: bytes) -> tuple[int, int, list[dict]]:
    """Multi-scan progressive (SOF2) decode — grayscale or
    multi-component color: executes every scan in file order,
    accumulating per-component coefficient grids per Annex G
    successive approximation; returns the same component structure as
    the baseline path. Interleaved (ns > 1) scans must be DC-only and
    walk the MCU grid; single-component scans walk that component's
    ceil-dims grid mapped into its MCU-padded storage grid."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dims: tuple[int, int] | None = None
    frame_comps: list[tuple[int, int, int, int]] | None = None  # cid,hi,vi,tq
    dhts: dict[tuple[int, int], list[tuple[int, int]]] = {}
    comps_by_cid: dict[int, dict] = {}
    hmax = vmax = 1
    mcux = mcuy = 0
    saw_eoi = False
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = (b[pos] << 8) | b[pos + 1]
        if marker == 0xFFD9:
            saw_eoi = True
            break
        (ln,) = struct.unpack_from(">H", b, pos + 2)
        start = pos + 4
        seg_len = ln - 2
        if marker == 0xFFDB:
            p = start
            while p < start + seg_len:
                pq_tq = b[p]
                if pq_tq >> 4 != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int64)
                for k, (rr, cc) in enumerate(ZIGZAG):
                    tbl[rr, cc] = b[p + 1 + k]
                qts[pq_tq & 0x0F] = tbl
                p += 65
        elif marker == 0xFFC2:
            precision, hh, ww, ncomp = struct.unpack_from(">BHHB", b, start)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if seg_len < 6 + 3 * ncomp:
                raise ValueError("truncated SOF2 component list")
            dims = (ww, hh)
            frame_comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", b, start + 6 + 3 * i)
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("invalid sampling factors")
                frame_comps.append((cid, hi, vi, tq))
            hmax = max(hi for _, hi, _, _ in frame_comps)
            vmax = max(vi for _, _, vi, _ in frame_comps)
            mcux = (ww + 8 * hmax - 1) // (8 * hmax)
            mcuy = (hh + 8 * vmax - 1) // (8 * vmax)
            for cid, hi, vi, tq in frame_comps:
                if len(frame_comps) == 1:
                    bw_c = (ww * hi + 8 * hmax - 1) // (8 * hmax)
                    bh_c = (hh * vi + 8 * vmax - 1) // (8 * vmax)
                else:
                    bw_c, bh_c = mcux * hi, mcuy * vi
                comps_by_cid[cid] = {
                    "cid": cid,
                    "hi": hi,
                    "vi": vi,
                    "tq": tq,
                    "bw": bw_c,
                    "bh": bh_c,
                    # ceil-dims grid for non-interleaved scans (A.2.2)
                    "bw_n": (((ww * hi + hmax - 1) // hmax) + 7) // 8,
                    "bh_n": (((hh * vi + vmax - 1) // vmax) + 7) // 8,
                    "blocks": np.zeros((bh_c * bw_c, 64), dtype=np.int32),
                }
        elif marker == 0xFFC4:
            p = start
            while p < start + seg_len:
                tc_th = b[p]
                bits = list(b[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(b[p + 17 : p + 17 + nvals])
                dhts[(tc_th >> 4, tc_th & 0x0F)] = _huff_lut_cached(bits, vals)
                p += 17 + nvals
        elif marker == 0xFFDD:
            raise NotImplementedError("restart intervals in progressive scans")
        elif marker == 0xFFDA:
            if frame_comps is None or dims is None:
                raise ValueError("SOS before SOF2")
            ns = b[start]
            scan = []
            for i in range(ns):
                cid = b[start + 1 + 2 * i]
                tdta = b[start + 2 + 2 * i]
                if cid not in comps_by_cid:
                    raise ValueError("scan references unknown component")
                scan.append((comps_by_cid[cid], tdta >> 4, tdta & 0x0F))
            off = 1 + 2 * ns
            ss, se = b[start + off], b[start + off + 1]
            ah, al = b[start + off + 2] >> 4, b[start + off + 2] & 0x0F
            r = _BitReader(b, start + seg_len)
            if ns > 1:
                # interleaved scans are DC-only in progressive (G.1.1.1)
                if ss != 0 or se != 0:
                    raise ValueError("interleaved progressive scan must be DC")
                prev = {c["cid"]: 0 for c, _, _ in scan}
                for m in range(mcux * mcuy):
                    my, mx = divmod(m, mcux)
                    for c, td, _ta in scan:
                        for v in range(c["vi"]):
                            for hh2 in range(c["hi"]):
                                idx = (my * c["vi"] + v) * c["bw"] + (
                                    mx * c["hi"] + hh2
                                )
                                if ah == 0:
                                    dc_tbl = dhts.get((0, td))
                                    if dc_tbl is None:
                                        raise ValueError("missing DC table")
                                    s = _read_huff(r, dc_tbl)
                                    diff = (
                                        _extend(r.read_bits(s), s) if s else 0
                                    )
                                    prev[c["cid"]] += diff
                                    c["blocks"][idx, 0] = prev[c["cid"]] << al
                                else:
                                    c["blocks"][idx, 0] |= r.read_bit() << al
            else:
                c, td, ta = scan[0]
                # non-interleaved: the component's ceil-dims raster,
                # mapped into its (possibly wider) storage grid
                indices = [
                    row * c["bw"] + col
                    for row in range(c["bh_n"])
                    for col in range(c["bw_n"])
                ]
                if ss == 0:
                    if se != 0:
                        raise ValueError("DC scan must have Se = 0")
                    if ah == 0:
                        dc_tbl = dhts.get((0, td))
                        if dc_tbl is None:
                            raise ValueError("missing DC Huffman table")
                        prev_dc = 0
                        for idx in indices:
                            s = _read_huff(r, dc_tbl)
                            diff = _extend(r.read_bits(s), s) if s else 0
                            prev_dc += diff
                            c["blocks"][idx, 0] = prev_dc << al
                    else:
                        for idx in indices:
                            c["blocks"][idx, 0] |= r.read_bit() << al
                else:
                    ac_tbl = dhts.get((1, ta))
                    if ac_tbl is None:
                        raise ValueError("missing AC Huffman table")
                    eobrun = 0
                    if ah == 0:
                        for idx in indices:
                            eobrun = _dec_ac_first_block(
                                r, ac_tbl, c["blocks"][idx], ss, se, al, eobrun
                            )
                    else:
                        for idx in indices:
                            eobrun = _dec_ac_refine_block(
                                r, ac_tbl, c["blocks"][idx], ss, se, al, eobrun
                            )
            pos = _finish_scan(r)
            continue
        elif 0xFFC0 <= marker <= 0xFFCF and marker not in (0xFFC4, 0xFFC8, 0xFFCC):
            raise NotImplementedError("mixed SOF flavors unsupported")
        pos += 2 + ln
    if not saw_eoi:
        raise ValueError("truncated progressive JPEG (no EOI)")
    if frame_comps is None or dims is None:
        raise ValueError("no frame/scan data")
    w, h = dims
    out = []
    for cid, _hi, _vi, tq in frame_comps:
        c = comps_by_cid[cid]
        if tq not in qts:
            raise ValueError(f"missing quant table {tq}")
        out.append(
            {
                "cid": cid,
                "hi": c["hi"],
                "vi": c["vi"],
                "qt": qts[tq],
                "bw": c["bw"],
                "bh": c["bh"],
                "blocks": c["blocks"],
            }
        )
    return w, h, out
