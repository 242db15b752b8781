"""Dependency-free baseline JPEG codec (ITU-T T.81, public spec).

Closes the last honest codec stub in the multimodal pillar: r8 made
BMP real, r9 made PNG/WAV/AVI real, and ``decode_real`` still raised
``NotImplementedError`` for ``image/jpeg``. This module implements
baseline sequential DCT JPEG for 8-bit GRAYSCALE (one component, no
subsampling, no restart intervals) from the public spec alone:

* forward/inverse 8x8 DCT via the orthonormal DCT-II matrix (numpy),
* the Annex K.1 luminance quantization table with IJG quality
  scaling,
* the Annex K.3 standard DC/AC luminance Huffman tables (canonical
  code construction per Annex C),
* zigzag coefficient ordering, differential DC, run-length AC with
  ZRL/EOB, MSB-first bit packing with 0xFF byte stuffing,
* a full marker writer/parser (SOI/APP0/DQT/SOF0/DHT/SOS/EOI).

JPEG is lossy, so unlike the BMP/PNG scanline oracles the pixel
round-trip is certified by a BOUND (see ``multimodal.jpeg_roundtrip``)
plus an EXACT losslessness check of the entropy layer: the decoder's
quantized coefficients must equal the encoder's bit for bit
(``tests/test_jpeg_codec.py``). Anything the codec does not support
(progressive SOF2, multi-component, restart markers, 12-bit) raises
loudly instead of guessing.

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

#: Annex K.3.1 — standard DC luminance Huffman spec (BITS, HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))

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


def quality_scaled_qt(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex K.1 table: scale = 5000/Q for
    Q < 50 else 200 - 2Q; each entry floor((base*scale + 50)/100),
    clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (BASE_LUMA_QT * scale + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int64)


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
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (spec F.1.2.3)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


class _BitReader:
    """MSB-first bit reader that un-stuffs 0xFF 0x00 and raises on a
    real marker inside the entropy stream (no restart support).

    Windowed for speed: ``peek(16)`` feeds the Huffman LUT in one
    lookup instead of a per-bit tree walk. Peeking past the end of
    real data pads with virtual 1-bits (so the final code of a scan
    can be looked up), but CONSUMING virtual bits raises — a code
    that needs padding bits means the stream is truncated or a marker
    interrupted it."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._win = 0
        self._n = 0  # total bits in window (real + virtual pad)
        self._real = 0  # real bits (always the window head)
        self._end_reason: str | None = None
        self._end_marker: int | None = None  # marker that ended the scan

    def _fill(self, need: int) -> None:
        while self._n < need:
            byte = None
            if self._end_reason is None and self.pos < len(self.data):
                c = self.data[self.pos]
                if c == 0xFF:
                    nxt = (
                        self.data[self.pos + 1]
                        if self.pos + 1 < len(self.data)
                        else None
                    )
                    if nxt == 0x00:
                        byte = 0xFF
                        self.pos += 2
                    else:
                        self._end_reason = "marker inside entropy-coded stream"
                        if nxt is not None:
                            self._end_marker = 0xFF00 | nxt
                else:
                    byte = c
                    self.pos += 1
            elif self._end_reason is None:
                self._end_reason = "truncated entropy-coded stream"
            if byte is None:
                self._win = (self._win << 8) | 0xFF  # virtual pad
                self._n += 8
            else:
                self._win = (self._win << 8) | byte
                self._n += 8
                self._real += 8

    def peek(self, k: int) -> int:
        self._fill(k)
        return (self._win >> (self._n - k)) & ((1 << k) - 1)

    def consume(self, k: int) -> None:
        if k > self._real:
            raise ValueError(self._end_reason or "truncated entropy-coded stream")
        self._n -= k
        self._real -= k
        self._win &= (1 << self._n) - 1

    def read_bits(self, n: int) -> int:
        v = self.peek(n) if n else 0
        if n:
            self.consume(n)
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)


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


# ---------------------------------------------------------- encoder


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode a (h, w) uint8 grayscale array as a baseline sequential
    JFIF JPEG (one component, 8-bit, no subsampling, no restarts).
    Non-multiple-of-8 dimensions are edge-replicated to the block
    grid; the decoder crops back using the SOF0 dimensions."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("expected a (h, w) uint8 grayscale array")
    h, w = img.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("dimensions out of JPEG range")
    qt = quality_scaled_qt(quality)
    pad_h, pad_w = (-h) % 8, (-w) % 8
    padded = np.pad(img, ((0, pad_h), (0, pad_w)), mode="edge")

    dc_codes = _STD_DC_CODES
    ac_codes = _STD_AC_CODES
    bw = _BitWriter()
    prev_dc = 0
    for zz in forward_blocks(padded, qt):
        diff = int(zz[0]) - prev_dc
        prev_dc = int(zz[0])
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
    bw.flush()

    # DQT payload is stored in ZIGZAG order (spec B.2.4.1).
    qt_zz = bytes(int(qt[r, c]) for r, c in ZIGZAG)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(table_class: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xFFC4, bytes([table_class << 4]) + bytes(bits) + bytes(vals)
        )

    return b"".join(
        [
            b"\xff\xd8",  # SOI
            seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
            seg(0xFFDB, b"\x00" + qt_zz),
            seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"),
            dht(0, DC_LUMA_BITS, DC_LUMA_VALS),
            dht(1, AC_LUMA_BITS, AC_LUMA_VALS),
            seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00"),
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
    frame header. Progressive (SOF2) and every other SOF flavor raise
    — this codec is explicitly baseline-only."""
    for marker, start, ln in _walk_segments(b):
        if marker == 0xFFC0:
            precision, h, w, ncomp = struct.unpack_from(">BHHB", b, start)
            return w, h, precision, ncomp
        if 0xFFC1 <= marker <= 0xFFCF and marker not in (0xFFC4, 0xFFC8, 0xFFCC):
            raise NotImplementedError(
                f"only baseline SOF0 is supported (got {marker:#06x})"
            )
    raise ValueError("no SOF0 frame header")


def decode_jpeg_coeffs(
    b: bytes,
) -> tuple[int, int, np.ndarray, list[np.ndarray]]:
    """Entropy-decode the scan WITHOUT the inverse DCT: returns
    (width, height, quant_table_8x8, zigzag coefficient vectors, one
    per block in row-major block order). This is the exact-losslessness
    seam the tests compare bit-for-bit against ``forward_blocks``."""
    qt: np.ndarray | None = None
    dims: tuple[int, int] | None = None
    dc_tbl: list[tuple[int, int]] | None = None
    ac_tbl: list[tuple[int, int]] | None = None
    scan_start = None
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
                if pq_tq & 0x0F == 0:
                    qt = tbl
                p += 65
        elif marker == 0xFFC0:
            precision, h, w, ncomp = struct.unpack_from(">BHHB", b, start)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if ncomp != 1:
                raise NotImplementedError("only single-component (grayscale)")
            dims = (w, h)
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
                if tc_th == 0x00:
                    dc_tbl = _huff_lut_cached(bits, vals)
                elif tc_th == 0x10:
                    ac_tbl = _huff_lut_cached(bits, vals)
                p += 17 + nvals
        elif marker == 0xFFDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xFFDA:
            scan_start = start + ln
    if qt is None or dims is None or dc_tbl is None or ac_tbl is None:
        raise ValueError("missing DQT/SOF0/DHT before SOS")
    if scan_start is None:
        raise ValueError("no scan data")
    w, h = dims
    n_blocks = ((h + 7) // 8) * ((w + 7) // 8)
    r = _BitReader(b, scan_start)
    blocks: list[np.ndarray] = []
    prev_dc = 0
    for _ in range(n_blocks):
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
        blocks.append(zz)
    # the scan must terminate at EOI right after the final block — an
    # over-long entropy stream (extra blocks, trailing garbage) is a
    # decode error, not a silent success. Pull the reader forward to
    # the terminating marker: only the final byte's padding bits
    # (< 8 real bits) may remain unconsumed, and the marker must be
    # EOI.
    while r._end_reason is None and r._real < 24:
        r._fill(r._n + 8)
    if r._real > 7 or r._end_marker != 0xFFD9:
        raise ValueError("entropy stream does not end at EOI")
    return w, h, qt, blocks


def decode_jpeg(b: bytes) -> np.ndarray:
    """Full decode: entropy layer + dequantize + IDCT + crop to the
    SOF0 dimensions. Returns (h, w) uint8."""
    w, h, qt, blocks = decode_jpeg_coeffs(b)
    bw = (w + 7) // 8
    bh = (h + 7) // 8
    px = _inverse_blocks(np.stack(blocks), qt)  # batched IDCT
    img = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return img[:h, :w]
