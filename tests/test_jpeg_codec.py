"""Baseline JPEG codec (jpeg_codec.py) — the lossy-format contract.

BMP/PNG certify exact scanlines; JPEG cannot (it is lossy by
design), so its correctness is pinned from four independent angles:

1. the ENTROPY LAYER is lossless — the decoder's quantized
   coefficients must equal the encoder's bit for bit;
2. the DCT pair matches an independently-written naive cosine-sum
   implementation of the T.81 formulas;
3. pixel round-trip error is BOUNDED, with the synthetic-corpus max
   pinned exactly (2 at quality 90) so the registered bound (4) has
   known margin;
4. everything unsupported raises loudly (progressive, 16-bit
   tables, truncation, restart-marker sequence violations); color
   (YCbCr 4:2:0 MCU interleave) and restart intervals are REAL since
   r10 and carry their own bit-exactness sections below.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from flink_project_userbehavioranalysis_spark.operators import jpeg_codec as J
from flink_project_userbehavioranalysis_spark.operators import multimodal as MM
from tests.oracle import assert_matches_oracle


def _synth(n: int) -> np.ndarray:
    """The documents-table synthetic image: same closed form the
    DuckDB oracles use (w = n%31+1, h = n%17+1, row r = 32+(n+r)%95)."""
    w, h = n % 31 + 1, n % 17 + 1
    return np.array([[32 + (n + r) % 95] * w for r in range(h)], dtype=np.uint8)


# ------------------------------------------------------------- tables


def test_standard_tables_shape():
    assert sum(J.DC_LUMA_BITS) == len(J.DC_LUMA_VALS) == 12
    assert sum(J.AC_LUMA_BITS) == len(J.AC_LUMA_VALS) == 162
    assert len(J.ZIGZAG) == 64 and len(set(J.ZIGZAG)) == 64
    # spec zigzag prefix and terminal corner
    assert J.ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert J.ZIGZAG[-1] == (7, 7)


def test_canonical_huffman_known_codes_and_prefix_freedom():
    dc = J._huff_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac = J._huff_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    # Annex K: DC category 0 is '00' (2 bits); AC EOB is '1010',
    # ZRL (0xF0) is the 11-bit '11111111001'
    assert dc[0] == (0b00, 2)
    assert ac[0x00] == (0b1010, 4)
    assert ac[0xF0] == (0b11111111001, 11)
    for codes in (dc, ac):
        as_bits = {
            format(c, f"0{ln}b") for c, ln in codes.values()
        }
        assert len(as_bits) == len(codes)
        for a in as_bits:
            for b in as_bits:
                assert a == b or not b.startswith(a) or len(a) == len(b)


def test_quality_scaling_endpoints():
    assert (J.quality_scaled_qt(50) == J.BASE_LUMA_QT).all()
    assert (J.quality_scaled_qt(100) == 1).all()  # lossless-quant limit
    q10 = J.quality_scaled_qt(10)
    assert q10.max() <= 255 and q10.min() >= 1
    with pytest.raises(ValueError):
        J.quality_scaled_qt(0)


# ----------------------------------------------------- DCT vs naive


def _naive_dct(block: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 FDCT, written as the literal double sum (no matrix
    tricks) so it is an independent oracle for the matrix form."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


def test_dct_matrix_matches_naive_formula():
    rng = np.random.default_rng(11)
    block = rng.integers(0, 256, (8, 8)).astype(np.float64) - 128.0
    matrix_form = J._C @ block @ J._C.T
    assert np.allclose(matrix_form, _naive_dct(block), atol=1e-9)
    # inverse really inverts (orthonormality)
    assert np.allclose(J._C.T @ matrix_form @ J._C, block, atol=1e-9)


# ------------------------------------------------- bit I/O + stuffing


def test_bit_io_roundtrip_with_ff_stuffing():
    bw = J._BitWriter()
    values = [(0xFF, 8), (0xFF, 8), (0b101, 3), (0x3FFF, 14), (1, 1)]
    for v, ln in values:
        bw.write(v, ln)
    bw.flush()
    raw = bytes(bw.buf)
    # the two 0xFF bytes must be stuffed
    assert raw[:4] == b"\xff\x00\xff\x00"
    r = J._BitReader(raw, 0)
    for v, ln in values:
        assert r.read_bits(ln) == v


def test_bit_reader_raises_on_marker_and_truncation():
    r = J._BitReader(b"\xff\xd9", 0)
    with pytest.raises(ValueError, match="marker"):
        r.read_bits(8)
    r = J._BitReader(b"\xab", 0)
    r.read_bits(8)
    with pytest.raises(ValueError, match="truncated"):
        r.read_bit()


# ------------------------------------- entropy layer: exact round-trip


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (23, 37), (1, 1), (17, 31)])
@pytest.mark.parametrize("quality", [35, 75, 90])
def test_entropy_layer_bit_exact(shape, quality):
    """decode_jpeg_coeffs(encode_jpeg(img)) == forward_blocks(img):
    Huffman + zigzag + RLE + DC prediction are exactly invertible."""
    rng = np.random.default_rng(shape[0] * 100 + shape[1] + quality)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    payload = J.encode_jpeg(img, quality)
    w, h, qt, blocks = J.decode_jpeg_coeffs(payload)
    assert (w, h) == (shape[1], shape[0])
    assert (qt == J.quality_scaled_qt(quality)).all()
    padded = np.pad(
        img, ((0, (-shape[0]) % 8), (0, (-shape[1]) % 8)), mode="edge"
    )
    expected = J.forward_blocks(padded, J.quality_scaled_qt(quality))
    assert len(blocks) == len(expected)
    for a, b in zip(expected, blocks):
        assert (a == b).all()


def test_flat_images_near_exact():
    """A flat block is DC-only: mid-gray is exact, any value is
    within 1 count at quality 90 (DC quant step 3 over an 8x gain)."""
    assert (
        J.decode_jpeg(J.encode_jpeg(np.full((16, 16), 128, np.uint8), 90)) == 128
    ).all()
    for v in (0, 31, 97, 200, 255):
        img = np.full((8, 8), v, np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, 90))
        assert np.abs(out.astype(int) - int(v)).max() <= 1


def test_synthetic_corpus_error_bound_pinned():
    """Every document image (n covers the full observed octet-length
    range) round-trips within max-abs-error 2 at quality 90 — the
    registered jpeg_roundtrip bound of 4 has 2x margin."""
    mx = 0
    for n in range(0, 600):
        img = _synth(n)
        out = J.decode_jpeg(J.encode_jpeg(img, 90))
        assert out.shape == img.shape
        mx = max(mx, int(np.abs(out.astype(int) - img.astype(int)).max()))
    assert mx <= 2


def test_decode_meta_without_full_decode():
    img = _synth(123)
    w, h, precision, ncomp = J.decode_jpeg_meta(J.encode_jpeg(img, 90))
    assert (w, h) == (img.shape[1], img.shape[0])
    assert (precision, ncomp) == (8, 1)


# ------------------------------------------------ loud failure modes


def test_unsupported_flavors_raise():
    payload = bytearray(J.encode_jpeg(_synth(42), 90))
    i = bytes(payload).find(b"\xff\xc0")
    # extended sequential (SOF1) and other non-SOF0/SOF2 flavors raise
    sof1 = payload.copy()
    sof1[i + 1] = 0xC1
    with pytest.raises(NotImplementedError, match="SOF0/SOF2"):
        J.decode_jpeg_meta(bytes(sof1))
    # a LYING SOF2 marker on baseline scan data routes to the
    # progressive decoder, whose scan-header validation rejects the
    # baseline full-band DC+AC scan (progressive is real since r10, so
    # the old blanket rejection is gone — see the progressive section)
    prog = payload.copy()
    prog[i + 1] = 0xC2
    assert J.decode_jpeg_meta(bytes(prog))[3] == 1  # meta parses fine
    with pytest.raises(ValueError, match="DC scan"):
        J.decode_jpeg_components(bytes(prog))
    # restart intervals are SUPPORTED since r10 — but a DRI that
    # promises markers the stream doesn't contain must fail loudly:
    # splice interval-2 DRI into a marker-free 4-block scan
    j = bytes(payload).find(b"\xff\xda")
    dri = bytes(payload[:j]) + b"\xff\xdd\x00\x04\x00\x02" + bytes(payload[j:])
    with pytest.raises(ValueError, match="restart|RST"):
        J.decode_jpeg_coeffs(dri)
    # lying SOF0 Nf (claims 3 components but carries one entry):
    # truncated component list, raises loudly (r10: real multi-
    # component support means the old blanket "single-component"
    # rejection is gone — a VALID color payload now decodes)
    multi = payload.copy()
    multi[i + 9] = 3
    with pytest.raises(ValueError, match="truncated SOF0"):
        J.decode_jpeg_coeffs(bytes(multi))
    # 16-bit quant table: patch DQT Pq nibble
    k = bytes(payload).find(b"\xff\xdb")
    q16 = payload.copy()
    q16[k + 4] = 0x10
    with pytest.raises(NotImplementedError, match="16-bit"):
        J.decode_jpeg_coeffs(bytes(q16))
    # truncation inside the entropy stream
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(payload[: j + 20]))
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg_meta(b"BM123456")


def test_decode_real_dispatches_jpeg():
    img = _synth(7)
    payload = J.encode_jpeg(img, 90)
    w, h, bpp, data_size = MM.decode_real(payload, "image/jpeg")
    assert (w, h, bpp) == (img.shape[1], img.shape[0], 8)
    assert data_size == img.size
    with pytest.raises(NotImplementedError, match="not available"):
        MM.decode_real(b"\x00" * 16, "video/mp4")


# ------------------------------------------------ registered queries


def test_jpeg_meta_oracle(spark, sf_dir):
    assert_matches_oracle(MM.jpeg_meta(spark, sf_dir), MM.JPEG_META_SQL, sf_dir)


def test_jpeg_roundtrip_oracle_and_bound_honesty(spark, sf_dir):
    df = MM.jpeg_roundtrip(spark, sf_dir)
    assert_matches_oracle(df, MM.JPEG_ROUNDTRIP_SQL, sf_dir)
    # the boolean is a real measurement: every row must be computed
    # True, not defaulted — flipping the bound to 0 must flip rows
    # (the corpus contains non-flat images with nonzero loss)
    strict = MM.jpeg_roundtrip(spark, sf_dir, bound=0)
    n_false = strict.filter(~strict.max_err_le_4).count()
    assert n_false > 0


def test_overlong_entropy_stream_raises():
    """Trailing garbage between the scan and EOI must fail loudly —
    an over-long stream means the decoder's block count and the
    encoder's disagree."""
    payload = bytearray(J.encode_jpeg(_synth(9), 90))
    # splice two junk bytes just before EOI (0x55 cannot be mistaken
    # for a marker or stuffing)
    assert payload[-2:] == b"\xff\xd9"
    overlong = bytes(payload[:-2]) + b"\x55\x55" + b"\xff\xd9"
    with pytest.raises(ValueError, match="EOI"):
        J.decode_jpeg_coeffs(overlong)


# ------------------------------------------- color (YCbCr 4:2:0, r10)


def _synth_color(n: int) -> np.ndarray:
    """The color fixture (multimodal._color_image over _bmp_dims)."""
    w, h = n % 31 + 1, n % 17 + 1
    return MM._color_image(n, w, h)


def test_chroma_tables_shape():
    assert sum(J.DC_CHROMA_BITS) == len(J.DC_CHROMA_VALS) == 12
    assert sum(J.AC_CHROMA_BITS) == len(J.AC_CHROMA_VALS) == 162
    assert (J.BASE_CHROMA_QT[4:] == 99).all() and J.BASE_CHROMA_QT[0, 0] == 17


def test_ycbcr_roundtrip_tight():
    """JFIF color conversion: forward then inverse stays within the
    2-count rounding envelope of the uint8 plane quantization."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    back = J.ycbcr_to_rgb(*J.rgb_to_ycbcr(img))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 2
    # gray input: Cb = Cr = 128 exactly, Y = the gray value
    gray = np.stack([np.full((4, 4), 77, np.uint8)] * 3, axis=-1)
    y, cb, cr = J.rgb_to_ycbcr(gray)
    assert (y == 77).all() and (cb == 128).all() and (cr == 128).all()


@pytest.mark.parametrize("shape", [(16, 16), (17, 29), (1, 1), (23, 31), (8, 40)])
@pytest.mark.parametrize("quality", [50, 90])
def test_color_entropy_layer_bit_exact(shape, quality):
    """decode_jpeg_components(encode_jpeg_color(img)) reproduces the
    encoder's quantized coefficients bit for bit, PER COMPONENT — the
    MCU interleave, per-component DC predictors, and both Huffman
    table pairs are exactly invertible."""
    rng = np.random.default_rng(shape[0] * 1000 + shape[1] + quality)
    img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
    payload = J.encode_jpeg_color(img, quality)
    w, h, comps = J.decode_jpeg_components(payload)
    assert (w, h) == (shape[1], shape[0])
    assert [c["cid"] for c in comps] == [1, 2, 3]
    assert [(c["hi"], c["vi"]) for c in comps] == [(2, 2), (1, 1), (1, 1)]
    ph, pw = ((shape[0] + 15) // 16) * 16, ((shape[1] + 15) // 16) * 16
    padded = np.pad(
        img, ((0, ph - shape[0]), (0, pw - shape[1]), (0, 0)), mode="edge"
    )
    y, cb, cr = J.rgb_to_ycbcr(padded)

    def sub(p):
        m = p.astype(np.float64).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        return np.clip(np.rint(m), 0, 255).astype(np.uint8)

    qy = J.quality_scaled_qt(quality)
    qc = J.quality_scaled_qt(quality, J.BASE_CHROMA_QT)
    assert (comps[0]["qt"] == qy).all() and (comps[1]["qt"] == qc).all()
    expected = [
        np.stack(J.forward_blocks(y, qy)),
        np.stack(J.forward_blocks(sub(cb), qc)),
        np.stack(J.forward_blocks(sub(cr), qc)),
    ]
    for c, e in zip(comps, expected):
        assert np.array_equal(c["blocks"], e)


def test_color_meta_and_gray_coeffs_guard():
    payload = J.encode_jpeg_color(_synth_color(123), 90)
    w, h, precision, ncomp = J.decode_jpeg_meta(payload)
    assert (w, h) == (123 % 31 + 1, 123 % 17 + 1)
    assert (precision, ncomp) == (8, 3)
    # the grayscale coefficient seam refuses color payloads loudly
    with pytest.raises(NotImplementedError, match="multi-component"):
        J.decode_jpeg_coeffs(payload)


def test_color_flat_image_near_exact():
    """A flat color image: constant planes, chroma subsampling exact,
    so the round-trip error collapses to quantizer rounding."""
    img = np.empty((16, 16, 3), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 90, 140, 60
    out = J.decode_jpeg(J.encode_jpeg_color(img, 90))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_color_synthetic_corpus_error_bound_pinned():
    """Every color fixture for n in [0, 600) round-trips within
    max-abs-error 11 at quality 90; the exhaustive full-period scan
    over all 99,076 (n mod 188, w, h) classes measured 12, so the
    registered jpeg_color_roundtrip bound of 16 has known margin."""
    mx = 0
    for n in range(0, 600):
        img = _synth_color(n)
        out = J.decode_jpeg(J.encode_jpeg_color(img, 90))
        assert out.shape == img.shape
        mx = max(mx, int(np.abs(out.astype(int) - img.astype(int)).max()))
    assert mx <= 11


def test_color_decode_real_dispatch():
    img = _synth_color(31)
    w, h, bpp, data_size = MM.decode_real(J.encode_jpeg_color(img, 90), "image/jpeg")
    assert (w, h, bpp) == (img.shape[1], img.shape[0], 24)
    assert data_size == img.size  # h*w*3 decoded samples


def test_color_truncation_and_overlong_raise():
    payload = bytearray(J.encode_jpeg_color(_synth_color(5), 90))
    j = bytes(payload).find(b"\xff\xda")
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(payload[: j + 24]))
    assert payload[-2:] == b"\xff\xd9"
    overlong = bytes(payload[:-2]) + b"\x55\x55" + b"\xff\xd9"
    with pytest.raises(ValueError, match="EOI"):
        J.decode_jpeg_components(overlong)


def test_jpeg_color_roundtrip_oracle_and_bound_honesty(spark, sf_dir):
    df = MM.jpeg_color_roundtrip(spark, sf_dir)
    assert_matches_oracle(df, MM.JPEG_COLOR_ROUNDTRIP_SQL, sf_dir)
    strict = MM.jpeg_color_roundtrip(spark, sf_dir, bound=0)
    assert strict.filter(~strict.max_err_le_16).count() > 0


def test_decode_meta_mixed4_oracle(spark, sf_dir):
    assert_matches_oracle(
        MM.decode_meta_mixed4(spark, sf_dir), MM.DECODE_META_MIXED4_SQL, sf_dir
    )


# ------------------------------------------ restart intervals (r10)


@pytest.mark.parametrize("ri", [1, 2, 3, 7])
def test_restart_interval_gray_bit_exact(ri):
    """DRI/RSTm round trip (gray): the entropy layer stays bit-exact
    across restart boundaries — byte-aligned 1-bit padding, marker
    index cycling mod 8, DC predictors reset per interval."""
    rng = np.random.default_rng(100 + ri)
    img = rng.integers(0, 256, (33, 41)).astype(np.uint8)
    payload = J.encode_jpeg(img, 85, restart_interval=ri)
    assert b"\xff\xdd" in payload and b"\xff\xd0" in payload
    w, h, qt, blocks = J.decode_jpeg_coeffs(payload)
    padded = np.pad(img, ((0, (-33) % 8), (0, (-41) % 8)), mode="edge")
    expected = J.forward_blocks(padded, J.quality_scaled_qt(85))
    assert all((a == b).all() for a, b in zip(expected, blocks))


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_restart_interval_color_bit_exact(ri):
    """DRI/RSTm round trip (color): per-component coefficient grids
    equal the no-restart encode's grids exactly (same quant math; the
    restart structure only re-packages the entropy stream)."""
    rng = np.random.default_rng(200 + ri)
    img = rng.integers(0, 256, (34, 50, 3)).astype(np.uint8)
    _, _, comps = J.decode_jpeg_components(
        J.encode_jpeg_color(img, 90, restart_interval=ri)
    )
    _, _, comps0 = J.decode_jpeg_components(J.encode_jpeg_color(img, 90))
    for c, c0 in zip(comps, comps0):
        assert np.array_equal(c["blocks"], c0["blocks"])


def test_restart_marker_sequence_violation_raises():
    """A wrong RST index (dropped-marker resync scenario) must fail
    loudly, not desync silently."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (33, 41)).astype(np.uint8)
    payload = bytearray(J.encode_jpeg(img, 85, restart_interval=2))
    i = bytes(payload).find(b"\xff\xd0")
    payload[i + 1] = 0xD3
    with pytest.raises(ValueError, match="RST"):
        J.decode_jpeg_coeffs(bytes(payload))


# --------------------------------------- progressive (SOF2, r10)


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (23, 37), (1, 1), (33, 41)])
@pytest.mark.parametrize("quality", [20, 75, 90])
def test_progressive_coefficients_bit_exact(shape, quality):
    """Successive approximation is LOSSLESS on the quantized
    coefficients once every scan lands: the progressive decoder's
    accumulated grid equals forward_blocks bit for bit — DC
    first/refine (arithmetic point transform) and AC band
    first/refine (truncating point transform, EOB runs, buffered
    correction bits) are all exactly invertible."""
    rng = np.random.default_rng(shape[0] * 77 + shape[1] + quality)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    payload = J.encode_jpeg_progressive(img, quality)
    w, h, comps = J.decode_jpeg_components(payload)
    assert (w, h) == (shape[1], shape[0])
    padded = np.pad(
        img, ((0, (-shape[0]) % 8), (0, (-shape[1]) % 8)), mode="edge"
    )
    expected = np.stack(J.forward_blocks(padded, J.quality_scaled_qt(quality)))
    assert np.array_equal(comps[0]["blocks"], expected)


def test_progressive_decode_identical_to_baseline():
    """Same coefficients ⇒ same pixels: the progressive full decode
    is byte-identical to the baseline decode of the same image."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (29, 43)).astype(np.uint8)
    prog = J.decode_jpeg(J.encode_jpeg_progressive(img, 90))
    base = J.decode_jpeg(J.encode_jpeg(img, 90))
    assert np.array_equal(prog, base)
    # and meta reports SOF2 dims like any other flavor
    assert J.decode_jpeg_meta(J.encode_jpeg_progressive(img, 90)) == (43, 29, 8, 1)


def test_progressive_unsupported_flavors_raise():
    payload = bytearray(J.encode_jpeg_progressive(_synth(11), 90))
    # color progressive: patch Nf — truncated component list raises
    i = bytes(payload).find(b"\xff\xc2")
    multi = payload.copy()
    multi[i + 9] = 3
    with pytest.raises((NotImplementedError, ValueError)):
        J.decode_jpeg_components(bytes(multi))
    # truncation inside a scan
    j = bytes(payload).rfind(b"\xff\xda")
    with pytest.raises(ValueError):
        J.decode_jpeg_components(bytes(payload[: j + 12]))
    # no EOI
    with pytest.raises(ValueError, match="EOI|truncated"):
        J.decode_jpeg_components(bytes(payload[:-2]))


def test_jpeg_progressive_roundtrip_oracle(spark, sf_dir):
    df = MM.jpeg_progressive_roundtrip(spark, sf_dir)
    assert_matches_oracle(df, MM.JPEG_PROGRESSIVE_ROUNDTRIP_SQL, sf_dir)


@pytest.mark.parametrize("shape", [(16, 16), (17, 29), (1, 1), (34, 50)])
@pytest.mark.parametrize("quality", [50, 90])
def test_progressive_color_pixel_identical_to_baseline(shape, quality):
    """Eight-scan progressive color (interleaved DC first/refine +
    per-component AC first/refine over ceil-dims grids): the CROPPED
    pixel decode is byte-identical to the baseline color decode —
    successive approximation reconstructed every coefficient the
    non-interleaved grids cover, and MCU-pad blocks (DC-only flat)
    are entirely outside the crop."""
    rng = np.random.default_rng(shape[0] * 31 + shape[1] + quality)
    img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
    prog = J.decode_jpeg(J.encode_jpeg_color_progressive(img, quality))
    base = J.decode_jpeg(J.encode_jpeg_color(img, quality))
    assert np.array_equal(prog, base)


def test_progressive_color_coefficients_match_on_ceil_grid():
    """Per-component coefficient grids equal the baseline color
    encode's on the non-interleaved ceil(dims/8) raster (the blocks
    progressive AC scans cover; spec A.2.2)."""
    import math

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (17, 29, 3)).astype(np.uint8)
    _, _, comps = J.decode_jpeg_components(J.encode_jpeg_color_progressive(img, 90))
    _, _, base = J.decode_jpeg_components(J.encode_jpeg_color(img, 90))
    for c, cb in zip(comps, base):
        w_c = math.ceil(29 * c["hi"] / 2)
        h_c = math.ceil(17 * c["vi"] / 2)
        bwn, bhn = (w_c + 7) // 8, (h_c + 7) // 8
        a = c["blocks"].reshape(c["bh"], c["bw"], 64)[:bhn, :bwn]
        e = cb["blocks"].reshape(cb["bh"], cb["bw"], 64)[:bhn, :bwn]
        assert np.array_equal(a, e), c["cid"]


def test_progressive_interleaved_ac_scan_rejected():
    """Interleaved progressive scans must be DC-only (G.1.1.1): an
    SOS claiming a 3-component AC band raises."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    payload = bytearray(J.encode_jpeg_color_progressive(img, 90))
    # first SOS is the interleaved DC scan (ns=3); patch Ss/Se to an
    # AC band
    j = bytes(payload).find(b"\xff\xda")
    # SOS payload: len(2) ns(1) + 3*2 comps + Ss Se AhAl
    payload[j + 4 + 7] = 1   # Ss
    payload[j + 4 + 8] = 63  # Se
    with pytest.raises(ValueError, match="interleaved"):
        J.decode_jpeg_components(bytes(payload))
