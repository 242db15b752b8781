"""GIF89a codec: the LZW entropy layer is LOSSLESS, so every check is
bit-exact — roundtrip fuzz across the width-growth boundaries and the
4096-table reset, the KwKwK special case, both interlace schedules, a
published conformance vector decoded with no self-consistency escape
hatch, and the raise-loudly contract for malformed streams. The Spark
surfaces (gif_roundtrip, decode_meta_mixed7) are oracle-checked in
test_multimodal / the registry gate."""

import random

import pytest

from flink_project_userbehavioranalysis_spark.operators.gif_codec import (
    _interlaced_row_order,
    decode_gif_meta,
    encode_gif,
    gif_pixel_rows,
    gif_rgb_row,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrip_across_width_growth_and_reset():
    """Sizes chosen so the code stream crosses 9->10->11->12 bits and,
    at 120k random bytes, the 4096-entry table reset (the dictionary
    fills fastest on high-entropy input)."""
    rng = random.Random(7)
    for size in [0, 1, 10, 500, 3000, 20000, 120000]:
        for alphabet in [2, 17, 256]:
            data = bytes(rng.randrange(alphabet) for _ in range(size))
            assert lzw_decode(lzw_encode(data, 8), 8) == data, (size, alphabet)


def test_lzw_small_min_code_sizes():
    rng = random.Random(11)
    for mcs in [2, 4, 6]:
        data = bytes(rng.randrange(1 << mcs) for _ in range(5000))
        assert lzw_decode(lzw_encode(data, mcs), mcs) == data, mcs


def test_lzw_kwkwk_and_runs():
    """Long runs drive the prev+prev[0] (KwKwK) decode path — the code
    that references the table slot being defined by itself."""
    for pat in [b"\x00" * 9999, b"abab" * 4000, bytes(range(256)) * 64]:
        assert lzw_decode(lzw_encode(pat, 8), 8) == pat


def test_container_roundtrip_both_interlace_modes():
    rng = random.Random(3)
    for w, h in [(1, 1), (31, 17), (64, 64), (13, 5), (200, 33)]:
        rows = [bytes(rng.randrange(256) for _ in range(w)) for _ in range(h)]
        for il in (False, True):
            b = encode_gif(rows, w, h, interlace=il)
            assert decode_gif_meta(b) == (w, h, 256, il)
            assert gif_pixel_rows(b) == rows, (w, h, il)


def test_interlace_schedule_is_the_spec_four_pass():
    """Pin the pass table itself (appendix E), not just encoder/decoder
    agreement — a schedule bug shared by both sides would otherwise
    self-cancel in roundtrips."""
    assert _interlaced_row_order(17) == [
        0, 8, 16,       # pass 1: every 8th from 0
        4, 12,          # pass 2: every 8th from 4
        2, 6, 10, 14,   # pass 3: every 4th from 2
        1, 3, 5, 7, 9, 11, 13, 15,  # pass 4: odd rows
    ]
    assert _interlaced_row_order(1) == [0]


def _canonical_vector() -> bytes:
    """The widely-published minimal GIF89a: 1x1 white pixel, 2-entry
    global color table, LZW min code size 2, codes CLEAR(4) 0 EOI(5)
    packed LSB-first into 0x44 0x01. Decoding it correctly requires
    the real bit order, code table layout, and block framing — no
    roundtrip self-consistency can fake it."""
    return bytes.fromhex(
        "474946383961"            # signature
        "0100" "0100" "80" "00" "00"  # logical screen 1x1, GCT 2 entries
        "ffffff" "000000"         # GCT
        "2c" "0000" "0000" "0100" "0100" "00"  # image descriptor
        "02" "02" "4401" "00"     # mcs=2, one 2-byte sub-block, terminator
        "3b"                      # trailer
    )


def test_canonical_published_vector():
    v = _canonical_vector()
    assert decode_gif_meta(v) == (1, 1, 2, False)
    assert gif_pixel_rows(v) == [b"\x00"]
    assert gif_rgb_row(v, b"\x00") == b"\xff\xff\xff"


def test_malformed_payloads_raise():
    rows = [bytes([7]) * 5 for _ in range(3)]
    good = encode_gif(rows, 5, 3)
    with pytest.raises(ValueError):
        decode_gif_meta(b"NOTGIF" + good[6:])
    with pytest.raises(ValueError):
        gif_pixel_rows(good[:-1])  # trailer gone
    # truncate inside the LZW sub-blocks: splice the data block short
    with pytest.raises(ValueError):
        truncated = bytearray(good)
        # zero out the sub-block length chain mid-stream: claim a
        # 200-byte block where few bytes remain
        truncated[13 + 768 + 10 + 1] = 200
        gif_pixel_rows(bytes(truncated))
    with pytest.raises(ValueError):
        gif_rgb_row(_canonical_vector(), b"\x05")  # index beyond 2-entry GCT
    with pytest.raises(ValueError):
        encode_gif(rows, 5, 2)  # row plan / dims mismatch


def test_lzw_code_beyond_table_raises():
    # CLEAR then an out-of-range code: 9-bit codes, clear=256, eoi=257,
    # code 300 with an empty table is invalid (first must be literal)
    from flink_project_userbehavioranalysis_spark.operators.gif_codec import (
        _LsbBitWriter,
    )

    bw = _LsbBitWriter()
    bw.write(256, 9)
    bw.write(300, 9)
    with pytest.raises(ValueError):
        lzw_decode(bw.flush(), 8)
