"""Compressed-audio codecs: G.711 μ-law spec identities, IMA ADPCM
state-machine pinning (scalar ↔ vectorized), container round-trips,
and oracle parity for the registered surfaces."""

from __future__ import annotations

import numpy as np
import pytest

from flink_project_userbehavioranalysis_spark.operators import audio_codecs as A
from tests.conftest import SF_DIR_MID
from tests.oracle import assert_matches_oracle

# ------------------------------------------------------------- μ-law


def test_ulaw_code_identity():
    """compress(expand(code)) == code for all 256 codes except 0x7F
    (negative zero collapses onto positive zero 0xFF — the spec's one
    non-injective point)."""
    codes = np.arange(256, dtype=np.int64)
    rt = A.ulaw_compress(A.ulaw_expand(codes))
    mism = [(int(c), int(r)) for c, r in zip(codes, rt) if r != c]
    assert mism == [(0x7F, 0xFF)]


def test_ulaw_quantization_error_segment_bound():
    """|expand(compress(s)) − s| ≤ 2^seg for every 14-bit input (the
    half-step bound per segment), with the global max exactly 128 in
    the top segment."""
    s = np.arange(-A._ULAW_CLIP, A._ULAW_CLIP + 1, dtype=np.int64)
    dec = A.ulaw_expand(A.ulaw_compress(s))
    err = np.abs(dec - s)
    m = np.minimum(np.abs(s), A._ULAW_CLIP) + 33
    seg = np.searchsorted(A._ULAW_SEG_ENDS, m, side="left")
    assert (err <= (1 << seg)).all()
    assert int(err.max()) == 128


def test_ulaw_monotone_on_magnitudes():
    """Decoded magnitude is non-decreasing in source magnitude — a
    broken segment boundary would produce an inversion."""
    s = np.arange(0, A._ULAW_CLIP + 1, dtype=np.int64)
    dec = A.ulaw_expand(A.ulaw_compress(s))
    assert (np.diff(dec) >= 0).all()


def test_g711_wav_roundtrip_values():
    """Full WAV hop: encode → RIFF walk → expand equals the direct
    compress∘expand of the closed-form signal."""
    for n in [0, 48, 257, 553]:
        b = A.encode_wav_g711(b"x" * n)
        got = A.decode_wav_g711(b)
        src = A._g711_sample(n, np.arange(A._wav_n_samples(n), dtype=np.int64))
        want = A.ulaw_expand(A.ulaw_compress(src))
        assert np.array_equal(got, want)


def test_g711_fact_chunk_and_format_tag():
    b = A.encode_wav_g711(b"y" * 10)
    fmt, ch, rate, bits, ns, data = A.wav_meta_any(b)
    assert (fmt, ch, rate, bits) == (7, 1, 8000, 8)
    assert ns == A._wav_n_samples(10)
    assert len(data) == ns  # one code byte per sample


# --------------------------------------------------------------- ADPCM


def test_adpcm_scalar_equals_vectorized_both_directions():
    """The cross-stream vectorized encoder/decoder replicate the
    scalar reference state machine bit-for-bit, mixed lengths."""
    sigs = [
        A._adpcm_sample(n, np.arange(A._wav_n_samples(n), dtype=np.int64))
        for n in [0, 48, 257, 553, 100]
    ]
    enc_s = [A.adpcm_encode_blocks(x) for x in sigs]
    enc_b = A.adpcm_encode_batch(sigs)
    assert all(a == b for a, b in zip(enc_s, enc_b))
    dec_s = [A.adpcm_decode(e, len(x)) for e, x in zip(enc_s, sigs)]
    dec_b = A.adpcm_decode_batch(enc_b, [len(x) for x in sigs])
    assert all(np.array_equal(a, b) for a, b in zip(dec_s, dec_b))


def test_adpcm_block_headers_carry_exact_first_sample():
    """Every block's header sample is bit-exact (raw int16), so block
    boundaries never accumulate drift and each block decodes
    independently (the seek contract)."""
    n = 553
    sig = A._adpcm_sample(n, np.arange(A._wav_n_samples(n), dtype=np.int64))
    dec = A.adpcm_decode(A.adpcm_encode_blocks(sig), len(sig))
    assert np.array_equal(dec[:: A._ADPCM_SPB], sig[:: A._ADPCM_SPB])


def test_adpcm_reconstruction_bound_on_corpus_classes():
    """Max reconstruction error over every payload-size class the
    corpus can produce (n % 50 × n % 8000 interact; sweep a spread of
    n) stays within the registered bound with ≥2× margin."""
    worst = 0
    for n in range(0, 700, 7):
        sig = A._adpcm_sample(n, np.arange(A._wav_n_samples(n), dtype=np.int64))
        dec = A.adpcm_decode(A.adpcm_encode_blocks(sig), len(sig))
        worst = max(worst, int(np.abs(dec - sig).max()))
    assert worst * 2 <= A._ADPCM_BOUND, worst


def test_adpcm_step_tables_are_spec_constants():
    assert len(A._IMA_STEPS) == 89
    assert int(A._IMA_STEPS[0]) == 7 and int(A._IMA_STEPS[-1]) == 32767
    assert A._IMA_INDEX_ADJ.tolist() == [-1, -1, -1, -1, 2, 4, 6, 8]
    # step table is strictly increasing (a corrupted entry breaks
    # monotone adaptation)
    assert (np.diff(A._IMA_STEPS) > 0).all()


def test_adpcm_wav_container_fields():
    b = A.encode_wav_adpcm(b"z" * 20)
    fmt, ch, _rate, bits, ns, data = A.wav_meta_any(b)
    assert (fmt, ch, bits) == (0x11, 1, 4)
    assert ns == A._wav_n_samples(20)
    n_blocks = (ns + A._ADPCM_SPB - 1) // A._ADPCM_SPB
    full, rem = divmod(ns, A._ADPCM_SPB)
    expect_len = full * A._ADPCM_BLOCK_ALIGN
    if rem:
        expect_len += 4 + (rem - 1 + 1) // 2
    assert len(data) == expect_len, (len(data), expect_len, n_blocks)


# ------------------------------------------------------ registered surfaces


def test_audio_features_mulaw_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        A.audio_features_mulaw(spark, sf_dir),
        A.audio_features_mulaw_oracle_sql(),
        sf_dir,
    )


def test_adpcm_roundtrip_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        A.adpcm_roundtrip(spark, sf_dir), A.adpcm_roundtrip_oracle_sql(), sf_dir
    )


def test_adpcm_roundtrip_bound_actually_checked(spark, sf_dir):
    """All emitted bound booleans are True AND the column is computed
    (not constant-folded): poison one decode path via a crafted tiny
    frame to show a violation is representable."""
    rows = A.adpcm_roundtrip(spark, sf_dir).collect()
    assert rows and all(r["max_err_le_8"] for r in rows)
    # representability: a deliberately wrong signal fails the bound
    sig = A._adpcm_sample(5, np.arange(512, dtype=np.int64))
    dec = A.adpcm_decode(A.adpcm_encode_blocks(sig), 512)
    assert int(np.abs(dec - (sig + 100)).max()) > A._ADPCM_BOUND


# --------------------------------------------------------- empty input


def test_codecs_total_on_empty_frame(spark):
    import pyspark.sql.functions as FF

    docs = spark.createDataFrame(
        [], "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT"
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    for t in ["events"]:
        spark.createDataFrame([], "event_id BIGINT, ts TIMESTAMP").write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{t}.parquet"))
    assert A.audio_features_mulaw(spark, d).count() == 0
    assert A.adpcm_roundtrip(spark, d).count() == 0


# --------------------------------------------------------------- A-law


def test_alaw_code_identity_all_256():
    """A-law has no negative-zero collapse (segment 0 outputs are the
    odd midpoints ±1, ±3, …), so ALL 256 codes roundtrip."""
    codes = np.arange(256, dtype=np.int64)
    assert np.array_equal(A.alaw_compress(A.alaw_expand(codes)), codes)


def test_alaw_quantization_error_segment_bound():
    """|expand(compress(s)) − s| ≤ 1 in segment 0 and ≤ 2^(seg−1)
    above (half-step per segment), global max 64."""
    s = np.arange(-A._ALAW_CLIP, A._ALAW_CLIP + 1, dtype=np.int64)
    err = np.abs(A.alaw_expand(A.alaw_compress(s)) - s)
    m = np.minimum(np.abs(s), A._ALAW_CLIP)
    seg = np.searchsorted(A._ALAW_SEG_ENDS, m, side="left")
    bound = np.where(seg == 0, 1, 1 << np.maximum(seg - 1, 0))
    assert (err <= bound).all()
    assert int(err.max()) == 64


def test_alaw_wav_roundtrip_values():
    for n in [0, 48, 257, 553]:
        b = A.encode_wav_alaw(b"x" * n)
        got = A.decode_wav_alaw(b)
        src = A._alaw_sample(n, np.arange(A._wav_n_samples(n), dtype=np.int64))
        assert np.array_equal(got, A.alaw_expand(A.alaw_compress(src)))
    fmt, ch, rate, bits, ns, _ = A.wav_meta_any(A.encode_wav_alaw(b"y" * 9))
    assert (fmt, ch, rate, bits) == (6, 1, 8000, 8)


def test_audio_features_alaw_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        A.audio_features_alaw(spark, sf_dir),
        A.audio_features_alaw_oracle_sql(),
        sf_dir,
    )


def test_audio_features_mulaw_stream_equals_batch(spark, sf_dir):
    """The at-ingest streaming projection equals the batch surface
    exactly (shared projection, append mode, zero state)."""
    from flink_project_userbehavioranalysis_spark.streaming import windowed as W

    streamed = sorted(
        map(tuple, W.audio_features_mulaw_stream(spark, sf_dir).collect())
    )
    batch = sorted(map(tuple, A.audio_features_mulaw(spark, sf_dir).collect()))
    assert streamed == batch
