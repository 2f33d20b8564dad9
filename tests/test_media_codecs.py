"""Byte-level round-trips for the from-scratch BMP/WAV codecs and the
real decode stage (constant-pattern parity is driver-hash-verified via
l9d_real_decode's closed-form oracle; these cover gradients, sines,
padding edge cases, and malformed payloads)."""

import numpy as np
import pytest

from ipydataclean_spark.operators.media_codecs import (
    decode_bmp,
    decode_media,
    decode_wav_pcm16,
    encode_bmp,
    encode_wav_pcm16,
)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (5, 4), (7, 2)])
def test_bmp_roundtrip_gradient(w, h):
    """Non-multiple-of-4 widths exercise the row-padding path."""
    rng = np.random.RandomState(42 + w * 10 + h)
    px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    back = decode_bmp(encode_bmp(px))
    np.testing.assert_array_equal(back, px)


def test_wav_roundtrip_sine():
    t = np.arange(4000)
    s = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    back, rate = decode_wav_pcm16(encode_wav_pcm16(s, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(back, s)


def test_wav_tolerates_extra_chunk():
    """Spec-conformant decoders walk the chunk list — a LIST chunk
    before data must not break parsing."""
    import struct

    s = np.array([1, -2, 3], dtype=np.int16)
    raw = encode_wav_pcm16(s, 8000)
    # splice an extra chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    patched = raw[:fmt_end] + extra + raw[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    back, rate = decode_wav_pcm16(patched)
    np.testing.assert_array_equal(back, s)


def test_decode_stage_flags_malformed_not_fails(spark):
    """Poison-pill guard: garbage, truncated, and unsupported payloads
    produce ok=0 rows; the stage never raises."""
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good_bmp = encode_bmp(px)
    rows = [
        (1, "image/bmp", bytearray(good_bmp)),
        (2, "image/bmp", bytearray(b"NOTABMP")),
        (3, "image/bmp", bytearray(good_bmp[:20])),  # truncated header
        (4, "audio/wav", bytearray(b"RIFFxxxxJUNK")),
        (5, "video/mp4", bytearray(b"\x00\x00\x00\x18ftyp")),  # unsupported
    ]
    media = spark.createDataFrame(rows, "doc_id LONG, mime STRING, payload BINARY")
    got = {r.doc_id: r for r in decode_media(media).collect()}
    assert got[1].ok == 1 and got[1].width == 2 and got[1].mean_r == 0.0
    for d in (2, 3, 4, 5):
        assert got[d].ok == 0, d


def test_decode_stage_gradient_stats(spark):
    """Decoded means/rms match numpy ground truth for non-constant
    content (the closed-form oracle only covers constants)."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(6, 5, 3)).astype(np.uint8)
    t = np.arange(1000)
    s = (5000 * np.sin(2 * np.pi * t / 50)).astype(np.int16)
    media = spark.createDataFrame(
        [
            (1, "image/bmp", bytearray(encode_bmp(px))),
            (2, "audio/wav", bytearray(encode_wav_pcm16(s, 16000))),
        ],
        "doc_id LONG, mime STRING, payload BINARY",
    )
    got = {r.doc_id: r for r in decode_media(media).collect()}
    m = px.reshape(-1, 3).mean(axis=0)
    assert got[1].mean_r == pytest.approx(m[0], abs=1e-6)
    assert got[1].mean_g == pytest.approx(m[1], abs=1e-6)
    assert got[1].mean_b == pytest.approx(m[2], abs=1e-6)
    assert got[2].sample_rate == 16000
    assert got[2].rms == pytest.approx(
        float(np.sqrt((s.astype("f8") ** 2).mean())), abs=1e-6
    )
