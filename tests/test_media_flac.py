"""Pins for the from-scratch FLAC codec (operators/media_flac.py).

Losslessness is the format's defining property, so the core pins are
BIT-EXACT round-trips across signal shapes; hand-built frames pin the
decoder paths our encoder never emits (LPC prediction, Rice escape
partitions, the 5-bit parameter method); CRC corruption and
truncation raise."""

import struct

import numpy as np
import pytest

from ipydataclean_spark.operators.media_flac import (
    _BW,
    _crc8,
    _crc16,
    _utf8_number,
    decode_flac,
    encode_flac,
)


@pytest.mark.parametrize(
    "name,sig",
    [
        ("constant", np.full(1000, 123, np.int16)),
        ("sine", None),  # built below (parametrize can't hold arrays cleanly)
        ("noise", None),
        ("square", np.where(np.arange(800) % 2 == 0, 700, -700).astype(np.int16)),
        ("edge", np.array([32767, -32768, 0, 1, -1] * 50, np.int16)),
        ("one-sample", np.array([5], np.int16)),
        ("multi-frame", None),
    ],
)
def test_roundtrip_bit_exact(name, sig):
    if name == "sine":
        sig = (12000 * np.sin(2 * np.pi * 440 * np.arange(5000) / 8000)).astype(np.int16)
    elif name == "noise":
        sig = np.random.RandomState(5).randint(-32768, 32768, 3000).astype(np.int16)
    elif name == "multi-frame":
        sig = (3000 * np.sin(np.arange(10000) / 30)).astype(np.int16)
    back, rate = decode_flac(encode_flac(sig, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(back, sig)


def test_compresses_smooth_signals():
    """Losslessness without compression would be pointless: a sine
    must code smaller than raw PCM16 (observed ~77%)."""
    sig = (12000 * np.sin(2 * np.pi * 440 * np.arange(5000) / 8000)).astype(np.int16)
    assert len(encode_flac(sig, 8000)) < 2 * sig.size


def test_crc_corruption_detected():
    sig = (3000 * np.sin(np.arange(2000) / 10)).astype(np.int16)
    data = bytearray(encode_flac(sig, 8000))
    data[-10] ^= 0x40  # flip a bit in the last frame's body
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(data))


def test_truncation_and_bad_magic_raise():
    sig = np.arange(-500, 500, dtype=np.int16)
    data = encode_flac(sig, 8000)
    with pytest.raises(ValueError):
        decode_flac(b"NOTFLAC")
    with pytest.raises(ValueError):
        decode_flac(data[: len(data) - 7])


def test_utf8_frame_numbers():
    """The UTF-8-style frame index must round-trip for multi-byte
    values (frame 0..n for long streams)."""
    from ipydataclean_spark.operators.media_flac import _BR, _read_utf8_number

    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 1 << 20):
        enc = _utf8_number(n)
        assert _read_utf8_number(_BR(enc)) == n


def _hand_frame(subframe_bits, bs, expect, streaminfo_n=None):
    """Assemble a spec-valid single-frame FLAC stream around hand-built
    subframe bits and assert decode equals ``expect``."""
    si = _BW()
    si.w(bs, 16); si.w(bs, 16); si.w(0, 24); si.w(0, 24)
    si.w(8000, 20); si.w(0, 3); si.w(15, 5)
    si.w(streaminfo_n if streaminfo_n is not None else bs, 36)
    si.align()
    streaminfo = bytes(si.out) + bytes(16)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    out += streaminfo
    hdr = _BW()
    hdr.w(0x3FFE, 14); hdr.w(0, 1); hdr.w(0, 1)
    hdr.w(0b0111, 4); hdr.w(0, 4); hdr.w(0, 4); hdr.w(0b100, 3); hdr.w(0, 1)
    hdr.align()
    hdr_bytes = bytes(hdr.out) + _utf8_number(0) + struct.pack(">H", bs - 1)
    hdr_bytes += bytes([_crc8(hdr_bytes)])
    frame = hdr_bytes + bytes(subframe_bits.out)
    data = bytes(out) + frame + struct.pack(">H", _crc16(frame))
    got, rate = decode_flac(data)
    np.testing.assert_array_equal(got, np.array(expect, np.int16))


def test_lpc_subframe_decodes():
    """Hand-built LPC subframe (order 1, coef 2, shift 1 — i.e.
    pred = x[n-1]): warm-up 10, residuals +1 +1 +1 -> 10 11 12 13.
    Our encoder never emits LPC, so this pins the decode branch the
    way the JPEG hand vector pins its decoder."""
    b = _BW()
    b.w(0, 1)
    b.w(0b100000, 6)  # LPC order 1
    b.w(0, 1)         # no wasted bits
    b.w(10 & 0xFFFF, 16)  # warm-up
    b.w(1, 4)         # precision - 1 = 1 -> 2 bits
    b.w(1, 5)         # shift 1
    b.w(0b10 & 0b11, 2)   # coef = -2? two's complement 2-bit: 0b10 = -2
    # coef -2 with shift 1: pred = (-2 * prev) >> 1 = -prev ... use +2:
    # 2 doesn't fit signed 2-bit; rebuild below with precision 3
    b = _BW()
    b.w(0, 1)
    b.w(0b100000, 6)
    b.w(0, 1)
    b.w(10 & 0xFFFF, 16)
    b.w(2, 4)         # precision - 1 = 2 -> 3 bits
    b.w(1, 5)         # shift 1
    b.w(2, 3)         # coef = +2 -> pred = (2 * prev) >> 1 = prev
    b.w(0, 2)         # residual method 0
    b.w(0, 4)         # partition order 0
    b.w(1, 4)         # rice k = 1
    for _ in range(3):  # residual +1: fold=2, q=1 ('01'), low bit 0
        b.unary(1)
        b.w(0, 1)
    b.align()
    _hand_frame(b, 4, [10, 11, 12, 13])


def test_rice_escape_partition_decodes():
    """Hand-built FIXED-order-0 subframe using the Rice ESCAPE code
    (k=0b1111, then 5-bit raw width): raw 6-bit signed residuals."""
    vals = [7, -8, 0, 31]
    b = _BW()
    b.w(0, 1)
    b.w(0b001000, 6)  # FIXED order 0
    b.w(0, 1)
    b.w(0, 2)         # method 0
    b.w(0, 4)         # partition order 0
    b.w(0b1111, 4)    # escape
    b.w(6, 5)         # 6-bit raw residuals
    for v in vals:
        b.w(v & 0x3F, 6)
    b.align()
    _hand_frame(b, 4, vals)


def test_five_bit_rice_method_decodes():
    """Residual coding method 1 (5-bit Rice parameters) — same values
    as method 0, different parameter width."""
    b = _BW()
    b.w(0, 1)
    b.w(0b001000, 6)  # FIXED order 0
    b.w(0, 1)
    b.w(1, 2)         # method 1: 5-bit params
    b.w(0, 4)
    b.w(0, 5)         # k = 0
    for v in (1, -1, 2):  # folds 2, 1, 4 -> unary
        b.unary((v << 1) if v >= 0 else ((-v << 1) - 1))
    b.align()
    _hand_frame(b, 3, [1, -1, 2])


def test_streaminfo_frame_channel_mismatch_rejected():
    """A STREAMINFO declaring stereo over mono frames is corrupt and
    must raise (round 11: stereo itself now decodes — the guard moved
    from the STREAMINFO parse to the per-frame consistency check)."""
    sig = np.arange(100, dtype=np.int16)
    data = bytearray(encode_flac(sig, 8000))
    # STREAMINFO bit layout: sizes(32) + frame sizes(48) = 80 bits,
    # rate(20) -> bits 80..99, channels-1 -> bits 100..102. The body
    # starts at file offset 8, so bit 100 sits in byte 8+12 at
    # MSB-first position 4; the field's LSB (bit 102) is mask 0x02.
    data[8 + 12] |= 0x02  # channels-1: 0 -> 1 (stereo)
    with pytest.raises(ValueError, match="ch"):
        decode_flac(bytes(data))


def test_l9q_query_matches_closed_form(spark, sf_dir):
    from ipydataclean_spark.operators.media_flac import l9q_real_flac_decode

    rows = l9q_real_flac_decode(spark, sf_dir).collect()
    assert rows, "fixture slice must not be empty"
    modes = ["lr", "ls", "rs", "ms"]
    for r in rows:
        d = r.doc_id
        assert r.ok == 1 and r.sample_rate == 8000
        assert r.n_samples == 800 + (d % 7) * 160
        scale = 256 if d % 3 == 0 else 1
        assert r.rms == float((500 + (d % 50) * 100) * scale)
        assert r.bits == (24 if d % 3 == 0 else 16)
        if d % 2 == 1:
            assert r.n_channels == 1 and r.layout == "mono"
        else:
            assert r.n_channels == 2
            assert r.layout == modes[(d // 2) % 4]
    assert {r.layout for r in rows} == {"mono", "lr", "ls", "rs", "ms"}
    assert {r.bits for r in rows} == {16, 24}


# ---------------------------------------------------------------------------
# Round 11: stereo decorrelation + 8/24-bit depths (VERDICT r10 #3)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["lr", "ls", "rs", "ms"])
@pytest.mark.parametrize("bps", [8, 16, 24])
def test_stereo_roundtrip_bit_exact(mode, bps):
    """Every decorrelation mode x depth round-trips arbitrary stereo
    signals bit-exactly, including the mid/side dropped-LSB path
    (odd left+right sums) and the side channel's bps+1 width at the
    amplitude extremes."""
    rng = np.random.RandomState(bps * 101 + len(mode))
    lim = 1 << (bps - 1)
    n = 700
    cases = [
        rng.randint(-lim, lim, (n, 2)).astype(np.int64),
        # extreme amplitudes: side = left - right spans ±(2^bps - 1)
        np.stack(
            [np.full(n, lim - 1, np.int64), np.full(n, -lim, np.int64)], axis=1
        ),
        # odd sums exercise the mid/side LSB restoration every sample
        np.stack(
            [np.arange(n, dtype=np.int64) % lim,
             (np.arange(n, dtype=np.int64) + 1) % lim], axis=1
        ),
    ]
    for sig in cases:
        data = encode_flac(sig, 8000, block_size=256, bps=bps, mode=mode)
        got, rate, layout = decode_flac(data, return_layout=True)
        assert layout == mode and rate == 8000
        assert got.shape == sig.shape
        np.testing.assert_array_equal(got.astype(np.int64), sig)


def test_mono_depths_roundtrip():
    """8- and 24-bit mono round-trips (16-bit is the legacy suite)."""
    for bps in (8, 24):
        lim = 1 << (bps - 1)
        sig = np.clip(
            np.cumsum(np.random.RandomState(bps).randint(-9, 10, 1500)),
            -lim, lim - 1,
        ).astype(np.int64)
        got, rate = decode_flac(encode_flac(sig, 16000, bps=bps))
        np.testing.assert_array_equal(got.astype(np.int64), sig)
        assert got.dtype == (np.int16 if bps <= 16 else np.int32)


def test_stereo_mode_bitstreams_differ_but_agree():
    """The four modes produce four DIFFERENT bitstreams of the same
    signal (the decorrelation is real, not a relabel) that all decode
    to the same samples."""
    rng = np.random.RandomState(77)
    sig = np.cumsum(rng.randint(-20, 21, (900, 2)), axis=0).astype(np.int64)
    streams = {
        m: encode_flac(sig, 8000, bps=16, mode=m) for m in ("lr", "ls", "rs", "ms")
    }
    assert len({bytes(s) for s in streams.values()}) == 4
    for m, data in streams.items():
        got, _, layout = decode_flac(data, return_layout=True)
        assert layout == m
        np.testing.assert_array_equal(got.astype(np.int64), sig)


def test_correlated_stereo_compresses_with_side_coding():
    """The point of decorrelation: for strongly-correlated channels
    (right = left + small noise) the left/side stream is smaller than
    independent L/R."""
    rng = np.random.RandomState(5)
    left = np.cumsum(rng.randint(-30, 31, 4000)).astype(np.int64)
    left = np.clip(left, -30000, 30000)
    right = left + rng.randint(-3, 4, 4000)
    sig = np.stack([left, np.clip(right, -32768, 32767)], axis=1)
    assert len(encode_flac(sig, 8000, mode="ls")) < len(
        encode_flac(sig, 8000, mode="lr")
    )


def test_bad_bps_and_bad_mode_raise():
    sig = np.zeros((10, 2), np.int64)
    with pytest.raises(ValueError, match="bits per sample"):
        encode_flac(sig, 8000, bps=12)
    with pytest.raises(ValueError, match="stereo mode"):
        encode_flac(sig, 8000, mode="xy")
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.full(10, 200, np.int64), 8000, bps=8)
