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


# ---------------------------------------------------------------------------
# l9e audio frames / l9f image dHash
# ---------------------------------------------------------------------------


def test_audio_frame_features_sine(spark):
    import numpy as np
    import pandas as pd
    from ipydataclean_spark.operators.media_codecs import (
        FRAME,
        audio_frame_features,
        encode_wav_pcm16,
    )

    n, rate = 800, 8000
    t = np.arange(n)
    s = (3000 * np.sin(2 * np.pi * 50 * t / rate)).astype(np.int16)
    media = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [encode_wav_pcm16(s, rate)]})
    )
    rows = audio_frame_features(media).orderBy("frame_id").collect()
    assert len(rows) == n // FRAME
    # per-frame values equal the local numpy computation
    for r in rows:
        x = s[r.frame_id * FRAME : (r.frame_id + 1) * FRAME].astype("f8")
        assert abs(r.rms - round(float(np.sqrt((x * x).mean())), 8)) < 1e-9
        sg = np.sign(x)
        assert r.zcr == int((sg[1:] != sg[:-1]).sum())


def test_audio_frames_drop_undecodable_and_short(spark):
    import pandas as pd
    from ipydataclean_spark.operators.media_codecs import (
        audio_frame_features,
        encode_wav_pcm16,
    )
    import numpy as np

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "payload": [
                    b"not a wav at all",
                    encode_wav_pcm16(np.zeros(10, dtype=np.int16), 8000),  # < 1 frame
                ],
            }
        )
    )
    assert audio_frame_features(media).count() == 0


def test_dhash_brightness_invariance_and_noise_tolerance():
    import numpy as np
    from ipydataclean_spark.operators.media_codecs import dhash64

    rng_free = np.mgrid[0:20, 0:30]
    y, x = rng_free
    g = (40 + ((x * 3 + y * 2) % 23) * 6).astype(np.uint8)
    px = np.repeat(g[:, :, None], 3, axis=2)
    h0 = dhash64(px)
    # uniform brightness shift: identical hash
    assert dhash64(px + np.uint8(30)) == h0
    # small local perturbation: small hamming distance
    noisy = px.copy()
    noisy[5, 7] = noisy[5, 7] + np.uint8(100)
    d = bin(h0 ^ dhash64(noisy)).count("1")
    assert d <= 7
    # a very different image: far hash
    other = np.repeat(((x * 7 + y * 11) % 31 * 5 + 20).astype(np.uint8)[:, :, None], 3, axis=2)
    assert bin(h0 ^ dhash64(other)).count("1") > 7


def test_dhash_pairs_find_brightened_copies(spark, sf_dir):
    from pyspark.sql import functions as F

    from ipydataclean_spark.operators.media_codecs import (
        attach_patterned_payloads,
        image_dhash,
        l9f_image_dhash_pairs,
    )
    from ipydataclean_spark.operators.qhelp import T

    docs = T(spark, sf_dir, "documents").where(F.col("doc_id") % 2 == 0)
    hmap = {
        r.doc_id: r.dhash
        for r in image_dhash(attach_patterned_payloads(docs)).collect()
    }
    ids = [d for d in hmap if d < 2000000 and d % 10 == 0]
    assert ids
    # end-to-end brightness invariance: every +24 copy hashes identically
    for d in ids:
        assert hmap[d] == hmap[d + 2000000], f"hash changed for {d}"
    # the registered query reports those as within-cluster hamming-0 rows
    rows = l9f_image_dhash_pairs(spark, sf_dir).collect()
    within_reps = {r.doc_a for r in rows if r.hamming == 0 and r.doc_a == r.doc_b}
    for d in ids:
        members = [k for k, h in hmap.items() if h == hmap[d]]
        assert min(members) in within_reps, f"cluster for {d} missing"
    # aggregate pair counts are consistent: C(size,2) for within rows
    import collections

    sizes = collections.Counter(hmap.values())
    for r in rows:
        if r.doc_a == r.doc_b:
            n = sizes[hmap[r.doc_a]]
            assert r.n_pairs == n * (n - 1) // 2


def test_dhash_banding_guarantee():
    # pigeonhole: hamming <= 7 over 8 bands of 8 bits must share a band
    import numpy as np
    from ipydataclean_spark.operators.media_codecs import dhash64  # noqa: F401

    h1 = 0x0123456789ABCDEF
    h2 = h1
    for bit in (1, 9, 17, 25, 33, 41, 49):  # 7 flipped bits, all bands distinct... 
        h2 ^= 1 << bit
    bands1 = [(h1 >> (8 * b)) & 255 for b in range(8)]
    bands2 = [(h2 >> (8 * b)) & 255 for b in range(8)]
    assert any(a == b for a, b in zip(bands1, bands2))


# ---------------------------------------------------------------------------
# l9g PNG codec
# ---------------------------------------------------------------------------


def _gradient_px(h=9, w=13, ch=3):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    px = np.zeros((h, w, ch), dtype=np.uint8)
    px[:, :, 0] = (x * 7 + y * 3) % 256
    px[:, :, 1] = (x * 11 + y * 5) % 256
    px[:, :, 2] = (x * 13 + y * 17) % 256
    if ch == 4:
        px[:, :, 3] = (x * 29 + y) % 256
    return px


def test_png_roundtrip_all_filters_rgb_and_rgba():
    import numpy as np
    from ipydataclean_spark.operators.media_codecs import decode_png, encode_png

    for ch in (3, 4):
        px = _gradient_px(ch=ch)
        for ft in range(5):
            out = decode_png(encode_png(px, filter_type=ft))
            assert out.shape == px.shape, (ch, ft)
            assert np.array_equal(out, px), f"filter {ft} ch {ch} mismatch"


def test_png_crc_corruption_detected():
    import pytest as _pytest
    from ipydataclean_spark.operators.media_codecs import decode_png, encode_png

    data = bytearray(encode_png(_gradient_px()))
    # flip one byte inside the IDAT body (after sig+IHDR chunk)
    idat_at = bytes(data).find(b"IDAT")
    data[idat_at + 10] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))
    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_png_rejects_unsupported_shapes():
    import struct as _struct
    import zlib as _zlib

    import pytest as _pytest
    from ipydataclean_spark.operators.media_codecs import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    # 16-bit depth header: honest refusal, not garbage output
    ihdr = _struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    data = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", _zlib.compress(b"\x00" * 10)
    ) + _png_chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="unsupported"):
        decode_png(data)


# ---------------------------------------------------------------------------
# l9h mu-law
# ---------------------------------------------------------------------------


def test_mulaw_bit_exact_vs_stdlib_reference():
    """Our from-scratch G.711 codec vs CPython's audioop (an
    INDEPENDENT reference implementation): bit-identical over the
    entire int16 domain (encode) and all 256 codes (decode)."""
    import numpy as np
    import pytest as _pytest

    audioop = _pytest.importorskip("audioop")
    from ipydataclean_spark.operators.media_codecs import lin2ulaw, ulaw2lin

    xs = np.arange(-32768, 32768, dtype=np.int64)
    ref = np.frombuffer(
        audioop.lin2ulaw(xs.astype("<i2").tobytes(), 2), dtype=np.uint8
    )
    assert np.array_equal(lin2ulaw(xs), ref)
    us = np.arange(256).astype(np.uint8)
    refd = np.frombuffer(audioop.ulaw2lin(bytes(us), 2), dtype="<i2")
    assert np.array_equal(ulaw2lin(us), refd)


def test_mulaw_roundtrip_error_bound_and_wav():
    import numpy as np
    from ipydataclean_spark.operators.media_codecs import (
        decode_wav_any,
        encode_wav_mulaw,
        lin2ulaw,
        ulaw2lin,
    )

    xs = np.arange(-32000, 32000, 97, dtype=np.int64)
    rt = ulaw2lin(lin2ulaw(xs)).astype(np.int64)
    # companding error is relative: bounded by segment step (~3.1%)
    assert np.all(np.abs(rt - xs) <= np.maximum(np.abs(xs) * 0.04, 40))
    # sign always survives (zero-crossing features are compand-proof)
    assert np.all(np.sign(rt) == np.sign(np.clip(xs, -32635, 32635)))
    # WAV fmt-7 round trip
    s = (1000 * np.sin(np.arange(400) / 10)).astype(np.int16)
    dec, rate = decode_wav_any(encode_wav_mulaw(s, 8000))
    assert rate == 8000 and len(dec) == 400
    assert np.array_equal(dec, ulaw2lin(lin2ulaw(s.astype(np.int64))))


# ---------------------------------------------------------------------------
# l9i GIF / LZW
# ---------------------------------------------------------------------------


def test_lzw_hand_computed_spec_vector():
    """[1,1,1] at min-code-size 2: codes CLEAR(4),1,6,EOI(5) at width
    3, LSB-first-packed -> bytes 8C 0B (worked by hand from the GIF
    spec's packing rules) — pins bit order, widths, and control
    codes independent of round-trip circularity."""
    from ipydataclean_spark.operators.media_codecs import _lzw_decode, _lzw_encode

    assert _lzw_encode([1, 1, 1], 2).hex() == "8c0b"
    assert _lzw_decode(bytes.fromhex("8c0b"), 2) == [1, 1, 1]


def test_lzw_roundtrip_kwkwk_and_resets():
    import random

    from ipydataclean_spark.operators.media_codecs import _lzw_decode, _lzw_encode

    # KwKwK: long runs force the decoder to see codes one ahead
    runs = [5] * 40 + [3] * 40
    assert _lzw_decode(_lzw_encode(runs, 4), 4) == runs
    rng = random.Random(7)
    for mcs in (2, 3, 7):
        idx = [rng.randrange(1 << mcs) for _ in range(6000)]  # > 4096: resets
        assert _lzw_decode(_lzw_encode(idx, mcs), mcs) == idx


def test_gif_roundtrip_and_guards():
    import numpy as np
    import pytest as _pytest

    from ipydataclean_spark.operators.media_codecs import decode_gif, encode_gif

    palette = [(250, 10, 10), (10, 250, 10), (10, 10, 250), (99, 99, 99)]
    y, x = np.mgrid[0:11, 0:17]
    px = ((x * 3 + y * 5) % 4).astype(np.int64)
    out = decode_gif(encode_gif(px, palette))
    want = np.array(palette, dtype=np.uint8)[px]
    assert np.array_equal(out, want)
    with _pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" * 4)


def test_audio_fingerprint_gain_invariance_and_discrimination(spark):
    """Driver-side goldens for the zcr-delta fingerprint: (a) integer
    gain-halving never changes the fingerprint (signs survive by
    fixture construction), (b) different seeds fingerprint differently
    (discrimination — the square-wave fixture would fail this), and
    (c) a hand-built signal's bits match the zcr-delta definition."""
    import numpy as np

    from ipydataclean_spark.operators.media_codecs import (
        attach_noise_wave_payloads,
        audio_fingerprint,
        encode_wav_pcm16,
    )

    docs = spark.createDataFrame([(i,) for i in range(2, 40, 2)], "doc_id long")
    fps = {r.doc_id: r.fp for r in
           audio_fingerprint(attach_noise_wave_payloads(docs)).collect()}
    # no injected copies in 2..38 (none % 10 == 0 besides 10,20,30)
    originals = [d for d in fps if d < 3000000]
    assert len(set(fps[d] for d in originals)) > len(originals) * 0.8, (
        "fingerprints fail to discriminate distinct clips"
    )
    for d in (10, 20, 30):
        assert fps[d + 3000000] == fps[d], f"half-gain copy of {d} drifted"

    # hand-built golden with a HAND-COMPUTED expectation (review r08:
    # the first version recomputed `expect` with the production numpy
    # expression — a bug in the bit definition would change both sides
    # identically). 8 windows of 16 samples, half-period per window
    # h = [1, 2, 4, 8, 1, 8, 2, 16]: a window's sign flips at
    # multiples of h, so zcr = floor(15/h) = [15, 7, 3, 1, 15, 1, 7, 0].
    # Delta bits (zcr[w] > zcr[w+1]):
    #   15>7=1, 7>3=1, 3>1=1, 1>15=0, 15>1=1, 1>7=0, 7>0=1
    # -> 0b1110101 = 117.
    sig = []
    for h in (1, 2, 4, 8, 1, 8, 2, 16):
        sig.extend(100 if (i // h) % 2 == 0 else -100 for i in range(16))
    payload = encode_wav_pcm16(np.array(sig, dtype=np.int16), 8000)
    media = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    fp = audio_fingerprint(media, windows=8).first().fp
    assert fp == 117


def test_l9k_injected_copies_cluster(spark, sf_dir):
    """Every half-gain injected copy must land in its original's
    cluster (a hamming-0 within-cluster row whose rep is the original
    doc_id) — the audio analogue of l9f's brightened-copy recall."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l9k_audio_fp_pairs"]["fn"](spark, sf_dir).collect()
    within = {r.doc_a for r in rows if r.hamming == 0 and r.doc_a == r.doc_b}
    expected = {d for d in range(0, 500, 2) if d % 10 == 0}
    assert expected <= within, f"missing clusters for {sorted(expected - within)[:5]}"


def test_y4m_roundtrip_and_guards():
    """Closed-form Y4M codec pins (the l9d pattern): grayscale clips
    round-trip bit-exactly through the C444 container; malformed
    magic, colorspace, truncation, and non-grayscale input all raise
    (the poison-pill contract)."""
    from ipydataclean_spark.operators.media_codecs import decode_y4m, encode_y4m

    g = (np.arange(12 * 16, dtype=np.uint8).reshape(12, 16) % 200)
    fr = np.stack([np.repeat(((g + 13 * i) % 251)[:, :, None], 3, axis=2)
                   for i in range(4)])
    enc = encode_y4m(fr)
    assert enc.startswith(b"YUV4MPEG2 W16 H12 ")
    # 4 frames x (FRAME\n + 3 planes of 192 bytes)
    assert enc.count(b"FRAME\n") == 4
    dec = decode_y4m(enc)
    assert dec.shape == fr.shape and (dec == fr).all()
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF" + enc[4:])
    with pytest.raises(ValueError):
        decode_y4m(enc.replace(b"C444", b"C420"))
    with pytest.raises(ValueError):
        decode_y4m(enc[:-10])  # truncated last frame
    rgb = fr.copy()
    rgb[0, 0, 0, 0] += 1  # break R == G == B
    with pytest.raises(ValueError):
        encode_y4m(rgb)


def test_video_frame_dhash_brightness_invariance(spark):
    """Per-frame dHashes of a clip and its +24-brightened copy must be
    IDENTICAL (the l9f invariance lifted to the frame sequence), and
    stride-2 sampling of a 6-frame clip yields frames 0, 2, 4."""
    from ipydataclean_spark.operators.media_codecs import (
        attach_video_payloads,
        video_frame_dhash,
    )

    docs = spark.createDataFrame([(10,)], "doc_id long")
    fdh = video_frame_dhash(attach_video_payloads(docs)).collect()
    by_doc = {}
    for r in fdh:
        by_doc.setdefault(r.doc_id, {})[r.frame_idx] = r.dhash
    assert set(by_doc) == {10, 3000010}
    assert set(by_doc[10]) == {0, 2, 4}
    assert by_doc[10] == by_doc[3000010], "brightened twin hashes differ"
    assert all(r.n_frames == 6 for r in fdh)


def test_l9l_injected_twin_clips_cluster(spark, sf_dir):
    """Every brightened twin clip must collapse into its original's
    signature cluster: the original's rep appears as a hamming-0
    all-frames-matched within-cluster row (l9f's shape at the video
    grain), and across-cluster rows carry sane frame-match bounds."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l9l_video_frame_dhash"]["fn"](spark, sf_dir).collect()
    within = {r.doc_a: r for r in rows if r.doc_a == r.doc_b}
    # twins exist for sampled (even) docs with doc_id % 10 == 0; the
    # twin shares its original's signature, so the original's cluster
    # has size >= 2 — represented by a within row at SOME rep <= d
    expected = {d for d in range(0, 500, 2) if d % 10 == 0}
    covered = set()
    for rep, r in within.items():
        assert r.max_hamming == 0 and r.all_frames_matched and r.n_pairs >= 1
        covered.add(rep)
    # each expected doc must itself be a rep unless its signature
    # collides with a smaller doc (possible but must be rare)
    assert len(expected - covered) <= 2, f"twin clusters missing: {sorted(expected - covered)[:5]}"
    for r in rows:
        if r.doc_a != r.doc_b:
            assert 1 <= r.n_frames_matched <= r.n_frames_sampled
            assert not (r.all_frames_matched and r.max_hamming > 7)


def test_avi_roundtrip_bit_exact():
    """encode_avi -> decode_avi is the identity on arbitrary RGB
    frames (odd widths exercise the 4-byte row padding), and the
    poison-pill contract raises on bad magic / truncation."""
    import numpy as np
    import pytest

    from ipydataclean_spark.operators.media_codecs import decode_avi, encode_avi

    rng = np.random.default_rng(7)
    for h, w, n in [(12, 16, 6), (13, 17, 3), (5, 5, 1)]:
        fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        back = decode_avi(encode_avi(fr))
        assert back.shape == fr.shape and (back == fr).all()
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi(b"nope" + bytes(64))
    good = encode_avi(rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_avi(good[:-10])

    # a compressed stream must raise, never decode bytes as pixels.
    # MJPG became a SUPPORTED branch in round 10 (functions/jpeg.py),
    # so relabeling a DIB payload as MJPG now fails JPEG validation
    # ("not a JPEG") rather than the compression guard; any OTHER
    # compression still trips the biCompression guard.
    import struct

    strf_at = good.index(b"strf")
    bad = bytearray(good)
    struct.pack_into("<I", bad, strf_at + 8 + 16, 0x47504A4D)  # 'MJPG'
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_avi(bytes(bad))
    bad2 = bytearray(good)
    struct.pack_into("<I", bad2, strf_at + 8 + 16, 0x44495658)  # 'XVID'
    with pytest.raises(ValueError, match="biCompression"):
        decode_avi(bytes(bad2))

    # negative biHeight = top-down rows: the sign must be honored
    fr = rng.integers(0, 256, (2, 6, 8, 3), dtype=np.uint8)
    enc = bytearray(encode_avi(fr))
    strf_at = enc.index(b"strf")
    struct.pack_into("<i", enc, strf_at + 8 + 8, -6)  # biHeight -> -h
    flipped = decode_avi(bytes(enc))
    assert (flipped == fr[:, ::-1, :, :]).all()


def test_video_fingerprints_are_container_agnostic(spark, sf_dir):
    """One clip set encoded as Y4M and as AVI must produce IDENTICAL
    per-frame dHash tables — the mixed-container-corpus condition.
    (Grayscale clips, so the Y4M grayscale-subset restriction and the
    AVI BGR order cannot diverge.)"""
    from ipydataclean_spark.operators.media_codecs import (
        attach_video_payloads,
        decode_avi,
        encode_avi,
        video_frame_dhash,
    )
    from ipydataclean_spark.operators.qhelp import T
    from pyspark.sql import functions as F

    docs = T(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    y4m = video_frame_dhash(attach_video_payloads(docs))
    avi = video_frame_dhash(
        attach_video_payloads(docs, encoder=encode_avi), decoder=decode_avi
    )
    a = sorted(map(tuple, y4m.collect()))
    b = sorted(map(tuple, avi.collect()))
    assert a == b and len(a) > 50


def test_l9m_brightened_twins_collapse(spark, sf_dir):
    """l9m's fixture contract (the l9l shape over the odd-doc slice):
    every brightened twin collapses into its original's signature
    cluster — a hamming-0 within-cluster row per twinned clip."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l9m_avi_frame_dhash"]["fn"](spark, sf_dir).collect()
    within = [r for r in rows if r.doc_a == r.doc_b]
    assert within, "no within-cluster rows — twins did not collapse"
    for r in within:
        assert r.max_hamming == 0 and r.all_frames_matched
    # at least one within row must be a TWINNED clip's cluster (rep is
    # the min doc_id, i.e. the % 10 == 0 original) — not just organic
    # signature collisions
    assert any(r.doc_a % 10 == 0 for r in within)
