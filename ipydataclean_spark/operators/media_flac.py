"""L9q — FLAC audio codec + decode query (compressed LOSSLESS audio).

The modality set gains its compressed-audio member: BMP/PNG/GIF/JPEG
cover images, Y4M/AVI/MJPEG video, WAV-PCM16/µ-law raw audio — and
real audio corpora ship FLAC. The format (public spec, RFC 9639) is
losslessly decodable with zero codec libraries: bit-packed frames,
fixed-polynomial or LPC prediction, Rice-coded residuals, CRC-8/16
integrity. This module implements, from the spec, with stdlib +
numpy:

- ``decode_flac``: STREAMINFO parse, frame sync + header (UTF-8
  frame index, CRC-8 verified), CONSTANT / VERBATIM / FIXED(0-4) /
  LPC subframes, Rice residual partitions (4- and 5-bit parameter
  methods, escape codes), frame CRC-16 verified — mono and STEREO
  with all four channel assignments (independent L/R, left/side,
  right/side, mid/side; side channels at bps+1 bits) at 8/16/24-bit
  depths (the round-11 boundary extension, VERDICT r10 #3; >2
  channels still raise).
- ``encode_flac``: CONSTANT frames for flat signals, FIXED order-2
  prediction + single-partition Rice otherwise (4-bit parameters,
  5-bit when k > 14), VERBATIM when Rice would expand; stereo input
  encodes through any of the four decorrelation modes — enough to
  produce spec-conformant files any FLAC decoder reads, exercising
  every decoder path the tests pin.

Lossless means the tests pin BIT-EXACT round-trips on arbitrary
int16 signals, and the registered query gets a full closed-form SQL
oracle (the l9d/l9g/l9n playbook): square-wave fixtures make every
feature — n_samples, duration, RMS — exact integers/ratios.

Scale: decode is a per-payload kernel inside an Arrow-batched
``mapInPandas`` map — linear in bytes, no shuffle. The bit loop is
Python (FLAC is a bit-serial format), bounded per payload; corrupt
payloads raise and the stage's poison-pill guard records ok=0.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _make_crc_tables() -> tuple[list[int], list[int]]:
    """256-entry tables for the two FLAC CRCs (identical values to the
    bit-serial definition; round-13 optimization — the bit loop was 35%
    of decode wall in the profile)."""
    t8 = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        t8.append(crc)
    t16 = []
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        t16.append(crc)
    return t8, t16


_CRC8_TABLE, _CRC16_TABLE = _make_crc_tables()


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the FLAC frame
    header CRC (table-driven; value-identical to the bit-serial form)."""
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the FLAC
    whole-frame CRC (table-driven; value-identical to the bit-serial
    form)."""
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ t[((crc >> 8) ^ b) & 0xFF]
    return crc


class _BW:
    """MSB-first bit writer (no byte stuffing — FLAC is not JPEG)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        """FLAC unary: q zero bits terminated by a one bit."""
        while q >= 32:
            self.w(0, 32)
            q -= 32
        self.w(1, q + 1)

    def w_bits(self, bits_arr: np.ndarray) -> None:
        """Append a uint8 0/1 bit array, MSB-first (round-13: the
        vectorized residual writer hands whole partitions here instead
        of per-sample w()/unary() calls). Emits the identical bit
        stream: packbits is MSB-first like w()."""
        if self.n:
            head = np.empty(self.n, dtype=np.uint8)
            for i in range(self.n):
                head[self.n - 1 - i] = (self.acc >> i) & 1
            bits_arr = np.concatenate([head, bits_arr])
            self.acc = 0
            self.n = 0
        nbytes = bits_arr.size >> 3
        if nbytes:
            self.out += np.packbits(bits_arr[: nbytes * 8]).tobytes()
        acc = 0
        rem = bits_arr[nbytes * 8 :]
        for b in rem:
            acc = (acc << 1) | int(b)
        self.acc = acc
        self.n = int(rem.size)

    def align(self) -> None:
        if self.n:
            self.w(0, 8 - self.n)


class _BR:
    """MSB-first bit reader over bytes, with a byte-position view for
    the CRC spans."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def r(self, bits: int) -> int:
        while self.n < bits:
            if self.p >= len(self.d):
                raise ValueError("truncated FLAC stream")
            self.acc = (self.acc << 8) | self.d[self.p]
            self.p += 1
            self.n += 8
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def rs(self, bits: int) -> int:
        v = self.r(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.r(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code (corrupt Rice data)")
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def _br_seek(br: _BR, bitpos: int) -> None:
    """Position ``br`` at absolute bit offset ``bitpos`` (round-13: the
    vectorized readers below consume whole spans from the unpacked bit
    array and then re-sync the scalar reader)."""
    byte = bitpos >> 3
    rem = bitpos & 7
    if rem:
        if byte >= len(br.d):
            raise ValueError("truncated FLAC stream")
        br.n = 8 - rem
        br.acc = br.d[byte] & ((1 << br.n) - 1)
        br.p = byte + 1
    else:
        br.n = 0
        br.acc = 0
        br.p = byte


def _read_rice_block(br: _BR, bits: np.ndarray, cnt: int, k: int) -> np.ndarray:
    """``cnt`` Rice(k) residuals, vectorized (round-13; guide §4.2):
    terminator 1-bits are located by a pointer chase over the payload's
    unpacked bit array (2 array ops per sample instead of per-BIT
    Python reads), payload bits gather as one matrix. Bit-exact: the
    same q/payload split, fold, and error conditions as the scalar
    unary()/r(k) loop."""
    if cnt == 0:
        return np.empty(0, dtype=np.int64)
    start = br.p * 8 - br.n
    ones = np.flatnonzero(bits[start:]).astype(np.int64)
    step = 1 + k
    if ones.size:
        nxt = np.searchsorted(ones, ones + step)
    t = np.empty(cnt, dtype=np.int64)
    j = 0
    n_ones = ones.size
    for i in range(cnt):
        if j >= n_ones:
            raise ValueError("truncated FLAC stream")
        t[i] = ones[j]
        j = nxt[j]
    prev_end = np.empty(cnt, dtype=np.int64)
    prev_end[0] = 0
    prev_end[1:] = t[:-1] + step
    q = t - prev_end
    if int(q.max()) > (1 << 20):
        raise ValueError("runaway unary code (corrupt Rice data)")
    end = start + int(t[-1]) + step
    if end > bits.size:
        raise ValueError("truncated FLAC stream")
    if k:
        idx = (start + t)[:, None] + np.arange(1, k + 1, dtype=np.int64)
        weights = np.left_shift(1, np.arange(k - 1, -1, -1, dtype=np.int64))
        payload = bits[idx].astype(np.int64) @ weights
        u = (q << k) | payload
    else:
        u = q
    _br_seek(br, end)
    return np.where(u & 1 == 0, u >> 1, -((u + 1) >> 1))


def _read_signed_block(br: _BR, bits: np.ndarray, cnt: int, width: int) -> np.ndarray:
    """``cnt`` fixed-width two's-complement values, vectorized (the
    VERBATIM subframe body and escaped Rice partitions)."""
    if cnt == 0 or width == 0:
        return np.zeros(cnt, dtype=np.int64)
    start = br.p * 8 - br.n
    end = start + cnt * width
    if end > bits.size:
        raise ValueError("truncated FLAC stream")
    w = bits[start:end].reshape(cnt, width).astype(np.int64)
    weights = np.left_shift(1, np.arange(width - 1, -1, -1, dtype=np.int64))
    v = w @ weights
    v = np.where(v >= (1 << (width - 1)), v - (1 << width), v)
    _br_seek(br, end)
    return v


def _rice_fold(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _rice_unfold(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_number(n: int) -> bytes:
    """The UTF-8-style frame-number coding of the FLAC frame header
    (extended to 7 bytes / 36 payload bits per the spec). Minimal
    nbytes satisfies payload bits = (7 - nbytes) + 6*(nbytes - 1)."""
    if n < 0x80:
        return bytes([n])
    bits = n.bit_length()
    nbytes = 2
    while (7 - nbytes) + 6 * (nbytes - 1) < bits:
        nbytes += 1
    if nbytes > 7:
        raise ValueError(f"frame number {n} exceeds the 36-bit coding")
    out = []
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for _ in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BR) -> int:
    b0 = br.r(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 frame number")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.r(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        v = (v << 6) | (b & 0x3F)
    return v


#: frame-header channel assignment codes (RFC 9639 §9.1.3)
_CHAN_CODES = {"mono": 0b0000, "lr": 0b0001, "ls": 0b1000, "rs": 0b1001, "ms": 0b1010}
#: frame-header sample size codes (RFC 9639 §9.1.4)
_SS_CODES = {8: 0b001, 16: 0b100, 24: 0b110}


def _encode_subframe(body: _BW, blk: np.ndarray, eff: int) -> None:
    """One subframe at ``eff`` bits: CONSTANT when flat, else FIXED
    order-2 + single-partition Rice (parameter method 0 while k fits
    4 bits, method 1 above — RFC 9639 §9.2.7), VERBATIM when Rice
    would expand. Side channels pass eff = bps + 1 (the
    decorrelation bit)."""
    mask = (1 << eff) - 1
    bs = int(blk.size)
    if np.all(blk == blk[0]):
        body.w(0, 1)
        body.w(0b000000, 6)  # CONSTANT
        body.w(0, 1)
        body.w(int(blk[0]) & mask, eff)
        return
    order = min(2, bs - 1)
    # round-13 vectorization (guide §4.2) — same residuals, same bits:
    # the fixed-predictor residual is a plain linear combination of
    # shifted sample vectors, the Rice fold a branchless where, and the
    # whole residual partition is assembled as ONE bit array (unary
    # zeros + terminator + k payload bits per sample) handed to
    # w_bits() instead of per-sample unary()/w() calls.
    b64 = blk.astype(np.int64)
    res = b64[order:].copy()
    for j, c in enumerate(_FIXED_COEFS[order]):
        res -= c * b64[order - 1 - j : bs - 1 - j]
    folded = np.where(res >= 0, res << 1, ((-res) << 1) - 1)
    mean = float(folded.mean()) if folded.size else 0.0
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 30:
        k += 1
    rice_bits = int((folded >> k).sum()) + folded.size * (k + 1)
    if rice_bits > eff * folded.size:
        body.w(0, 1)
        body.w(0b000001, 6)  # VERBATIM
        body.w(0, 1)
        verb = (b64[:, None] >> np.arange(eff - 1, -1, -1, dtype=np.int64)) & 1
        body.w_bits(verb.astype(np.uint8).reshape(-1))
        return
    body.w(0, 1)
    body.w(0b001000 | order, 6)  # FIXED, order
    body.w(0, 1)
    for v in blk[:order]:  # warm-up
        body.w(int(v) & mask, eff)
    if k <= 14:
        body.w(0, 2)  # residual method 0: 4-bit Rice parameters
        body.w(0, 4)  # partition order 0 (one partition)
        body.w(k, 4)
    else:
        body.w(1, 2)  # method 1: 5-bit Rice parameters
        body.w(0, 4)
        body.w(k, 5)
    q = folded >> k
    ends = np.cumsum(q + 1 + k)
    t = ends - 1 - k  # terminator (1-bit) position of each sample
    arr = np.zeros(int(ends[-1]), dtype=np.uint8)
    arr[t] = 1
    if k:
        idx = t[:, None] + 1 + np.arange(k, dtype=np.int64)
        arr[idx] = ((folded[:, None] >> np.arange(k - 1, -1, -1, dtype=np.int64)) & 1).astype(
            np.uint8
        )
    body.w_bits(arr)


def encode_flac(
    samples: np.ndarray,
    rate: int,
    block_size: int = 4096,
    *,
    bps: int = 16,
    mode: str = "lr",
) -> bytes:
    """(n,) mono or (n, 2) stereo integer samples -> FLAC bytes at
    ``bps`` in {8, 16, 24}. Stereo ``mode`` picks the channel
    decorrelation: 'lr' (independent), 'ls' (left/side), 'rs'
    (right/side), 'ms' (mid/side) — side channels carry bps+1 bits
    per RFC 9639 §9.1.3. Spec-conformant headers and CRCs throughout;
    every mode round-trips bit-exactly (the lossless contract the
    tests pin)."""
    if bps not in _SS_CODES:
        raise ValueError(f"unsupported bits per sample {bps} (8/16/24)")
    x = np.asarray(samples, dtype=np.int64)
    stereo = x.ndim == 2
    if stereo and x.shape[1] != 2:
        raise ValueError("stereo input must be (n, 2)")
    if x.size == 0:
        raise ValueError("empty signal")
    lim = 1 << (bps - 1)
    if x.max() >= lim or x.min() < -lim:
        raise ValueError(f"samples exceed {bps}-bit range")
    if not stereo:
        mode = "mono"
    elif mode not in ("lr", "ls", "rs", "ms"):
        raise ValueError(f"unknown stereo mode {mode!r}")
    n_total = int(x.shape[0])  # inter-channel sample (frame) count
    channels = 2 if stereo else 1

    # --- STREAMINFO ------------------------------------------------------
    si = _BW()
    si.w(block_size, 16)  # min block size
    si.w(block_size, 16)  # max block size
    si.w(0, 24)           # min frame size (unknown)
    si.w(0, 24)           # max frame size (unknown)
    si.w(rate, 20)
    si.w(channels - 1, 3)
    si.w(bps - 1, 5)
    si.w(n_total, 36)
    si.align()
    streaminfo = bytes(si.out) + bytes(16)  # MD5 = 0 (unknown, spec-legal)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]  # last, type 0
    out += streaminfo

    # --- frames ----------------------------------------------------------
    for fi, lo in enumerate(range(0, n_total, block_size)):
        blk = x[lo : lo + block_size]
        bs = int(blk.shape[0])
        hdr = _BW()
        hdr.w(0x3FFE, 14)  # sync
        hdr.w(0, 1)        # reserved
        hdr.w(0, 1)        # fixed blocking
        hdr.w(0b0111, 4)   # block size: explicit 16-bit at end of header
        hdr.w(0, 4)        # sample rate: from STREAMINFO
        hdr.w(_CHAN_CODES[mode], 4)
        hdr.w(_SS_CODES[bps], 3)
        hdr.w(0, 1)        # reserved
        hdr.align()
        hdr_bytes = bytes(hdr.out) + _utf8_number(fi) + struct.pack(">H", bs - 1)
        hdr_bytes += bytes([_crc8(hdr_bytes)])

        if mode == "mono":
            chans = [(blk, bps)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if mode == "lr":
                chans = [(left, bps), (right, bps)]
            elif mode == "ls":
                chans = [(left, bps), (side, bps + 1)]
            elif mode == "rs":
                chans = [(side, bps + 1), (right, bps)]
            else:  # ms
                chans = [((left + right) >> 1, bps), (side, bps + 1)]
        body = _BW()
        for cblk, eff in chans:
            _encode_subframe(body, cblk, eff)
        body.align()
        frame = hdr_bytes + bytes(body.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


_CHAN_NAMES = {0b0000: "mono", 0b0001: "lr", 0b1000: "ls", 0b1001: "rs", 0b1010: "ms"}
_SS_BITS = {0b001: 8, 0b100: 16, 0b110: 24}


def _read_subframe(br: _BR, bs: int, eff: int, bits: np.ndarray) -> np.ndarray:
    """One subframe at ``eff`` bits: CONSTANT / VERBATIM / FIXED(0-4)
    / LPC, wasted-bits flag, Rice residual partitions. ``bits`` is the
    whole payload unpacked to a 0/1 array (round-13: the vectorized
    block readers index it directly)."""
    if br.r(1) != 0:
        raise ValueError("bad subframe padding bit")
    stype = br.r(6)
    wasted = 0
    if br.r(1):  # wasted-bits flag: unary count - 1
        wasted = br.unary() + 1
    eff -= wasted
    if eff <= 0:
        raise ValueError("wasted bits exceed sample width")
    if stype == 0b000000:
        blk = np.full(bs, br.rs(eff), dtype=np.int64)
    elif stype == 0b000001:
        blk = _read_signed_block(br, bits, bs, eff)
    elif (stype >> 3) == 0b001 and (stype & 7) <= 4:
        order = stype & 7
        blk = _decode_predicted(
            br, bs, order, eff, _FIXED_COEFS[order], bits, shift=0, lpc=False
        )
    elif stype & 0b100000:
        order = (stype & 0x1F) + 1
        warm = [br.rs(eff) for _ in range(order)]
        prec = br.r(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.rs(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.rs(prec) for _ in range(order)]
        blk = _decode_predicted(
            br, bs, order, eff, coefs, bits, shift=shift, lpc=True, warm=warm
        )
    else:
        raise ValueError(f"reserved subframe type {stype:06b}")
    if wasted:
        blk = blk << wasted
    return blk


def decode_flac(data: bytes, return_layout: bool = False):
    """FLAC bytes -> (samples, sample_rate[, layout]). Samples are
    shape (n,) for mono and (n, 2) interleaved [left, right] for
    stereo — int16 for 8/16-bit streams, int32 for 24-bit. Verifies
    the magic, walks metadata blocks, decodes every frame (CONSTANT /
    VERBATIM / FIXED / LPC subframes, Rice methods 0 and 1 with
    escapes, wasted bits), undoes all four stereo channel
    assignments — independent L/R, left/side, right/side, mid/side
    (side channels at bps+1 bits, RFC 9639 §9.1.3; mid/side restores
    the dropped LSB from the side parity) — and checks CRC-8
    (header) + CRC-16 (frame). >2 channels and depths outside
    {8, 16, 24} raise — the honest boundary of this from-scratch
    subset. ``return_layout=True`` appends the decoded channel
    assignment name ('mono'/'lr'/'ls'/'rs'/'ms'), which the l9q
    oracle certifies per fixture rotation."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = None
    n_total = None
    channels = bps = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            br = _BR(body)
            br.r(16), br.r(16), br.r(24), br.r(24)
            rate = br.r(20)
            channels = br.r(3) + 1
            bps = br.r(5) + 1
            n_total = br.r(36)
            if channels not in (1, 2) or bps not in (8, 16, 24):
                raise ValueError(
                    f"unsupported FLAC layout ({channels} ch, {bps}-bit; "
                    "this decoder is mono/stereo at 8/16/24-bit)"
                )
        pos += 4 + blen
        if last:
            break
    if rate is None:
        raise ValueError("missing STREAMINFO")

    # one unpack of the payload to a 0/1 bit array: the vectorized
    # subframe readers index it directly (8x the payload in memory —
    # fine for the KB..MB payloads this kernel sees per record)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))

    frames: list[np.ndarray] = []
    n_frames = 0
    layout = None
    while pos < len(data) and n_frames < (n_total or 1 << 62):
        frame_start = pos
        br = _BR(data, pos)
        sync = br.r(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at byte {frame_start}")
        br.r(1)  # reserved
        br.r(1)  # blocking strategy
        bs_code = br.r(4)
        sr_code = br.r(4)
        chan = br.r(4)
        ss_code = br.r(3)
        br.r(1)
        if chan not in _CHAN_NAMES:
            raise ValueError(
                f"unsupported channel assignment {chan} (mono/stereo only)"
            )
        nch = 1 if chan == 0 else 2
        if nch != channels:
            raise ValueError(
                f"frame channel count {nch} != STREAMINFO {channels}"
            )
        if layout is None:
            layout = _CHAN_NAMES[chan]
        if ss_code == 0b000:
            frame_bps = bps  # from STREAMINFO
        elif ss_code in _SS_BITS:
            frame_bps = _SS_BITS[ss_code]
            if frame_bps != bps:
                raise ValueError("frame sample size != STREAMINFO")
        else:
            raise ValueError(f"unsupported sample size code {ss_code:03b}")
        _read_utf8_number(br)
        if bs_code == 0b0110:
            bs = br.r(8) + 1
        elif bs_code == 0b0111:
            bs = br.r(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError(f"reserved block size code {bs_code}")
        if sr_code == 0b1100:
            br.r(8)
        elif sr_code in (0b1101, 0b1110):
            br.r(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid sample rate code")
        br.align()
        hdr_end = br.p
        if hdr_end >= len(data):
            raise ValueError("truncated frame header")
        want_crc8 = data[hdr_end]
        if _crc8(data[frame_start:hdr_end]) != want_crc8:
            raise ValueError("frame header CRC-8 mismatch")
        br = _BR(data, hdr_end + 1)

        # --- subframes (side channels carry one extra bit) ---------------
        if chan == 0b0000:
            out_blk = _read_subframe(br, bs, frame_bps, bits)
        else:
            eff0 = frame_bps + (1 if chan == 0b1001 else 0)
            eff1 = frame_bps + (1 if chan in (0b1000, 0b1010) else 0)
            c0 = _read_subframe(br, bs, eff0, bits)
            c1 = _read_subframe(br, bs, eff1, bits)
            if chan == 0b0001:  # independent L/R
                left, right = c0, c1
            elif chan == 0b1000:  # left/side
                left, right = c0, c0 - c1
            elif chan == 0b1001:  # side/right
                left, right = c1 + c0, c1
            else:  # mid/side: restore the dropped LSB from side parity
                mid2 = (c0 << 1) | (c1 & 1)
                left, right = (mid2 + c1) >> 1, (mid2 - c1) >> 1
            out_blk = np.stack([left, right], axis=1)
        br.align()
        if br.p + 2 > len(data):
            raise ValueError("truncated frame CRC")
        want_crc16 = struct.unpack(">H", data[br.p : br.p + 2])[0]
        if _crc16(data[frame_start : br.p]) != want_crc16:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.p + 2
        frames.append(out_blk)
        n_frames += out_blk.shape[0]

    if not frames:
        raise ValueError("no audio frames")
    arr = np.concatenate(frames, axis=0)
    if n_total and arr.shape[0] > n_total:
        arr = arr[:n_total]
    lim = 1 << (bps - 1)
    if arr.size and (arr.max() >= lim or arr.min() < -lim):
        raise ValueError(
            f"decoded samples exceed {bps}-bit range (corrupt stream)"
        )
    arr = arr.astype(np.int16 if bps <= 16 else np.int32)
    if channels == 1:
        arr = arr.reshape(-1)
    if return_layout:
        return arr, rate, layout
    return arr, rate


def _decode_predicted(br, bs, order, eff, coefs, bits, *, shift, lpc, warm=None):
    """Shared FIXED/LPC body: warm-up + Rice residual partitions, then
    the prediction recurrence (integer-exact per spec).

    Round-13 vectorization (guide §4.2): residual partitions decode
    through the bit-array readers, and the FIXED recurrence — the m-th
    finite difference inverted — is computed as m cumulative sums
    seeded by the warm-ups' difference pyramid (algebraically the same
    exact integer recurrence; int64 is safe because a guard falls back
    to the scalar loop for residual magnitudes that could overflow the
    cumsum intermediates). The LPC recurrence stays scalar (shift
    truncation is order-dependent per step)."""
    if warm is None:
        warm = [br.rs(eff) for _ in range(order)]
    method = br.r(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.r(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("block size not divisible by partition count")
    parts: list[np.ndarray] = []
    for part in range(nparts):
        cnt = bs // nparts - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("partition smaller than predictor order")
        k = br.r(pbits)
        if k == escape:
            raw_bits = br.r(5)
            parts.append(_read_signed_block(br, bits, cnt, raw_bits))
        else:
            parts.append(_read_rice_block(br, bits, cnt, k))
    res_arr = np.concatenate(parts) if len(parts) > 1 else parts[0]

    if not lpc:
        # FIXED order m: Δ^m x = res. Reconstruct with m cumsums; the
        # seed for level j is Δ^j x at index m-1, read off the warm-up
        # difference pyramid.
        if order == 0:
            return res_arr.copy()
        ok = int(np.abs(res_arr).max(initial=0)) <= (1 << 40) and bs <= (1 << 20)
        if ok:
            w = np.asarray(warm, dtype=np.int64)
            seeds = []
            for _ in range(order):
                seeds.append(int(w[-1]))
                w = np.diff(w)
            cur = res_arr
            for j in range(order - 1, -1, -1):
                cur = seeds[j] + np.cumsum(cur)
                # guard EVERY level: a cumsum can amplify magnitudes, and
                # a silent int64 wrap would return in-range garbage where
                # the scalar loop returns the true (huge) value
                if int(np.abs(cur).max(initial=0)) > (1 << 41):
                    ok = False
                    break
            if ok:
                return np.concatenate([np.asarray(warm, dtype=np.int64), cur])
        # fall through to the exact arbitrary-precision scalar loop for
        # adversarial residual magnitudes (never hit by valid audio)

    x = [0] * bs
    x[:order] = warm
    res = res_arr.tolist()
    for i in range(order, bs):
        pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
        if lpc:
            pred >>= shift
        x[i] = pred + res[i - order]
    return np.array(x, dtype=np.int64)


# ---------------------------------------------------------------------------
# Spark stage + registered query (the l9d/l9h closed-form playbook)
# ---------------------------------------------------------------------------


@register(
    "l9q_real_flac_decode",
    oracle=(
        "SELECT doc_id, 'audio/flac' AS mime, 1 AS ok, "
        "CAST(800 + (doc_id % 7) * 160 AS BIGINT) AS n_samples, "
        "CAST(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 2 END AS INT) AS n_channels, "
        "CASE WHEN doc_id % 2 = 1 THEN 'mono' "
        "WHEN (doc_id // 2) % 4 = 0 THEN 'lr' "
        "WHEN (doc_id // 2) % 4 = 1 THEN 'ls' "
        "WHEN (doc_id // 2) % 4 = 2 THEN 'rs' "
        "ELSE 'ms' END AS layout, "
        "CAST(CASE WHEN doc_id % 3 = 0 THEN 24 ELSE 16 END AS INT) AS bits, "
        "8000 AS sample_rate, "
        "CAST((800 + (doc_id % 7) * 160) / 8000.0 AS DOUBLE) AS duration_s, "
        "CAST((500 + (doc_id % 50) * 100) * "
        "(CASE WHEN doc_id % 3 = 0 THEN 256 ELSE 1 END) AS DOUBLE) AS rms "
        "FROM documents WHERE doc_id % 11 = 7 ORDER BY doc_id"
    ),
    tags=("L9", "multimodal", "U5"),
)
def l9q_real_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9q: REAL compressed-LOSSLESS audio decode end-to-end — FLAC
    bytes (Rice-coded fixed-prediction residuals, CRC-verified
    frames) built by the from-scratch encoder, shipped through the
    binary column, decoded by the from-scratch spec decoder, reduced
    to audio features. The fixture rotates the full round-11 layout
    family: mono (odd ids) vs stereo (even ids, right = -left) with
    the decorrelation mode cycling lr/ls/rs/ms by (doc_id//2)%4, at
    16-bit (24-bit when doc_id%3=0, amplitude scaled x256). Square
    waves (amplitude A alternating ±A per channel) keep every feature
    closed-form: RMS = A exactly in every mode (mean square is A² in
    exact integer arithmetic; mid/side sees mid=0, side=±2A and must
    reconstruct ±A), and the LAYOUT column comes from the decoded
    frame header — so the oracle hash-certifies the Rice→prediction→
    decorrelation→samples path for all four channel assignments and
    both depths every driver run. Losslessness itself (bit-exact
    round-trips on sines/noise/edge amplitudes, all modes x depths),
    CRC corruption detection, LPC/escape/5-bit-Rice decode paths, and
    truncation guards are pinned in tests/test_media_flac.py."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        modes = ["lr", "ls", "rs", "ms"]
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 800 + (d % 7) * 160
                bps = 24 if d % 3 == 0 else 16
                amp = (500 + (d % 50) * 100) * (256 if bps == 24 else 1)
                wave = _np.where(_np.arange(n) % 2 == 0, amp, -amp).astype(
                    _np.int64
                )
                if d % 2 == 1:
                    payloads.append(encode_flac(wave, 8000, bps=bps))
                else:
                    sig = _np.stack([wave, -wave], axis=1)
                    payloads.append(
                        encode_flac(sig, 8000, bps=bps, mode=modes[(d // 2) % 4])
                    )
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def one(doc_id, payload):
            base = {
                "doc_id": doc_id, "mime": "audio/flac", "ok": 1,
                "n_samples": None, "n_channels": None, "layout": None,
                "bits": None, "sample_rate": None,
                "duration_s": None, "rms": None,
            }
            try:
                x, rate, layout = decode_flac(bytes(payload), return_layout=True)
                nch = 1 if x.ndim == 1 else x.shape[1]
                ms = float(_np.mean(x.astype(_np.float64) ** 2))
                base.update(
                    n_samples=int(x.shape[0]), n_channels=nch, layout=layout,
                    bits=16 if x.dtype == _np.int16 else 24,
                    sample_rate=rate,
                    duration_s=x.shape[0] / rate,
                    rms=float(_np.sqrt(ms)),
                )
            except Exception:
                base["ok"] = 0
            return base

        for pdf in batches:
            yield _pd.DataFrame([one(r.doc_id, r.payload) for r in pdf.itertuples()])

    docs = T(spark, sf_dir, "documents").where(F.col("doc_id") % 11 == 7)
    media = docs.select("doc_id").mapInPandas(
        build, schema="doc_id BIGINT, payload BINARY"
    )
    out = media.mapInPandas(
        kernel,
        schema=(
            "doc_id BIGINT, mime STRING, ok INT, n_samples BIGINT, "
            "n_channels INT, layout STRING, bits INT, "
            "sample_rate INT, duration_s DOUBLE, rms DOUBLE"
        ),
    )
    return out.orderBy("doc_id")


# Worker-side kernels reference this module's codec functions; register
# for by-value pickling so closures stay self-contained on executors
# (the standing plain-session contract). stdlib+numpy only.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
