"""L9n/L9o — JPEG modality queries (VERDICT r09 #4).

Wires the from-scratch baseline JPEG codec (functions/jpeg.py, ITU-T
T.81) into the L9 multimodal surface:

- ``l9n_real_jpeg_decode``: the l9g PNG playbook for the photographic
  format — REAL compressed bytes through the binary column, decoded
  by the spec decoder, reduced to pixel stats. Constant-GRAY fixtures
  + the all-ones quantization table make the lossy codec bit-exact on
  the fixture subset (functions/jpeg.py docstring), so the query has
  a full closed-form SQL ORACLE: a hash match certifies the entire
  huffman->dequant->IDCT->YCbCr path, across 4:4:4, 4:2:0, and
  restart-marker variants (all three exercised by doc_id parity).
- ``l9o_mjpeg_frame_dhash``: the l9l/l9m video near-dup pipeline over
  a THIRD container — Motion-JPEG AVI (each frame a complete baseline
  JPEG in a '00dc' chunk). Same stride-2 sampling, same dhash64, same
  collapse-then-band pair stage; q=0 keeps the grayscale-valued
  fixture clips bit-exact, so MJPEG fingerprints equal the raw-DIB
  and Y4M fingerprints clip-for-clip (the cross-container pin, now
  covering a COMPRESSED container — real crawled video is never raw).

Scale notes: decode/encode are Arrow-batched narrow maps (per-payload
cost linear in bytes, no shuffle); the pair stage inherits l9l's
collapse-then-band sub-quadratic shape. The doc slice is
repartitioned before the encode map — JPEG entropy coding is ~10x a
raw-container pack, and a small parquet slice otherwise arrives as
one split and serializes the whole fixture build through a single
task (the round-9 single-task lesson).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions.jpeg import decode_jpeg, encode_jpeg
from ipydataclean_spark.operators.media_codecs import (
    attach_video_payloads,
    encode_avi_mjpeg,
    decode_avi,
    video_frame_dhash,
    video_neardup_pairs,
)
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


@register(
    "l9n_real_jpeg_decode",
    oracle=(
        "SELECT doc_id, 'image/jpeg' AS mime, 1 AS ok, "
        "CAST(6 + doc_id % 5 AS INT) AS width, "
        "CAST(4 + doc_id % 3 AS INT) AS height, "
        "CAST((7 * doc_id) % 256 AS DOUBLE) AS mean_r, "
        "CAST((7 * doc_id) % 256 AS DOUBLE) AS mean_g, "
        "CAST((7 * doc_id) % 256 AS DOUBLE) AS mean_b "
        "FROM documents WHERE doc_id % 11 = 5 ORDER BY doc_id"
    ),
    tags=("L9", "multimodal", "U5"),
)
def l9n_real_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9n: REAL JPEG decode end-to-end — baseline JPEG bytes (DCT +
    canonical-Huffman entropy coding, the photographic format of every
    web corpus) built by the from-scratch encoder, shipped through the
    binary column, decoded by the from-scratch T.81 decoder, reduced
    to pixel stats. Fixtures are constant-GRAY images under the
    all-ones quantization table, which the codec round-trips
    BIT-EXACTLY (functions/jpeg.py), so every feature is closed-form
    for the oracle — a hash match certifies the full
    huffman->dequant->IDCT->YCbCr pixel path, not just shapes.
    doc_id parity rotates the encoder through 4:4:4 / 4:2:0 chroma,
    restart-interval 0/1/2, and (round 11) the full SCAN-SHAPE family
    — baseline single-scan, PROGRESSIVE with successive approximation,
    progressive spectral-selection-only, and multi-scan sequential —
    so the oracle certifies every decoder entropy model every run
    (the scripted encoders transport the same coefficients, so the
    constant-gray exactness is unchanged — pinned by
    test_progressive_constant_gray_bit_exact). Lossy-path error
    bounds, the hand-crafted byte-stream decode vector, the
    progressive==baseline equality sweep, and poison-pill guards
    (unsupported SOF, truncation, bad restart, incomplete multi-scan)
    are pinned in tests/test_media_jpeg.py."""

    from ipydataclean_spark.functions.jpeg import (
        encode_jpeg_multiscan as _ems,
        encode_jpeg_progressive as _ep,
    )

    # closure-bound OUTSIDE the kernel (both modules are registered
    # for by-value pickling; a package import inside the kernel dies
    # with ModuleNotFoundError on plain-session workers)
    encoders = [
        encode_jpeg,
        lambda px, **kw: _ep(px, successive=True, **kw),
        lambda px, **kw: _ep(px, successive=False, **kw),
        _ems,
    ]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 6 + d % 5, 4 + d % 3
                v = (7 * d) % 256
                px = _np.full((h, w, 3), v, dtype=_np.uint8)
                payloads.append(
                    encoders[d % 4](
                        px, q=0, subsample=bool(d % 2), restart_interval=d % 3
                    )
                )
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def one(doc_id, payload):
            base = {
                "doc_id": doc_id, "mime": "image/jpeg", "ok": 1,
                "width": None, "height": None,
                "mean_r": None, "mean_g": None, "mean_b": None,
            }
            try:
                px = decode_jpeg(bytes(payload))
                m = px.reshape(-1, 3).mean(axis=0)
                base.update(
                    width=px.shape[1], height=px.shape[0],
                    mean_r=round(float(m[0]), 8),
                    mean_g=round(float(m[1]), 8),
                    mean_b=round(float(m[2]), 8),
                )
            except Exception:
                base["ok"] = 0
            return base

        for pdf in batches:
            yield _pd.DataFrame([one(r.doc_id, r.payload) for r in pdf.itertuples()])

    docs = T(spark, sf_dir, "documents").where(F.col("doc_id") % 11 == 5)
    media = docs.select("doc_id").mapInPandas(
        build, schema="doc_id BIGINT, payload BINARY"
    )
    out = media.mapInPandas(
        kernel,
        schema=(
            "doc_id BIGINT, mime STRING, ok INT, width INT, height INT, "
            "mean_r DOUBLE, mean_g DOUBLE, mean_b DOUBLE"
        ),
    )
    return out.orderBy("doc_id")


@register(
    "l9o_mjpeg_frame_dhash",
    oracle=None,  # payload bytes are invisible to SQL; goldens pin semantics
    tags=("L9", "L2", "multimodal", "dedup", "video"),
)
def l9o_mjpeg_frame_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9o: the video near-dup pipeline over a COMPRESSED container —
    Motion-JPEG AVI (biCompression='MJPG', each frame a complete
    baseline JPEG) through the SAME stride-2 frame sampling, the SAME
    dhash64, and the SAME collapse-then-band pair stage as l9l/l9m.
    The fixture clips are grayscale-valued, and q=0 MJPEG round-trips
    those BIT-EXACTLY (functions/jpeg.py constant-gray property, which
    extends to any grayscale-valued pixels only in the Y channel —
    the codec test pins full-clip equality), so the cross-container
    contract now spans raw Y4M, raw-DIB AVI, and entropy-coded MJPEG
    AVI: one clip set, three containers, IDENTICAL per-frame dHash
    tables (pinned in tests/test_media_jpeg.py). Brightened twins at
    doc_id+3000000 collapse into their originals' signature clusters
    exactly as in l9l. Rows-only by design: SQL cannot see pixels.

    Scale: JPEG entropy decode is the expensive fixture step, so the
    doc slice is spread across defaultParallelism tasks up front; the
    product path (decode+hash) stays a narrow Arrow-batched map."""
    docs = T(spark, sf_dir, "documents").where(
        (F.col("doc_id") % 10 == 5) | (F.col("doc_id") % 10 == 0)
    )
    n_tasks = spark.sparkContext.defaultParallelism
    docs = docs.repartition(n_tasks, "doc_id")
    fdh = video_frame_dhash(
        attach_video_payloads(docs, encoder=encode_avi_mjpeg),
        decoder=decode_avi,
    )
    pairs = video_neardup_pairs(fdh)
    return pairs.select(
        "doc_a", "doc_b", "n_frames_matched", "n_frames_sampled",
        "max_hamming", "all_frames_matched", "n_pairs",
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# L9p — perceptual pHash (DCT low-frequency hash) + near-dup pairs
# ---------------------------------------------------------------------------

import numpy as np


def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal n-point DCT-II matrix (the functions/jpeg.py 8x8
    basis generalized): A[u,x] = c(u)*sqrt(2/n)*cos((2x+1)u*pi/2n),
    c(0)=1/sqrt(2)."""
    return np.array(
        [
            [
                (np.sqrt(0.5) if u == 0 else 1.0)
                * np.sqrt(2.0 / n)
                * np.cos((2 * x + 1) * u * np.pi / (2.0 * n))
                for x in range(n)
            ]
            for u in range(n)
        ]
    )


_DCT32 = dct_matrix(32)


def phash64(px: np.ndarray) -> int:
    """64-bit perceptual hash (the classic pHash recipe): integer luma
    (the l9f/dhash64 weights, platform-deterministic), 32x32
    grid sample, 2-D orthonormal DCT, keep the top-left 8x8
    low-frequency block, threshold its 63 AC coefficients at their
    median. Properties the tests pin: EXACTLY invariant to uniform
    brightness shifts (a constant adds only to the DC basis — every
    AC row of the DCT matrix sums to 0), robust to per-pixel noise
    and moderate rescaling (low-frequency content dominates), and
    63 live bits — NOT a narrower fingerprint that would degenerate
    the 8x8 bander's high bands (the l9k lesson; one constant bit in
    one band is harmless)."""
    h, w, _ = px.shape
    g = (
        px[:, :, 0].astype(np.int64) * 299
        + px[:, :, 1].astype(np.int64) * 587
        + px[:, :, 2].astype(np.int64) * 114
    )
    rows = (np.arange(32) * h) // 32
    cols = (np.arange(32) * w) // 32
    grid = g[np.ix_(rows, cols)].astype(np.float64)
    freq = _DCT32 @ grid @ _DCT32.T
    ac = freq[:8, :8].ravel()[1:]  # 63 low-frequency AC coefficients
    med = float(np.median(ac))
    out = 0
    for v in ac:
        out = (out << 1) | int(v > med)
    return out


def image_phash(media: DataFrame) -> DataFrame:
    """payload BINARY -> (doc_id, dhash BIGINT) with dhash = pHash —
    the column keeps the bander's name so ONE pair stage
    (media_codecs.dhash_neardup_pairs) serves both fingerprints.
    Arrow-batched narrow map; undecodable payloads dropped."""
    from ipydataclean_spark.operators.media_codecs import decode_bmp

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, hashes = [], []
            for r in pdf.itertuples():
                try:
                    px = decode_bmp(bytes(r.payload))
                except Exception:
                    continue
                ids.append(r.doc_id)
                hv = phash64(px)
                hashes.append(hv - (1 << 64) if hv >= (1 << 63) else hv)
            yield _pd.DataFrame(
                {"doc_id": ids, "dhash": _pd.Series(hashes, dtype="int64")}
            )

    return media.mapInPandas(kernel, schema="doc_id BIGINT, dhash BIGINT")


#: the 128 lowest-frequency AC positions of the 32x32 DCT in
#: diagonal (u+v, then u) order, DC excluded — all inside the 16x16
#: low-frequency corner (u+v <= 15 yields 136 positions; the first
#: 128 after dropping DC). Deterministic, and every selected basis
#: function has u+v > 0, so the EXACT brightness invariance argument
#: of phash64 carries over unchanged.
_ZZ128 = sorted(
    ((u, v) for u in range(16) for v in range(16)),
    key=lambda t: (t[0] + t[1], t[0]),
)[1:129]


def phash128(px: np.ndarray) -> tuple[int, int]:
    """128-bit perceptual hash -> (hi, lo) signed 64-bit halves (bits
    127..64 / 63..0, Spark LongType) — phash64 widened for the
    10^8-row banding regime (VERDICT r11 #7): same integer luma,
    32x32 grid sample, and orthonormal 2-D DCT, but thresholding the
    128 lowest AC coefficients (diagonal order) at their median
    instead of the 8x8 block's 63. The median split sets exactly 64
    bits on distinct coefficients, so all 16 bands of the 16x8
    bander stay live (the l9k degenerate-band lesson), and DC
    exclusion keeps uniform-brightness invariance EXACT."""
    h, w, _ = px.shape
    g = (
        px[:, :, 0].astype(np.int64) * 299
        + px[:, :, 1].astype(np.int64) * 587
        + px[:, :, 2].astype(np.int64) * 114
    )
    rows = (np.arange(32) * h) // 32
    cols = (np.arange(32) * w) // 32
    grid = g[np.ix_(rows, cols)].astype(np.float64)
    freq = _DCT32 @ grid @ _DCT32.T
    ac = np.array([freq[u, v] for u, v in _ZZ128])
    med = float(np.median(ac))
    out = 0
    for v in ac:
        out = (out << 1) | int(v > med)
    hi, lo = out >> 64, out & ((1 << 64) - 1)
    to_signed = lambda x: x - (1 << 64) if x >= (1 << 63) else x  # noqa: E731
    return to_signed(hi), to_signed(lo)


def image_phash128(media: DataFrame) -> DataFrame:
    """payload BINARY -> (doc_id, phi BIGINT, plo BIGINT). Arrow-
    batched narrow map; undecodable payloads dropped."""
    from ipydataclean_spark.operators.media_codecs import decode_bmp

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, his, los = [], [], []
            for r in pdf.itertuples():
                try:
                    px = decode_bmp(bytes(r.payload))
                except Exception:
                    continue
                hi, lo = phash128(px)
                ids.append(r.doc_id)
                his.append(hi)
                los.append(lo)
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "phi": _pd.Series(his, dtype="int64"),
                    "plo": _pd.Series(los, dtype="int64"),
                }
            )

    return media.mapInPandas(kernel, schema="doc_id BIGINT, phi BIGINT, plo BIGINT")


def phash128_neardup_pairs(hashes: DataFrame, max_hamming: int = 15) -> DataFrame:
    """dhash_neardup_pairs at the 128-bit (phi, plo) grain: exact-dup
    cluster collapse (only DISTINCT hashes enter the band join), 16x8
    banding (complete for hamming <= 15 by pigeonhole), exact
    popcount filter as bit_count(phi XOR phi') + bit_count(plo XOR
    plo'). Same aggregate pair-table output shape as the 64-bit
    stage. ``phash128_probe_banded`` below is the probe-grain
    sibling (history-store lookup, the media_probe_banded contract
    at the wide grain)."""
    from ipydataclean_spark.operators.media_codecs import band16

    clusters = hashes.groupBy("phi", "plo").agg(
        F.min("doc_id").alias("rep"),
        F.count(F.lit(1)).alias("size"),
    )
    within = clusters.where(F.col("size") > 1).select(
        F.col("rep").alias("doc_a"),
        F.col("rep").alias("doc_b"),
        F.lit(0).alias("hamming"),
        (F.col("size") * (F.col("size") - 1) / 2).cast("long").alias("n_pairs"),
    )
    bands = band16(clusters.select("rep", "phi", "plo", "size"))
    a, b = bands.alias("a"), bands.alias("b")
    across = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.rep") < F.col("b.rep")),
        )
        .select(
            F.col("a.rep").alias("doc_a"),
            F.col("b.rep").alias("doc_b"),
            (
                F.bit_count(F.col("a.phi").bitwiseXOR(F.col("b.phi")))
                + F.bit_count(F.col("a.plo").bitwiseXOR(F.col("b.plo")))
            ).alias("hamming"),
            (F.col("a.size") * F.col("b.size")).cast("long").alias("n_pairs"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return within.unionByName(across)


def phash128_probe_banded(
    probe_hashes: DataFrame, store_hashes: DataFrame, *, max_hamming: int = 15
) -> DataFrame:
    """``stream.media_probe_banded`` at the 128-bit grain: probe
    (doc_id, phi, plo) rows against a persisted (phi, plo) history
    TABLE of any size — band16 equi-join over DISTINCT hashes on both
    sides (pigeonhole-complete for hamming <= 15), exact two-half
    popcount filter, min per probe hash, joined back to the doc
    grain. min_hamming is CLAMPED at max_hamming + 1 (novel rows),
    the same contract that makes the 64-bit closure/banded strategies
    bit-identical — so a pHash-grain history that outgrows
    MEDIA_STORE_CAP has the same no-hard-stop scale path the dHash
    grain got in round 11. Equality against the brute-force popcount
    minimum is pinned in tests/test_media_jpeg.py."""
    if max_hamming > 15:
        raise ValueError("band16 is pigeonhole-complete only for max_hamming <= 15")
    from ipydataclean_spark.operators.media_codecs import band16

    probe_bands = band16(probe_hashes.select("phi", "plo").distinct())
    store_bands = band16(
        store_hashes.select(
            F.col("phi").alias("__shi"), F.col("plo").alias("__slo")
        ).distinct(),
        "__shi",
        "__slo",
    )
    matched = (
        probe_bands.join(store_bands, ["band", "key"])
        .select(
            "phi",
            "plo",
            (
                F.bit_count(F.col("phi").bitwiseXOR(F.col("__shi")))
                + F.bit_count(F.col("plo").bitwiseXOR(F.col("__slo")))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .groupBy("phi", "plo")
        .agg(F.min("hamming").alias("__mh"))
    )
    return probe_hashes.join(matched, ["phi", "plo"], "left").select(
        "doc_id",
        "phi",
        "plo",
        F.coalesce(F.col("__mh"), F.lit(max_hamming + 1))
        .cast("int")
        .alias("min_hamming"),
        F.when(F.col("__mh").isNotNull(), F.lit("dup_of_history"))
        .otherwise(F.lit("novel"))
        .alias("status"),
    )


@register(
    "l9r_image_phash128_pairs",
    oracle=None,  # payload bytes are invisible to SQL; goldens pin semantics
    tags=("L9", "L2", "multimodal", "dedup"),
)
def l9r_image_phash128_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9r: perceptual near-dup detection at the 128-bit pHash grain —
    the wide-fingerprint escalation band8's docstring reserves for
    10^8-row stores (VERDICT r11 #7), now a first-class query:
    image_phash128 (two-BIGINT hash columns) -> exact-hash cluster
    collapse -> band16 hamming join (complete for hamming <= 15).
    The +24-brightened twins collapse into their originals' clusters
    (DC exclusion makes brightness invariance EXACT at 128 bits too).
    Rows-only by design; cross-strategy equality vs the brute-force
    all-pairs popcount join, band liveness (all 16 bands carry >1
    key), and planted-pair completeness are pinned in
    tests/test_media_jpeg.py."""
    from ipydataclean_spark.operators.media_codecs import (
        attach_patterned_payloads,
    )

    docs = T(spark, sf_dir, "documents").where(
        (F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 10 == 0)
    )
    pairs = phash128_neardup_pairs(image_phash128(attach_patterned_payloads(docs)))
    return pairs.orderBy("doc_a", "doc_b")


@register(
    "l9p_image_phash_pairs",
    oracle=None,  # payload bytes are invisible to SQL; goldens pin semantics
    tags=("L9", "L2", "multimodal", "dedup"),
)
def l9p_image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9p: perceptual near-dup detection via pHash — the DCT
    low-frequency hash, the industry-standard companion to l9f's
    dHash (dHash sees local gradients; pHash sees global structure,
    so it survives noise and rescaling that flip dHash bits). The
    round-10 JPEG work made it nearly free: the same orthonormal DCT
    basis drives both the codec and the hash. Pipeline identical to
    l9f — exact-hash cluster collapse, then the banded hamming join
    over DISTINCT hashes (sub-quadratic; popular images contribute
    one banding row each) — with the +24-brightened twins collapsing
    into their originals' clusters (pHash brightness invariance is
    EXACT: a constant shift touches only the DC basis). Rows-only by
    design; invariance/robustness/recall pinned in
    tests/test_media_jpeg.py."""
    from ipydataclean_spark.operators.media_codecs import (
        attach_patterned_payloads,
        dhash_neardup_pairs,
    )

    docs = T(spark, sf_dir, "documents").where(
        (F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 10 == 0)
    )
    pairs = dhash_neardup_pairs(image_phash(attach_patterned_payloads(docs)))
    return pairs.orderBy("doc_a", "doc_b")


# Worker-side kernels reference encode_jpeg/decode_jpeg through this
# module's closures; functions/jpeg.py and media_codecs.py are already
# registered for by-value pickling, and this module adds itself so the
# build/kernel closures stay self-contained on executors (the standing
# plain-session contract).
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
