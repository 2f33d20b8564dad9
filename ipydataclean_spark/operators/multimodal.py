"""Multimodal columns — SURVEY.md §2.9 L9.

Images/audio/video are opaque ``binary`` payloads with a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
pandas over ``mapInPandas``. The image/audio codec libraries are not
in this container, so the decode kernel is STUBBED with a
deterministic fake (documented below); the Spark-side plumbing —
schema, batch iteration, partition shape — is real and is what the
operator contract tests.

At scale: binary payloads ride in parquet row groups; metadata-only
queries never touch the bytes (column pruning), and the decode stage
is a narrow map (no shuffle) sized by ``maxPartitionBytes``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

MEDIA_SCHEMA = (
    "doc_id BIGINT, mime STRING, n_bytes BIGINT, width INT, height INT, ok INT"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """L9 ingest: text → utf-8 bytes stand-in for a media payload, plus
    a typed metadata struct (mime inferred from a stable key)."""
    mime = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """L9 decode/feature stage: Arrow-batched mapInPandas (narrow map).

    The kernel is a LOCAL function so cloudpickle serializes it by
    value — executors never need this package importable (the driver
    process may run from any cwd; workers have their own sys.path).
    """

    def decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # STUB decode kernel (no codec libs in this container):
        # deterministic fake features from payload length only — swap in
        # PIL/librosa/pyav here in a real deployment; signature, schema,
        # and Arrow batching are production-shaped.
        import pandas as _pd

        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["media_meta"].map(lambda m: m["mime"]),
                    "n_bytes": n,
                    "width": (n % 640).astype("int32"),
                    "height": ((n * 7) % 480).astype("int32"),
                    "ok": _pd.Series([1] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(decode_stub, schema=MEDIA_SCHEMA)


@register(
    "l9_multimodal_features",
    oracle=(
        "SELECT doc_id, "
        "CASE WHEN doc_id % 3 = 0 THEN 'image/png' WHEN doc_id % 3 = 1 THEN 'audio/wav' "
        "ELSE 'video/mp4' END AS mime, "
        "CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes, "
        "CAST(OCTET_LENGTH(ENCODE(text)) % 640 AS INTEGER) AS width, "
        "CAST((OCTET_LENGTH(ENCODE(text)) * 7) % 480 AS INTEGER) AS height, "
        "1 AS ok FROM documents WHERE doc_id % 6 = 0 ORDER BY doc_id"
    ),
    tags=("L9", "U5"),
)
def l9_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9 end-to-end: binary payload column + metadata struct →
    mapInPandas decode stub → typed feature rows. The oracle replays
    the deterministic stub arithmetic in SQL, so the whole pandas
    plumbing (schema, Arrow batches) is hash-checked."""
    docs = T(spark, sf_dir, "documents").where(F.col("doc_id") % 6 == 0)
    media = attach_binary_payload(docs)
    out = extract_media_features(media)
    return out.select(
        "doc_id",
        "mime",
        "n_bytes",
        "width",
        "height",
        F.col("ok").cast("int").alias("ok"),
    ).orderBy("doc_id")


RESIZE_SCHEMA = "doc_id BIGINT, mime STRING, thumb BINARY, thumb_bytes INT, thumb_md5 STRING"


def resize_media(media: DataFrame, thumb_size: int = 64) -> DataFrame:
    """L9 resize stage: Arrow-batched mapInPandas, binary in → binary
    out. The STUB "resize" truncates the payload to thumb_size bytes
    (no codec libs in this container — swap in PIL thumbnailing here);
    the production-shaped parts are the binary column round-trip
    through Arrow, the per-batch kernel, and the narrow-map plan
    (no shuffle; partitions sized by maxPartitionBytes carry the
    payload bytes exactly once)."""

    def resize_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            thumbs = pdf["payload"].map(lambda b: bytes(b)[:thumb_size])
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["media_meta"].map(lambda m: m["mime"]),
                    "thumb": thumbs,
                    "thumb_bytes": thumbs.map(len).astype("int32"),
                    "thumb_md5": thumbs.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return media.mapInPandas(resize_stub, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """L9 frame-sample stage — pure built-ins, NO Python in the loop:
    n_frames evenly-spaced offsets per video payload via
    sequence+transform, exploded, then binary substring slices the
    "frame" bytes JVM-side. Only the codec decode of a frame needs a
    UDF (and that decode is the stubbed part of this container);
    the sampling itself is whole-stage-codegen."""
    video = media.where(F.col("media_meta.mime") == "video/mp4")
    stride = (F.col("media_meta.n_bytes").cast("double") / F.lit(n_frames)).cast("long")
    offs = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: i.cast("long") * stride,
    )
    return video.select(
        "doc_id", F.col("media_meta.n_bytes").alias("n_bytes"), "payload",
        F.posexplode(offs).alias("frame_idx", "frame_off"),
    ).select(
        "doc_id",
        "frame_idx",
        "frame_off",
        F.expr(f"substring(payload, cast(frame_off + 1 AS INT), {frame_bytes})").alias("frame"),
    )


@register("l9b_media_resize", oracle=None, tags=("L9", "multimodal", "U5"))
def l9b_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9b: thumbnail/resize summary per mime — counts and md5-distinct
    thumbs prove the binary round-trip (rows-only; pytest checks the
    md5s against driver-side hashlib on samples)."""
    media = attach_binary_payload(T(spark, sf_dir, "documents"))
    thumbs = resize_media(media)
    return (
        thumbs.groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("thumb_md5").alias("n_distinct_thumbs"),
            F.max("thumb_bytes").alias("max_thumb_bytes"),
        )
        .orderBy("mime")
    )


@register("l9c_frame_sample", oracle=None, tags=("L9", "multimodal"))
def l9c_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9c: per-video frame sampling — 4 evenly-spaced binary slices
    per payload, all JVM-side (rows-only; pytest pins offsets/shapes)."""
    media = attach_binary_payload(T(spark, sf_dir, "documents"))
    frames = sample_frames(media)
    return frames.select(
        "doc_id", "frame_idx", "frame_off", F.octet_length("frame").alias("frame_len")
    ).orderBy("doc_id", "frame_idx")


@register(
    "l9j_binaryfile_ingest",
    oracle=(
        "SELECT doc_id, CAST(octet_length(blob) AS BIGINT) AS n_bytes, "
        "substr(hex, 1, 8) AS magic_hex FROM ("
        "SELECT doc_id, encode(text) AS blob, "
        "lower(hex(encode(text))) AS hex "
        "FROM documents WHERE doc_id % 29 = 3 AND text IS NOT NULL) ORDER BY doc_id"
    ),
    tags=("L9", "S2", "multimodal"),
)
def l9j_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9j: the DIRECTORY-OF-FILES ingestion path for multimodal data
    — materialize a payload per selected doc as a real file on disk,
    then read the directory back through Spark's ``binaryFile``
    source (path/length/modificationTime/content schema; the same
    reader a 100 TB image/audio corpus enters the engine through,
    where partition-pruned listing + per-file tasks replace the
    in-table binary column). The doc id rides IN THE FILENAME
    (``<doc_id>.bin``) — the standard layout trick so ingestion needs
    no sidecar manifest; it is parsed back out of ``path`` with one
    regexp. The oracle recomputes payload length and magic bytes from
    the source table, so the hash certifies the file round-trip
    byte-for-byte (length + leading bytes), not just row counts.

    At scale: binaryFile caps file splits at
    ``spark.sql.files.maxPartitionBytes`` per task and prunes on
    pushed path filters; the write side here is a one-off fixture
    materialization (foreachPartition, executor-side writes), which
    REQUIRES a filesystem shared between executors and driver — true
    for local mode and for any cluster writing to distributed/object
    storage, NOT for executor-local disks (the read would silently
    list an empty driver-side directory). NULL-text docs are filtered
    before the write (bytes(None) would kill the task)."""
    import pathlib

    from ipydataclean_spark.operators.qhelp import scratch_dir

    out_dir = pathlib.Path(scratch_dir(spark, "l9j"))
    out_dir.mkdir(parents=True, exist_ok=True)
    sel = (
        T(spark, sf_dir, "documents")
        .where((F.col("doc_id") % 29 == 3) & F.col("text").isNotNull())
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )
    target = str(out_dir)

    def write_files(rows):
        import os as _os

        for r in rows:
            tmp = _os.path.join(target, f".{r['doc_id']}.tmp")
            with open(tmp, "wb") as f:
                f.write(bytes(r["payload"]))
            _os.replace(tmp, _os.path.join(target, f"{r['doc_id']}.bin"))

    sel.foreachPartition(write_files)

    files = spark.read.format("binaryFile").load(target)
    return (
        files.select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.lower(F.hex(F.substring(F.col("content"), 1, 4))).alias("magic_hex"),
        )
        .orderBy("doc_id")
    )
