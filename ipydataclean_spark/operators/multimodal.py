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
