"""Generate the sf10 embeddings/documents slice for the dedup/ANN
handoff rehearsal (VERDICT r09 #5) — the gen_sf1.py pattern at one
more decade, restricted to the two tables the embedding/dedup
operators read (a full 100x of lineitem would be disk-heavy and adds
nothing to THIS rehearsal).

embeddings: 100 replicas with vec_id shifted by rep*OFFSET and the
vector ROTATED by a per-replica orthogonal matrix (seeded QR;
replica 0 keeps the identity). Rotation preserves every
WITHIN-replica cosine exactly in exact arithmetic — so true τ-pair
structure scales linearly by construction — while CROSS-replica
cosines fall to the near-orthogonal background (E[cos] ≈ 0 ± 1/√64),
far below SIM_TAU = 0.45. Without the rotation every vector would
gain 99 exact copies and the pair output would grow quadratically BY
CONSTRUCTION — measuring the fixture, not the engine (the same
failure mode gen_sf1.py's text salting prevents).

documents: same replication + text salting as gen_sf1.py.

Usage: python tools/gen_sf10_embed.py [--reps 100] [--out localdata/sf10_embed]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ipydataclean_spark.catalog import table_path
from ipydataclean_spark.session import get_spark

OFFSET = 10_000_000


def rotation(rep: int, dim: int) -> np.ndarray:
    """Deterministic orthogonal matrix per replica (QR of a seeded
    Gaussian; sign-fixed so the factorization is unique). Replica 0 is
    the identity — the original vectors appear verbatim."""
    if rep == 0:
        return np.eye(dim)
    rng = np.random.RandomState(100_000 + rep)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return q * np.sign(np.diag(r))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "localdata", "sf10_embed",
        ),
    )
    args = ap.parse_args()

    spark = get_spark("gen_sf10_embed")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    n_reps = args.reps

    # --- embeddings: replicate + rotate -----------------------------------
    src = spark.read.parquet(table_path(args.src, "embeddings"))
    dim = len(src.select("embedding").first().embedding)
    rots = {rep: rotation(rep, dim) for rep in range(n_reps)}

    reps = F.broadcast(
        spark.range(n_reps).select(F.col("id").cast("long").alias("__rep"))
    )

    def rotate(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                v = np.asarray(list(r.embedding), dtype=np.float64)
                w = rots[int(r.rep)] @ v
                out.append(
                    (
                        int(r.vec_id) + int(r.rep) * OFFSET,
                        [float(x) for x in w.astype(np.float32)],
                        int(r.label),
                    )
                )
            yield pd.DataFrame(out, columns=["vec_id", "embedding", "label"])

    emb = (
        src.crossJoin(reps)
        .withColumnRenamed("__rep", "rep")  # itertuples mangles dunder names
        .repartition(64)
        .mapInPandas(rotate, schema="vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    )
    emb.write.mode("overwrite").parquet(os.path.join(args.out, "embeddings.parquet"))

    # --- documents: replicate + salt (the gen_sf1.py recipe) --------------
    docs = spark.read.parquet(table_path(args.src, "documents"))
    out = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * OFFSET)
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, i: F.when(
                        (i % 5 == 0) & (F.col("__rep") > 0),
                        F.concat(w, F.lit("r"), F.col("__rep").cast("string")),
                    ).otherwise(w),
                ),
                " ",
            ),
        )
        .drop("__rep")
    )
    out.write.mode("overwrite").parquet(os.path.join(args.out, "documents.parquet"))

    n_e = spark.read.parquet(os.path.join(args.out, "embeddings.parquet")).count()
    n_d = spark.read.parquet(os.path.join(args.out, "documents.parquet")).count()
    print(f"sf10_embed written to {args.out}: embeddings={n_e}, documents={n_d}")


if __name__ == "__main__":
    main()
