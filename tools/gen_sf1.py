"""Generate a ~10x fixture (sf1) from sf0.1 for scaling spot-checks.

VERDICT r01 #9: validate the near-linear-scaling claims empirically at
one decade above the bench fixture. The driver owns /root/testdata
(read-only), so sf1 is derived locally into localdata/sf1 (gitignored):
each table is replicated REPS times with key columns shifted by
rep*OFFSET so join cardinalities scale linearly (each replica joins only
within itself; nation/region stay as shared dims, matching TPC-H's
fixed-size dimension semantics).

documents.text is salted per replica (every 5th word gets a rep suffix)
so cross-replica pairs fall below the near-dup Jaccard threshold —
without this, every doc would gain 9 near-identical copies and the LSH
pair output would grow quadratically BY CONSTRUCTION, which would
measure the fixture, not the engine.

events.ts is copied in whatever physical type the source fixture has
(nanos-as-long BIGINT or micros TIMESTAMP_NTZ, depending on fixture
vintage); catalog.normalize_events_ts dispatches on the observed type
at read time, so sf1 loads identically either way.

Usage: python tools/gen_sf1.py [--reps 10] [--out localdata/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ipydataclean_spark.catalog import TABLES, table_path
from ipydataclean_spark.session import get_spark

OFFSET = 10_000_000

KEY_SHIFTS: dict[str, list[str] | None] = {
    "region": None,
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "localdata", "sf1"))
    # --files N (round 13): write each replicated fact table as N part
    # files instead of the legacy coalesced 1-2. The legacy single-file
    # layout is ONE parquet row group (6M rows), which is physically
    # unsplittable — every scan runs as one task no matter the core
    # count, so the core-scaling probe reads ~1 regardless of engine
    # parallelism (the r12 driver's suspect_cpus_ignored). A multi-file
    # layout is also the realistic production shape (guide §6). Row
    # CONTENT is identical either way — only file assignment changes —
    # so per-query results are unaffected (hash compare is
    # order-insensitive). Default 0 keeps the legacy layout so existing
    # sf1 book rows stay comparable.
    ap.add_argument("--files", type=int, default=0)
    args = ap.parse_args()

    spark = get_spark("gen_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(args.out, exist_ok=True)

    reps = F.broadcast(
        spark.range(args.reps).select(F.col("id").cast("long").alias("__rep"))
    )
    for name in TABLES:
        src = spark.read.parquet(table_path(args.src, name))
        keys = KEY_SHIFTS[name]
        if keys is None:
            out = src
        else:
            out = src.crossJoin(reps).withColumns(
                {k: F.col(k) + F.col("__rep") * OFFSET for k in keys}
            )
            if name == "documents":
                out = out.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda w, i: F.when(
                                i % 5 == 3,
                                F.concat(w, F.lit("x"), F.col("__rep").cast("string")),
                            ).otherwise(w),
                        ),
                        " ",
                    ),
                )
            out = out.drop("__rep")
        if args.files > 0 and keys is not None:
            out = out.repartition(args.files)
        else:
            out = out.coalesce(max(1, args.reps // 2))
        out.write.mode("overwrite").parquet(table_path(args.out, name))
        print(f"{name}: {out.count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
