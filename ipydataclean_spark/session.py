"""SparkSession construction with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the
same configs are what we'd set on a 1000-executor cluster, modulo
sizing: AQE handles runtime re-planning (partition coalescing, skew
joins), broadcast threshold keeps dimension joins shuffle-free, and
the session timezone is pinned to UTC so timestamp semantics match
the DuckDB oracle and are cluster-invariant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ipydataclean-spark", cpus: int | str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Knobs chosen for scale (SURVEY.md §4.2):
      - AQE on: runtime partition coalescing + skew-join splitting means
        one static ``shuffle.partitions`` setting survives a 100× scale-up.
      - broadcast threshold 64 MB: region/nation/supplier/part-sized dims
        never shuffle.
      - Arrow enabled: any pandas_udf / toPandas path is Arrow-batched.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Single-threaded BLAS in Python workers: pyspark workers FORK
    # from the daemon, and a multi-threaded OpenBLAS inherited across
    # fork crashes inside matmul ("Python worker exited unexpectedly"
    # — reproduced at the sf10 rehearsal, round 10; single-threading
    # fixed it outright). Set BEFORE the JVM launches so every forked
    # worker inherits it; Spark-level task parallelism already uses
    # all cores, so per-task BLAS threading is pure oversubscription
    # anyway. On a real cluster, ship the same via
    # spark.executorEnv.OPENBLAS_NUM_THREADS=1. FORCED, not
    # setdefault (ADVICE r10 #5): a user environment exporting a
    # multi-threaded value would silently re-introduce the documented
    # fork crash — warn and override.
    preset = os.environ.get("OPENBLAS_NUM_THREADS")
    if preset not in (None, "1"):
        import warnings

        warnings.warn(
            f"OPENBLAS_NUM_THREADS={preset} overridden to 1: forked "
            "pyspark workers crash inside multi-threaded OpenBLAS",
            stacklevel=2,
        )
    os.environ["OPENBLAS_NUM_THREADS"] = "1"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.ui.enabled", "false")
        # shuffle/spill codec, parameterized (guide §2.3): lz4 is the
        # Spark default and stays the local default — measured FLAT on
        # this class of single-node hosts twice (rounds 12 and 13,
        # tools/ab_codec.py) because local shuffles never cross a NIC.
        # On a real cluster zstd's better ratio usually wins once
        # shuffle bytes cross the network; flip with
        # SPARK_GRAFT_IO_CODEC=zstd and re-measure there.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
    )
    # fastagg jar (jvm/Decimal128Sum.scala): the codegen'd int128 exact
    # decimal sum behind functions/exact.py. extraClassPath puts it on
    # the system classpath (needed for py4j expression construction and
    # whole-stage-codegen compilation); it only takes effect when this
    # call launches the JVM — a pre-existing session without it simply
    # leaves exact.py on its built-in fallback (identical results).
    jar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "jars", "ipydataclean-fastagg.jar"
    )
    if os.path.exists(jar):
        builder = builder.config("spark.jars", jar).config(
            "spark.driver.extraClassPath", jar
        )
    return builder.getOrCreate()
