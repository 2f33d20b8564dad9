"""Distributed global ordering primitives (rank / ntile / running sum)
without a single-partition WindowExec.

Why: ``F.row_number().over(Window.orderBy(...))`` — and every analytic
built on it (NTILE, running totals, Pareto curves) — funnels the ENTIRE
input through one task. Fine at 60k rows; a straggler wall at 10^9.
The scalable equivalent is the classic three-step ranking pattern:

1. ``repartitionByRange`` on the order key — the range partitioner
   gives a TOTAL order across partitions (every row in partition i
   sorts before every row in partition i+1);
2. rank/prefix-sum WITHIN each partition in parallel (a keyed
   WindowExec partitioned by ``spark_partition_id()``);
3. add per-partition offsets from a P-row side plan (P = shuffle
   partition count): one groupBy over the materialized partitioning,
   a window over those P rows (trivially small), broadcast-joined
   back.

The range-partitioned table is pinned with an EAGER localCheckpoint
before it fans out to the offsets branch and the rank branch. This is
load-bearing for CORRECTNESS, not a cache tweak: repartitionByRange
samples its boundaries at exchange-execution time, and nothing
guarantees the two consumers reuse one execution (exchange/stage
reuse across self-join-dedup'd branches is unreliable — measured
elsewhere in this repo — and a stage retry re-samples). If the two
branches ever saw different boundary draws, the offsets would be
computed for a different partition assignment than the ranks and the
output would be silently wrong. The checkpoint makes the partition
ids a materialized fact both branches read.

Result: bit-identical semantics to the global window — exact ranks,
exact NTILE assignment, exact decimal running sums — with the sort,
rank, and sum all parallel. Determinism requires the order to be
TOTAL (pass a tie-breaking key); range-boundary placement then cannot
change any rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rnk_pid"


def _range_partitioned(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    try:
        # "auto" on runtimes with AQE auto-optimized shuffle
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    except ValueError:
        n = df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    # eager checkpoint: see module docstring — the partition ids MUST
    # come from exactly one boundary draw
    return part.localCheckpoint(eager=True)


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rnk",
    running_sums: dict[str, Column] | None = None,
) -> DataFrame:
    """Append an exact 1-based global ``row_number`` over a TOTAL order
    (and optionally exact running sums over the same order, inclusive
    of the current row) with no unpartitioned window.

    ``order_cols`` must define a total order (include a unique
    tie-breaker). ``running_sums`` maps output name -> expression to
    accumulate; pass decimal-cast expressions for order-independent
    exactness (functions/exact.py rules).
    """
    sums = running_sums or {}
    part = _range_partitioned(df, order_cols)

    # P-row side plan: per-partition counts/sums -> exclusive offsets.
    # The window below runs over ≤ shuffle-partition-count rows.
    agg_exprs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.sum(e).alias(f"__s_{name}") for name, e in sums.items()
    ]
    per_part = part.groupBy(_PID).agg(*agg_exprs)
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = per_part.select(
        _PID,
        F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_all).alias("__n_total"),
        *[
            F.coalesce(
                F.sum(f"__s_{name}").over(w_prev),
                F.lit(0).cast(part.select(e.alias("__t")).schema["__t"].dataType),
            ).alias(f"__soff_{name}")
            for name, e in sums.items()
        ],
    )

    w_local = Window.partitionBy(_PID).orderBy(*order_cols)
    w_local_run = w_local.rowsBetween(Window.unboundedPreceding, 0)
    ranked = part.join(F.broadcast(offsets), _PID).select(
        *[c for c in df.columns],
        "__n_total",
        (F.col("__off") + F.row_number().over(w_local)).alias(out),
        *[
            (F.col(f"__soff_{name}") + F.sum(e).over(w_local_run)).alias(name)
            for name, e in sums.items()
        ],
    )
    return ranked


def ntile_expr(rank: Column, n_total: Column, k: int) -> Column:
    """SQL-standard NTILE(k) from an exact global rank: the first
    ``n mod k`` tiles get ``ceil(n/k)`` rows, the rest ``floor(n/k)``
    — identical to ``NTILE(k) OVER (ORDER BY ...)`` on every engine.
    """
    base = (n_total / k).cast("long")  # floor: n_total, k nonneg
    rem = n_total - base * k
    big = base + 1
    in_big = rank <= big * rem
    # ceil(a/b) on positive longs
    tile_big = ((rank + big - 1) / big).cast("long")
    tile_small = rem + (
        (rank - big * rem + F.greatest(base, F.lit(1)) - 1)
        / F.greatest(base, F.lit(1))
    ).cast("long")
    return F.when(in_big, tile_big).otherwise(tile_small)


def with_global_ntile(
    df: DataFrame, order_cols: list[Column], k: int, out: str
) -> DataFrame:
    """Append ``NTILE(k) OVER (ORDER BY order_cols)`` computed via the
    distributed rank — no single-partition sort."""
    ranked = with_global_rank(df, order_cols, out="__rnk_tmp")
    return ranked.withColumn(
        out, ntile_expr(F.col("__rnk_tmp"), F.col("__n_total"), k).cast("int")
    ).drop("__rnk_tmp", "__n_total")
