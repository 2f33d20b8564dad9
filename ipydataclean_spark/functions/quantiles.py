"""Exact distributed quantiles via iterative histogram refinement.

Spark's builtin exact ``percentile`` buffers every value in a generic
per-partition map — ~4-5s on a 600k-row column locally and O(column)
executor memory at scale. This helper computes the SAME interpolated
quantile (bit-identical: positions k0=floor((n-1)q), k1=ceil((n-1)q),
v0 + (v1-v0)*frac — the definition Spark's percentile, DuckDB's
quantile_cont, and PostgreSQL's percentile_cont share) with codegen
scans only:

  1. one count/min/max pass;
  2. per refinement level, a fixed-width bucket histogram restricted to
     each unresolved rank's surviving bucket chain — skewed data
     (e.g. ×1000 outliers stretching the range) just costs extra
     levels, each narrowing the candidate set ×n_buckets;
  3. when a rank's bucket holds ≤ pull_threshold values, pull exactly
     that bucket, sort driver-side, index into it.

Refinement filters are the accumulated *bucket predicates* themselves
(never recomputed value ranges), so floating-point boundary rounding
can't shift the rank bookkeeping: histogram, recursion, and pull all
select by the identical expression.

Executor memory is O(1); the driver holds ≤ pull_threshold values per
rank. Every pass is a map-side partial agg — the shape that survives
100 TB. The projected column is cached for the duration (scans 2+ hit
memory) and unpersisted before returning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(rlo: float, width: float, n_buckets: int) -> Column:
    v = F.col("v")
    return F.least(F.floor((v - F.lit(rlo)) / F.lit(width)), F.lit(n_buckets - 1)).cast("int")


@dataclass(frozen=True)
class _State:
    path: tuple[tuple[float, float, int], ...]  # (rlo, width, chosen_bucket) chain
    rlo: float  # approx value range of the current candidate set
    rhi: float
    offset: int  # exact count of values sorting before the candidate set


def _cond(path: tuple[tuple[float, float, int], ...], n_buckets: int) -> Column:
    cond = F.lit(True)
    for rlo, width, b in path:
        cond = cond & (_bucket_expr(rlo, width, n_buckets) == b)
    return cond


def _value_at_ranks(
    base: DataFrame,
    ranks: list[int],
    lo: float,
    hi: float,
    n_buckets: int,
    pull_threshold: int,
    max_levels: int,
) -> dict[int, float]:
    """Exact value at each 0-based global sorted position in ``ranks``.

    base: cached single-column DataFrame (column "v", no nulls)."""
    state: dict[int, _State] = {k: _State((), lo, hi, 0) for k in ranks}
    resolved: dict[int, float] = {}

    for level in range(max_levels):
        unresolved = [k for k in ranks if k not in resolved]
        if not unresolved:
            break
        by_set: dict[tuple, list[int]] = {}
        for k in unresolved:
            by_set.setdefault(state[k].path, []).append(k)
        for path, ks in by_set.items():
            st = state[ks[0]]
            subset = base.where(_cond(path, n_buckets))
            if st.rlo == st.rhi or level == max_levels - 1:
                # degenerate range or level budget exhausted: direct pull
                vals = sorted(r.v for r in subset.collect())
                for k in ks:
                    resolved[k] = vals[k - st.offset]
                continue
            width = (st.rhi - st.rlo) / n_buckets
            bexpr = _bucket_expr(st.rlo, width, n_buckets)
            hist = sorted(
                subset.groupBy(bexpr.alias("b")).agg(F.count(F.lit(1)).alias("cnt")).collect()
            )
            for k in ks:
                local = k - st.offset
                cum = 0
                for b, cnt in hist:
                    if cum + cnt > local:
                        break
                    cum += cnt
                child_path = path + ((st.rlo, width, b),)
                if cnt <= pull_threshold:
                    vals = sorted(r.v for r in base.where(_cond(child_path, n_buckets)).collect())
                    resolved[k] = vals[local - cum]
                else:
                    state[k] = _State(
                        child_path,
                        st.rlo + b * width,
                        min(st.rlo + (b + 1) * width, st.rhi),
                        st.offset + cum,
                    )
    return resolved


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    n_buckets: int = 2048,
    pull_threshold: int = 4096,
    max_levels: int = 6,
) -> list[float | None]:
    """Exact interpolated quantiles of a numeric column (nulls ignored)."""
    base = df.select(F.col(col).cast("double").alias("v")).where(F.col("v").isNotNull())
    base = base.persist()
    try:
        n, lo, hi = base.agg(F.count("v"), F.min("v"), F.max("v")).first()
        if n == 0:
            return [None] * len(qs)
        if lo == hi:
            return [float(lo)] * len(qs)
        targets = []
        for q in qs:
            r = (n - 1) * q
            k0 = int(r)
            targets.append((r, k0, min(k0 + 1, n - 1)))
        ranks = sorted({k for (_, k0, k1) in targets for k in (k0, k1)})
        at = _value_at_ranks(base, ranks, float(lo), float(hi), n_buckets, pull_threshold, max_levels)
        out: list[float | None] = []
        for r, k0, k1 in targets:
            v0 = at[k0]
            if k1 == k0:
                out.append(float(v0))
            else:
                out.append(float(v0 + (at[k1] - v0) * (r - k0)))
        return out
    finally:
        base.unpersist()


def exact_median(df: DataFrame, col: str) -> float | None:
    return exact_quantiles(df, col, [0.5])[0]
