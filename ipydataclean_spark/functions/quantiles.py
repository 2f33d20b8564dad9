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
        # pulls are batched per level into ONE tagged job: each entry is
        # (path_cond, [(rank, index_into_sorted_bucket)]) — separate
        # collect()s per rank would pay per-job fixed cost twice for the
        # typical (q1, q3) pair
        pulls: list[tuple[Column, list[tuple[int, int]]]] = []
        for path, ks in by_set.items():
            st = state[ks[0]]
            subset = base.where(_cond(path, n_buckets))
            if st.rlo == st.rhi or level == max_levels - 1:
                # degenerate range or level budget exhausted: direct pull
                pulls.append((_cond(path, n_buckets), [(k, k - st.offset) for k in ks]))
                continue
            width = (st.rhi - st.rlo) / n_buckets
            bexpr = _bucket_expr(st.rlo, width, n_buckets)
            hist = sorted(
                subset.groupBy(bexpr.alias("b")).agg(F.count(F.lit(1)).alias("cnt")).collect()
            )
            pull_by_bucket: dict[int, list[tuple[int, int]]] = {}
            for k in ks:
                local = k - st.offset
                cum = 0
                for b, cnt in hist:
                    if cum + cnt > local:
                        break
                    cum += cnt
                child_path = path + ((st.rlo, width, b),)
                if cnt <= pull_threshold:
                    pull_by_bucket.setdefault(b, []).append((k, local - cum))
                else:
                    state[k] = _State(
                        child_path,
                        st.rlo + b * width,
                        min(st.rlo + (b + 1) * width, st.rhi),
                        st.offset + cum,
                    )
            for b, reqs in pull_by_bucket.items():
                pulls.append((_cond(path + ((st.rlo, width, b),), n_buckets), reqs))
        if pulls:
            tag = F.when(pulls[0][0], 0)
            for i, (cond, _) in enumerate(pulls[1:], 1):
                tag = tag.when(cond, i)
            rows = base.select(tag.alias("t"), "v").where(F.col("t").isNotNull()).collect()
            by_tag: dict[int, list[float]] = {}
            for r in rows:
                by_tag.setdefault(r.t, []).append(r.v)
            for i, (_, reqs) in enumerate(pulls):
                vals = sorted(by_tag.get(i, []))
                for k, idx in reqs:
                    resolved[k] = vals[idx]
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
