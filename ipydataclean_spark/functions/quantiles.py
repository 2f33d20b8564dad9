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

Optimization round 12 knob rationale (guide §1.2 — get the algorithm's
job count right before per-task tuning): the resolved value at a rank
is EXACT regardless of n_buckets/pull_threshold (the pull indexes the
sorted bucket by an exactly-maintained offset), so both are pure
performance knobs — verified by A/B: outputs bit-identical across
(2048, 4096) / (2048, 32768) / (2048, 131072) / (2048, 524288) /
(8192, 32768) on the 10-column dirty frame at sf0.1 (pinned by
tests/test_api.py::test_quantiles_pull_threshold_invariant).
pull_threshold 4096 → 131072 cut the 10-column refinement from ~24 s
to ~7 s by terminating descents 1-2 levels earlier: each extra level
is a full codegen scan whose bucket-chain predicates grow with depth,
while a bigger pull is just more bytes on an Arrow collect. The
second pass raised it to 524288 (4 MB per rank on the driver — still
"≤ pull_threshold values per rank"; wide-profile callers can pass a
smaller value): on the outlier-stretched d3 shape the dense level-0
buckets hold ~293k values, so the raise removes a whole histogram
level (stats/hist/pull instead of stats/hist/hist/pull — one fewer
full scan per skew octave at any scale). Pulls ride ``toPandas``
(Arrow when enabled): value-identical doubles, ~6× cheaper than Row
pickling at 500k rows.

Two alternatives were implemented, measured, and REVERTED this round
(negative results, recorded in OPTIMIZATION_r12.md): (a) a
percentile_approx-bracketed first level (the earlier design note) —
exactness held (offset+distinct-count verification with descent
fallback), but ApproximatePercentile is an ObjectAggregate outside
whole-stage codegen and measured 0.19 s/column per 600k rows, 3× the
histogram level it replaced (10-column pass 3.2 s → 6.0 s A/B), and
its accuracy knob cannot cover 10^12 rows (sketch memory O(acc) ≥
12·n/pull_threshold); (b) a grouped pull (``groupBy(tag, value)``) to
collapse ties before the exchange — wins on enum-like columns but
adds a shuffle + final agg that measured net-slower on the
high-distinct columns that dominate pull bytes (d3 1.4 s → 2.3 s).
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
            hpdf = (
                subset.groupBy(bexpr.alias("b"))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .toPandas()
            )
            hist = sorted(zip(hpdf["b"].tolist(), hpdf["cnt"].tolist()))
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
            pdf = base.select(tag.alias("t"), "v").where(F.col("t").isNotNull()).toPandas()
            by_tag: dict[int, list[float]] = {}
            for t, v in zip(pdf["t"].tolist(), pdf["v"].tolist()):
                by_tag.setdefault(t, []).append(v)
            for i, (_, reqs) in enumerate(pulls):
                vals = sorted(by_tag.get(i, []))
                for k, idx in reqs:
                    resolved[k] = vals[idx]
    return resolved


#: Total driver-pull budget in VALUES (float64): 32M values = 256 MB.
#: Round-13 (VERDICT r12 #5 / ADVICE): the per-rank pull_threshold
#: default now derives from this TOTAL budget divided by the number of
#: simultaneously-resolved ranks, so a wide profile (100 columns x 4
#: ranks) cannot pull cols x ranks x 4 MB to the driver in one toPandas.
#: At <= 61 ranks (every bench/problems() shape at 10 columns) the
#: per-rank cap of 524288 binds instead, keeping those paths on the
#: exact round-12 descent. Explicit pull_threshold values are honored
#: unchanged, and resolved values are knob-invariant either way (pinned
#: by test_quantiles_pull_threshold_invariant).
PULL_BUDGET_VALUES = 32 * 1024 * 1024
_PER_RANK_CAP = 524288
_PER_RANK_FLOOR = 4096


def _effective_pull_threshold(pull_threshold: int | None, n_ranks: int) -> int:
    if pull_threshold is not None:
        return pull_threshold
    return min(_PER_RANK_CAP, max(_PER_RANK_FLOOR, PULL_BUDGET_VALUES // max(1, n_ranks)))


def _adaptive_buckets(n: int, pull_threshold: int, floor: int = 2048,
                      cap: int = 131072) -> int:
    """Histogram resolution derived from the column count (optimization
    round 12, guide §2 scale-adaptive knobs). Below n = 2x
    pull_threshold even a fully-concentrated bucket pulls in one level,
    so the default 2048 is optimal and finer resolution is pure
    histogram-job cost (measured: a 12.5k-bucket fused 10-column
    histogram at sf0.1 cost +15% with zero levels saved). Above it, a
    range-stretched column (x1000 outliers pack the dense mass into
    ~range/1000) overflows its level-0 bucket and pays a whole extra
    full scan per level — while the histogram the driver collects
    costs only n_buckets (b, cnt) rows (~16 B each over Arrow). So
    resolution grows as n // 48, clamped to [floor, cap]; the cap
    keeps the fused multi-column histogram collect bounded (~2 MB per
    column worst case). Pure performance knob — resolved values are
    exact at ANY resolution (pinned by
    test_quantiles_pull_threshold_invariant's n_buckets=16 leg;
    measured bit-identical across 2048/12500/131072 on the sf1 d3
    column)."""
    if n <= 2 * pull_threshold:
        return floor
    return int(min(cap, max(floor, n // 48)))


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    n_buckets: int | None = None,
    pull_threshold: int | None = None,
    max_levels: int = 6,
) -> list[float | None]:
    """Exact interpolated quantiles of a numeric column (nulls ignored).

    ``n_buckets=None`` (the default) derives the histogram resolution
    from the column count — see ``_adaptive_buckets``.
    ``pull_threshold=None`` (the default) derives the per-rank pull cap
    from the total driver budget — see ``_effective_pull_threshold``."""
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
        pt = _effective_pull_threshold(pull_threshold, len(ranks))
        nb = _adaptive_buckets(int(n), pt) if n_buckets is None else n_buckets
        at = _value_at_ranks(base, ranks, float(lo), float(hi), nb, pt, max_levels)
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


# ---------------------------------------------------------------------------
# Multi-column engine: all columns' refinement fused into O(levels) jobs
# ---------------------------------------------------------------------------


def _col_bucket_expr(c: str, rlo: float, width: float, n_buckets: int) -> Column:
    v = F.col(c)
    return F.least(F.floor((v - F.lit(rlo)) / F.lit(width)), F.lit(n_buckets - 1)).cast("int")


def _col_cond(c: str, path: tuple[tuple[float, float, int], ...], n_buckets: int) -> Column:
    cond = F.col(c).isNotNull()
    for rlo, width, b in path:
        cond = cond & (_col_bucket_expr(c, rlo, width, n_buckets) == b)
    return cond


def exact_quantiles_multi(
    df: DataFrame,
    specs: dict[str, list[float]],
    n_buckets: int | None = None,
    pull_threshold: int | None = None,
    max_levels: int = 6,
    stats: dict[str, tuple[int, float | None, float | None]] | None = None,
) -> dict[str, list[float | None]]:
    """Exact interpolated quantiles for MANY columns in O(levels) jobs.

    The single-column engine runs its histogram/pull jobs per column —
    an interactive ``problems()`` over a 100-column table would launch
    ~100 scans. Here every column's per-level work is fused: one
    explode(array(struct(set_id, bucket)))->groupBy job computes ALL
    columns' histograms, and one tagged select pulls ALL resolved
    buckets. Job count is O(refinement levels), independent of column
    count — the P10 single-scan rule applied to quantiles.

    ``stats``: optional {col: (non_null_count, min, max)} from an
    already-run profile scan, skipping the count/min/max job.

    ``n_buckets=None`` derives the shared histogram resolution from
    the largest column count (``_adaptive_buckets``).
    """
    cols = list(specs)
    out: dict[str, list[float | None]] = {}
    if not cols:
        return out
    base = df.select(*[F.col(c).cast("double").alias(c) for c in cols]).persist()
    try:
        if stats is None:
            aggs: list[Column] = []
            for c in cols:
                aggs += [F.count(c), F.min(c), F.max(c)]
            row = base.agg(*aggs).first()
            stats = {c: (row[3 * i], row[3 * i + 1], row[3 * i + 2]) for i, c in enumerate(cols)}

        # Per-(col, rank) refinement state; trivially-resolved columns
        # (empty / constant) never enter the loop.
        state: dict[tuple[str, int], _State] = {}
        resolved: dict[tuple[str, int], float] = {}
        targets: dict[str, list[tuple[float, int, int]]] = {}
        for c in cols:
            n, lo, hi = stats[c]
            n = int(n or 0)
            if n == 0:
                out[c] = [None] * len(specs[c])
                continue
            if lo == hi:
                out[c] = [float(lo)] * len(specs[c])
                continue
            tgt = []
            for q in specs[c]:
                r = (n - 1) * q
                k0 = int(r)
                tgt.append((r, k0, min(k0 + 1, n - 1)))
            targets[c] = tgt
            for k in {k for (_, k0, k1) in tgt for k in (k0, k1)}:
                state[(c, k)] = _State((), float(lo), float(hi), 0)

        # Rank count is now known: derive the budgeted per-rank pull cap
        # and (from it) the shared histogram resolution.
        pt = _effective_pull_threshold(pull_threshold, len(state))
        if n_buckets is None:
            n_buckets = _adaptive_buckets(
                max(int(stats[c][0] or 0) for c in cols), pt
            )

        active = sorted(targets)
        for level in range(max_levels):
            unresolved = [key for key in state if key not in resolved]
            if not unresolved:
                break
            by_set: dict[tuple[str, tuple], list[int]] = {}
            for c, k in unresolved:
                by_set.setdefault((c, state[(c, k)].path), []).append(k)

            hist_sets: list[tuple[str, tuple, float, float]] = []  # (col, path, rlo, width)
            pulls: list[tuple[str, Column, list[tuple[int, int]]]] = []
            for (c, path), ks in sorted(by_set.items()):
                st = state[(c, ks[0])]
                if st.rlo == st.rhi or level == max_levels - 1:
                    pulls.append((c, _col_cond(c, path, n_buckets), [(k, k - st.offset) for k in ks]))
                    continue
                width = (st.rhi - st.rlo) / n_buckets
                hist_sets.append((c, path, st.rlo, width))

            # ONE histogram job for every (col, path) set at this level.
            # Optimization round 12 (guide §4.1): the null entries are
            # dropped AFTER a plain explode instead of through a
            # higher-order F.filter over the array — HOF lambdas are
            # evaluated interpreted per element, and this expression
            # runs once per (row × column); the explode + WHERE form
            # is whole-stage-codegen'd (measured 2× on this job shape
            # at sf0.1; identical rows — explode emits null elements,
            # the WHERE removes exactly what the lambda removed).
            hists: dict[int, list[tuple[int, int]]] = {}
            if hist_sets:
                entries = []
                for sid, (c, path, rlo, width) in enumerate(hist_sets):
                    entries.append(
                        F.when(
                            _col_cond(c, path, n_buckets),
                            F.struct(
                                F.lit(sid).alias("sid"),
                                _col_bucket_expr(c, rlo, width, n_buckets).alias("b"),
                            ),
                        )
                    )
                e = F.explode(F.array(*entries)).alias("e")
                hpdf = (
                    base.select(e)
                    .where(F.col("e").isNotNull())
                    .groupBy(F.col("e.sid").alias("sid"), F.col("e.b").alias("b"))
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .toPandas()
                )
                for sid_v, b_v, cnt_v in zip(
                    hpdf["sid"].tolist(), hpdf["b"].tolist(), hpdf["cnt"].tolist()
                ):
                    hists.setdefault(sid_v, []).append((b_v, cnt_v))
                for sid in hists:
                    hists[sid].sort()

            for sid, (c, path, rlo, width) in enumerate(hist_sets):
                hist = hists.get(sid, [])
                ks = by_set[(c, path)]
                st = state[(c, ks[0])]
                pull_by_bucket: dict[int, list[tuple[int, int]]] = {}
                for k in ks:
                    local = k - st.offset
                    cum = 0
                    for b, cnt in hist:
                        if cum + cnt > local:
                            break
                        cum += cnt
                    child_path = path + ((rlo, width, b),)
                    if cnt <= pt:
                        pull_by_bucket.setdefault(b, []).append((k, local - cum))
                    else:
                        state[(c, k)] = _State(
                            child_path,
                            rlo + b * width,
                            min(rlo + (b + 1) * width, st.rhi),
                            st.offset + cum,
                        )
                for b, reqs in sorted(pull_by_bucket.items()):
                    pulls.append((c, _col_cond(c, path + ((rlo, width, b),), n_buckets), reqs))

            # ONE pull job for every resolved bucket at this level
            # (same explode + WHERE form as the histogram job — no
            # interpreted HOF filter)
            if pulls:
                tag_entries = []
                for i, (c, cond, _) in enumerate(pulls):
                    tag_entries.append(
                        F.when(cond, F.struct(F.lit(i).alias("t"), F.col(c).alias("v")))
                    )
                e = F.explode(F.array(*tag_entries)).alias("e")
                pdf = (
                    base.select(e)
                    .where(F.col("e").isNotNull())
                    .select("e.t", "e.v")
                    .toPandas()
                )
                by_tag: dict[int, list[float]] = {}
                for t, v in zip(pdf["t"].tolist(), pdf["v"].tolist()):
                    by_tag.setdefault(t, []).append(v)
                for i, (c, _, reqs) in enumerate(pulls):
                    vals = sorted(by_tag.get(i, []))
                    for k, idx in reqs:
                        resolved[(c, k)] = vals[idx]

        for c in active:
            vals: list[float | None] = []
            for r, k0, k1 in targets[c]:
                v0 = resolved[(c, k0)]
                if k1 == k0:
                    vals.append(float(v0))
                else:
                    vals.append(float(v0 + (resolved[(c, k1)] - v0) * (r - k0)))
            out[c] = vals
        return out
    finally:
        base.unpersist()


# ---------------------------------------------------------------------------
# Weighted quantiles: histogram refinement over DECIMAL weight mass
# ---------------------------------------------------------------------------


def weighted_quantiles(
    df: DataFrame,
    col: str,
    weight_col: str,
    qs: list[float],
    n_buckets: int = 2048,
    pull_threshold: int = 4096,
    max_levels: int = 8,
) -> list[float | None]:
    """Exact weighted quantiles at 100 TB scale: for each q, the
    smallest value whose cumulative weight reaches q·W (the p27 rule —
    q=0.5 reproduces its weighted median exactly) — computed by the
    same iterative histogram refinement as exact_quantiles, with
    bucket COUNTS replaced by DECIMAL weight sums: every pass is a
    map-side-combinable aggregate, the driver holds one histogram per
    level plus ≤ pull_threshold rows at the end, and because weight
    mass accumulates in DECIMAL the bucket-descent decisions are
    order-independent (bit-identical on any partitioning).

    This is the scale path the single-window form (p27's two-phase
    rollup) documents: the window there is bounded by distinct values
    per group; this form never materializes a window at all.
    """
    from decimal import Decimal

    v, w = F.col(col).cast("double"), F.col(weight_col).cast("decimal(28,6)")
    base = (
        df.select(v.alias("v"), w.alias("w"))
        .where(F.col("v").isNotNull() & F.col("w").isNotNull() & (F.col("w") > 0))
        .persist()
    )
    try:
        total, lo, hi = base.agg(F.sum("w"), F.min("v"), F.max("v")).first()
        if total is None:
            return [None] * len(qs)
        lo, hi = float(lo), float(hi)
        if lo == hi:
            return [lo] * len(qs)
        targets = {i: Decimal(str(q)) * total for i, q in enumerate(qs)}
        state: dict[int, _State] = {
            i: _State((), lo, hi, 0) for i in targets
        }  # offset field holds CUMULATIVE WEIGHT (Decimal), start 0
        offsets: dict[int, "Decimal"] = {i: Decimal(0) for i in targets}
        resolved: dict[int, float] = {}

        for level in range(max_levels):
            todo = [i for i in targets if i not in resolved]
            if not todo:
                break
            by_path: dict[tuple, list[int]] = {}
            for i in todo:
                by_path.setdefault(state[i].path, []).append(i)
            for path, idxs in by_path.items():
                st = state[idxs[0]]
                subset = base.where(_cond(path, n_buckets))
                direct = st.rlo == st.rhi or level == max_levels - 1
                if not direct:
                    width = (st.rhi - st.rlo) / n_buckets
                    bexpr = _bucket_expr(st.rlo, width, n_buckets)
                    hist = sorted(
                        subset.groupBy(bexpr.alias("b"))
                        .agg(F.sum("w").alias("bw"), F.count(F.lit(1)).alias("cnt"))
                        .collect()
                    )
                for i in idxs:
                    target = targets[i]
                    if direct:
                        chosen_cond, off = _cond(path, n_buckets), offsets[i]
                    else:
                        cum = Decimal(0)
                        chosen = None
                        for b, bw, cnt in hist:
                            if offsets[i] + cum + bw >= target:
                                chosen = (b, cnt)
                                break
                            cum += bw
                        if chosen is None:  # q == 1 boundary: last bucket
                            b, bw, cnt = hist[-1]
                            cum -= bw
                            chosen = (b, cnt)
                        b, cnt = chosen
                        child = path + ((st.rlo, width, b),)
                        if cnt > pull_threshold:
                            state[i] = _State(
                                child,
                                st.rlo + b * width,
                                min(st.rlo + (b + 1) * width, st.rhi),
                                0,
                            )
                            offsets[i] = offsets[i] + cum
                            continue
                        chosen_cond, off = _cond(child, n_buckets), offsets[i] + cum
                    rows = base.where(chosen_cond).groupBy("v").agg(
                        F.sum("w").alias("vw")
                    ).collect()
                    cum2 = off
                    ans = None
                    for r in sorted(rows):
                        cum2 += r.vw
                        if cum2 >= targets[i]:
                            ans = float(r.v)
                            break
                    resolved[i] = ans if ans is not None else float(sorted(rows)[-1].v)
        return [resolved[i] for i in sorted(targets)]
    finally:
        base.unpersist()
