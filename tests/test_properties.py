"""Property-based invariants (SURVEY.md §5.2.4) over the cleaning
operators, driven by hypothesis-generated columns rather than the
fixed fixtures: fills never change cardinality and clear exactly the
nulls, clip really bounds, dedup is idempotent, and interpolation
matches pandas (the reference's own engine) point-for-point.
"""

import math

import pandas as pd
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from ipydataclean_spark.operators.cleaning import (
    clip,
    dedup_exact,
    fill_aggregate,
    fill_value,
    interpolate_linear,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

maybe_floats = st.lists(
    st.one_of(
        st.none(),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=25,
)


def _df(spark, xs):
    return spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "row_id INT, v DOUBLE"
    )


@given(xs=maybe_floats)
@settings(**_SETTINGS)
def test_fill_value_clears_nulls_keeps_rest(spark, xs):
    out = fill_value(_df(spark, xs), "v", 0.0).orderBy("row_id").collect()
    assert len(out) == len(xs)
    for r, x in zip(out, xs):
        assert r.v == (0.0 if x is None else x)


@given(xs=maybe_floats)
@settings(**_SETTINGS)
def test_fill_mean_preserves_cardinality(spark, xs):
    assume(any(x is not None for x in xs))  # need a mean to fill with
    out = fill_aggregate(_df(spark, xs), "v", "mean").collect()
    assert len(out) == len(xs)
    assert all(r.v is not None for r in out)


@given(xs=maybe_floats, lo=st.floats(-100, 0), hi=st.floats(0, 100))
@settings(**_SETTINGS)
def test_clip_bounds_and_idempotent(spark, xs, lo, hi):
    once = clip(_df(spark, xs), "v", lo, hi)
    rows = once.orderBy("row_id").collect()
    assert len(rows) == len(xs)
    for r in rows:
        if r.v is not None:
            assert lo <= r.v <= hi
    twice = clip(once, "v", lo, hi).orderBy("row_id").collect()
    assert [r.v for r in twice] == [r.v for r in rows]


@given(xs=st.lists(st.integers(0, 5), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_dedup_idempotent_min_survivor(spark, xs):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "row_id INT, k INT")
    once = dedup_exact(df, ["k"], "row_id").collect()
    # one survivor per key, and it is the FIRST occurrence
    assert sorted(r.k for r in once) == sorted(set(xs))
    assert {r.k: r.row_id for r in once} == {k: xs.index(k) for k in set(xs)}
    again = dedup_exact(dedup_exact(df, ["k"], "row_id"), ["k"], "row_id").collect()
    assert sorted((r.k, r.row_id) for r in again) == sorted((r.k, r.row_id) for r in once)


@given(xs=maybe_floats)
@settings(**_SETTINGS)
def test_interpolate_matches_pandas(spark, xs):
    """C5 parity with the reference engine: pandas Series.interpolate
    (linear over positional order; interior gaps blended, leading NaNs
    kept, trailing NaNs forward-filled)."""
    got = {
        r.row_id: r.v
        for r in interpolate_linear(_df(spark, xs), "v", "row_id").collect()
    }
    expect = pd.Series(xs, dtype="float64").interpolate(method="linear")
    for i in range(len(xs)):
        e = expect.iloc[i]
        g = got[i]
        if pd.isna(e):
            assert g is None, (i, xs, got)
        else:
            assert g is not None and math.isclose(g, e, rel_tol=1e-9, abs_tol=1e-9), (
                i,
                xs,
                got,
            )


# ---------------------------------------------------------------------------
# Continuation ops: scaling, rank-normalize, salted agg, z-order
# ---------------------------------------------------------------------------

floats_nonempty = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=2,
    max_size=25,
)


@given(xs=floats_nonempty)
@settings(**_SETTINGS)
def test_minmax_scale_bounds_and_order(spark, xs):
    """scale_minmax lands every value in [0,1] (endpoints hit) and is
    monotone — order of values never changes."""
    from ipydataclean_spark.operators.featprep import scale_minmax

    assume(max(xs) - min(xs) > 1e-3)
    out = scale_minmax(_df(spark, xs), "v", "s").orderBy("row_id").collect()
    vals = [r.s for r in out]
    assert min(vals) == 0.0 and max(vals) == 1.0
    # monotone (not strictly: sub-ulp input gaps may collapse): sorting
    # inputs must leave the scaled sequence non-decreasing
    by_x = sorted(zip(xs, vals))
    assert all(b[1] >= a[1] for a, b in zip(by_x, by_x[1:]))


@given(xs=floats_nonempty)
@settings(**_SETTINGS)
def test_zscore_scale_centers(spark, xs):
    from ipydataclean_spark.operators.featprep import scale_zscore

    assume(max(xs) - min(xs) > 1e-3)
    out = scale_zscore(_df(spark, xs), "v", "z").collect()
    m = sum(r.z for r in out) / len(out)
    # decimal(28,6) quantization of ~1e6-magnitude inputs bounds the
    # center error well below 1e-2 z-units
    assert abs(m) < 1e-2


@given(xs=floats_nonempty, salt_n=st.integers(min_value=1, max_value=32))
@settings(**_SETTINGS)
def test_salted_sum_equals_direct(spark, xs, salt_n):
    """salted_sum is exactly the direct grouped sum at ANY salt count
    (decimal partials are associative)."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.operators.groupstats import salted_sum

    df = spark.createDataFrame(
        [(i % 3, x) for i, x in enumerate(xs)], "k INT, v DOUBLE"
    )
    got = {
        r.k: r.total
        for r in salted_sum(df, "k", F.col("v"), "total", salt_n=salt_n).collect()
    }
    expect = {
        r.k: r.total
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(28,6)")).cast("double").alias("total"))
        .collect()
    }
    assert got == expect


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_zvalue_bijective_and_bounded(spark, pairs):
    """Morton code: invertible on 8-bit pairs (distinct pairs →
    distinct z) and bounded by 2^16."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.operators.sketches import zvalue

    df = spark.createDataFrame(pairs, "x LONG, y LONG")
    out = df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()
    assert all(0 <= r.z < (1 << 16) for r in out)
    zmap = {}
    for r in out:
        if (r.x, r.y) in zmap:
            assert zmap[(r.x, r.y)] == r.z
        else:
            zmap[(r.x, r.y)] = r.z
    assert len(set(zmap.values())) == len(zmap)


def test_weighted_sample_is_deterministic_and_biased(spark, sf_dir):
    """R22c: (1) two runs give the identical sample (hash-derived
    uniforms, no RNG); (2) exactly k rows; (3) the sample's mean weight
    exceeds the population's — high-weight rows must be
    overrepresented, the entire point of weighted sampling."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    fn = QUERIES["r22c_weighted_sample"]["fn"]
    a = [(r.o_orderkey, r.es_key) for r in fn(spark, sf_dir).collect()]
    b = [(r.o_orderkey, r.es_key) for r in fn(spark, sf_dir).collect()]
    assert a == b
    assert len(a) == 200
    sample_ids = [k for k, _ in a]
    from ipydataclean_spark.catalog import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    pop_mean = orders.agg(F.avg("o_totalprice")).first()[0]
    samp_mean = (
        orders.where(F.col("o_orderkey").isin(sample_ids))
        .agg(F.avg("o_totalprice"))
        .first()[0]
    )
    assert samp_mean > pop_mean * 1.05, (samp_mean, pop_mean)


# ---------------------------------------------------------------------------
# Round-3 ops: OLS vs numpy, weighted median vs numpy, segment-dedup mass
# ---------------------------------------------------------------------------

xy_pairs = st.lists(
    st.tuples(
        st.floats(-100, 100, allow_nan=False).map(lambda v: round(v, 2)),
        st.floats(-100, 100, allow_nan=False).map(lambda v: round(v, 2)),
    ),
    min_size=3,
    max_size=40,
)


@given(pairs=xy_pairs)
@settings(**_SETTINGS)
def test_ols_power_sums_match_numpy(spark, pairs):
    import numpy as np
    from pyspark.sql import functions as F

    from ipydataclean_spark.functions import exact

    xs = np.array([p[0] for p in pairs])
    ys = np.array([p[1] for p in pairs])
    assume(len(set(xs)) > 1)  # slope defined
    df = spark.createDataFrame([(float(x), float(y)) for x, y in pairs], "x double, y double")
    x, y = F.col("x"), F.col("y")
    s = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        exact.dsum(x).alias("sx"), exact.dsum(y).alias("sy"),
        exact.dsum(x * y).alias("sxy"), exact.dsum(x * x).alias("sxx"),
    ).collect()[0]
    num = s.n * s.sxy - s.sx * s.sy
    den = s.n * s.sxx - s.sx * s.sx
    assume(abs(den) > 1e-9)
    slope = num / den
    intercept = (s.sy - s.sx * slope) / s.n
    np_slope, np_intercept = np.polyfit(xs, ys, 1)
    assert abs(slope - np_slope) < 1e-6 * max(1.0, abs(np_slope))
    assert abs(intercept - np_intercept) < 1e-6 * max(1.0, abs(np_intercept))


wm_rows = st.lists(
    st.tuples(
        st.floats(0, 1000, allow_nan=False).map(lambda v: round(v, 2)),
        st.integers(1, 9),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=wm_rows)
@settings(**_SETTINGS)
def test_weighted_median_matches_expansion(spark, rows):
    """The cumulative-weight rule equals the median over the
    weight-expanded multiset (integer weights make expansion exact)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(float(v), float(w)) for v, w in rows], "price double, qty double"
    )
    pw = df.groupBy("price").agg(
        F.sum(F.col("qty").cast("decimal(28,6)")).alias("w")
    )
    wc = Window.orderBy("price")
    c = pw.select(
        "price",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(Window.partitionBy()).alias("tw"),
    )
    got = c.where(F.lit(2) * F.col("cw") >= F.col("tw")).agg(
        F.min("price")
    ).collect()[0][0]
    expanded = sorted(v for v, w in rows for _ in range(w))
    n = len(expanded)
    # smallest value whose cumulative weight reaches half the total
    want = expanded[(n - 1) // 2] if n % 2 == 1 else expanded[n // 2 - 1]
    assert got == want, (got, want, expanded)


@given(texts=st.lists(
    st.lists(st.sampled_from([f"w{i}" for i in range(12)]), min_size=1, max_size=30)
    .map(" ".join),
    min_size=1, max_size=8,
))
@settings(**_SETTINGS)
def test_segment_dedup_mass_conservation(spark, texts):
    """Every distinct segment survives EXACTLY once corpus-wide, and
    per-doc kept counts sum to the number of distinct segments."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.operators.curation import (
        segment_dedup, segments_col, tokens_col,
    )

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = segment_dedup(docs)
    distinct_segs = (
        docs.withColumn("__t", tokens_col("text"))
        .select(F.explode(segments_col(F.col("__t"))).alias("s"))
        .distinct()
        .count()
    )
    assert out.agg(F.sum("n_kept")).collect()[0][0] == distinct_segs


@given(rows=wm_rows, q=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]))
@settings(**_SETTINGS)
def test_weighted_quantiles_match_expansion(spark, rows, q):
    """Histogram-refinement weighted quantiles equal the quantile rule
    over the integer-weight-expanded multiset — including when tiny
    pull thresholds force multi-level bucket descent."""
    from decimal import Decimal

    from ipydataclean_spark.functions.quantiles import weighted_quantiles

    df = spark.createDataFrame(
        [(float(v), float(w)) for v, w in rows], "price double, qty double"
    )
    got = weighted_quantiles(
        df, "price", "qty", [q], n_buckets=4, pull_threshold=2, max_levels=12
    )[0]
    expanded = sorted(v for v, w in rows for _ in range(w))
    total = len(expanded)
    target = Decimal(str(q)) * total
    cum, want = 0, expanded[-1]
    for v in expanded:
        cum += 1
        if cum >= target:
            want = v
            break
    assert got == want, (got, want, expanded, q)


def test_weighted_quantiles_agree_with_p27(spark, sf_dir):
    """q=0.5 through the scale path equals the window-form weighted
    median for each returnflag group."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.functions.quantiles import weighted_quantiles
    from ipydataclean_spark.operators.groupstats import p27_weighted_median

    li = load_table(spark, sf_dir, "lineitem")
    window_form = {
        r.l_returnflag: r.weighted_median_price
        for r in p27_weighted_median(spark, sf_dir).collect()
    }
    for flag, want in window_form.items():
        got = weighted_quantiles(
            li.where(F.col("l_returnflag") == flag),
            "l_extendedprice", "l_quantity", [0.5],
        )[0]
        assert got == want, (flag, got, want)


# ---------------------------------------------------------------------------
# Round-8 primitives vs driver-side Python references
# ---------------------------------------------------------------------------

_word = st.sampled_from([f"w{i}" for i in range(12)])
_doc_text = st.lists(_word, min_size=3, max_size=24).map(" ".join)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_doc_text, min_size=2, max_size=8))
def test_exact_jaccard_pairs_matches_python(spark, texts):
    """exact_jaccard_pairs == brute-force word-3-gram Jaccard computed
    in Python, on random small-vocabulary corpora (ties/duplicates/
    identical docs included)."""
    from ipydataclean_spark.operators.llm import exact_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in exact_jaccard_pairs(docs, threshold=0.3).collect()
    }

    def shingles(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sh = {i: shingles(t) for i, t in enumerate(texts)}
    want = {}
    for a in sh:
        for b in sh:
            if a < b and sh[a] and sh[b]:
                inter = len(sh[a] & sh[b])
                if inter:
                    j = inter / len(sh[a] | sh[b])
                    if j >= 0.3:
                        want[(a, b)] = j
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_doc_text, min_size=2, max_size=6))
def test_dup_spans_matches_python_islands(spark, texts):
    """dup_spans_over == a Python reference of the gap-islands merge
    (shared-gram positions, merge iff <= 3 apart, span = [min,
    max+2]), on random corpora."""
    from ipydataclean_spark.operators.llm_extra import dup_spans_over, gram3_over

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_spans, r.dup_words, r.longest_span)
        for r in dup_spans_over(gram3_over(docs)).collect()
    }

    grams = {}
    for i, t in enumerate(texts):
        w = t.split(" ")
        grams[i] = [" ".join(w[j:j + 3]) for j in range(len(w) - 2)]
    docfreq = {}
    for i, gs in grams.items():
        for g in set(gs):
            docfreq[g] = docfreq.get(g, 0) + 1
    want = {}
    for i, gs in grams.items():
        dup_pos = [p + 1 for p, g in enumerate(gs) if docfreq[g] >= 2]
        if not dup_pos:
            continue
        spans = []
        start = prev = dup_pos[0]
        for p in dup_pos[1:]:
            if p - prev <= 3:
                prev = p
            else:
                spans.append((start, prev + 2))
                start = prev = p
        spans.append((start, prev + 2))
        lens = [e - s + 1 for s, e in spans]
        want[i] = (len(spans), sum(lens), max(lens))
    assert got == want


@given(
    st.lists(st.integers(min_value=1, max_value=10**9), min_size=2, max_size=12),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=40),
)
@settings(max_examples=40, deadline=None)
def test_unimax_closed_form_equals_greedy(ns, cap, budget_pct_x10):
    """The l57 closed form (ascending sort, all-BIGINT prefix
    feasibility, pivot k*, uniform remainder) must equal the UniMax
    paper's sequential greedy loop for RANDOM language-size vectors,
    epoch caps, and budgets — pure-Python replica of the exact integer
    arithmetic both engines run, no Spark roundtrip needed."""
    langs = [(f"l{i}", n) for i, n in enumerate(ns)]
    total = sum(ns)
    B = (total * budget_pct_x10) // 10

    # closed form (the l57 algebra)
    asc = sorted(langs, key=lambda t: (t[1], t[0]))
    L = len(asc)
    cum = 0
    kstar, s_at_k = 0, 0
    for i, (_, n) in enumerate(asc, start=1):
        cum += n
        if cap * n * (L - i + 1) <= B - cap * (cum - n):
            kstar, s_at_k = i, cum
    closed = {}
    for i, (lang, n) in enumerate(asc, start=1):
        if i <= kstar:
            closed[lang] = float(cap * n)
        else:
            closed[lang] = float(B - cap * s_at_k) / (L - kstar)

    # the paper's greedy loop
    rem = float(B)
    greedy = {}
    for i, (lang, n) in enumerate(asc):
        share = rem / (L - i)
        b = min(float(cap * n), share)
        greedy[lang] = b
        rem -= b

    for lang in greedy:
        g, c = greedy[lang], closed[lang]
        assert abs(g - c) <= 1e-9 * max(1.0, g), (lang, g, c, ns, cap, B)


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-8, max_value=8, allow_nan=False, width=32),
            min_size=6, max_size=6,
        ),
        min_size=3, max_size=10,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_topk_kernel_bit_identical_to_inplan_fold(spark, vecs):
    """The vectorized kernel's cosines must equal the in-plan
    sequential fold (functions/vector.cosine_sim) BIT-FOR-BIT on
    random float32 vectors — the claim every kernel-backed oracle
    certification rests on, asserted directly."""
    assume(all(any(abs(x) > 1e-3 for x in v) for v in vecs))
    from ipydataclean_spark.functions.knn import topk_per_row_exact
    from ipydataclean_spark.functions.vector import cosine_sim
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, emb array<float>",
    )
    got = {
        (r.part_id, r.cand_id): r.cos_sim
        for r in topk_per_row_exact(df, df, None, exclude_self=True).collect()
    }
    a = df.select(F.col("id").alias("ia"), F.col("emb").alias("ea"))
    b = df.select(F.col("id").alias("ib"), F.col("emb").alias("eb"))
    want = {
        (r.ia, r.ib): r.c
        for r in a.crossJoin(b)
        .where(F.col("ia") != F.col("ib"))
        .select("ia", "ib", cosine_sim("ea", "eb").alias("c"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, got[k].hex(), want[k].hex())
