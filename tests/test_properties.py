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
