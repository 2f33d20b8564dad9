"""Driver-contract invariants for the query registry and its ordering."""

from ipydataclean_spark.registry import (
    DRIVER_GREEN_PRIOR_ROUNDS,
    QUERIES,
    load_all,
    ordered_queries,
)


def test_ordered_queries_floats_fresh_oracle_queries_first():
    """The driver's bounded CORRECTNESS window reads queries() in
    order, so the rotation must put every not-yet-driver-checked
    oracle-backed query ahead of rows-only and already-proven ones."""
    load_all()
    oq = ordered_queries()
    assert set(oq) == set(QUERIES)
    names = list(oq)
    assert DRIVER_GREEN_PRIOR_ROUNDS <= set(QUERIES), "stale prior-green name"
    n_fresh_oracle = sum(
        1
        for n, s in QUERIES.items()
        if n not in DRIVER_GREEN_PRIOR_ROUNDS and s["oracle"] is not None
    )
    head = names[:n_fresh_oracle]
    assert all(
        QUERIES[n]["oracle"] is not None and n not in DRIVER_GREEN_PRIOR_ROUNDS
        for n in head
    )
    tail = names[-len(DRIVER_GREEN_PRIOR_ROUNDS):]
    assert set(tail) == set(DRIVER_GREEN_PRIOR_ROUNDS)


def test_every_query_has_fn_and_doc():
    load_all()
    for name, spec in QUERIES.items():
        assert callable(spec["fn"]), name
        assert spec["doc"], f"{name} has no docstring"
