"""Driver-contract invariants for the query registry and its ordering."""

from ipydataclean_spark.registry import (
    DRIVER_GREEN_PRIOR_ROUNDS,
    QUERIES,
    load_all,
    ordered_queries,
)


def test_ordered_queries_window_priority():
    """The driver's bounded CORRECTNESS window (~50) reads queries() in
    order. Round-5 contract: (1) the §2-core never-driver-checked
    oracle queries (CORE_FRESH_FIRST) lead, in list order; (2) fresh
    rows-only follow, flagship scale paths first; (3) remaining fresh
    oracle extras; (4) every prior-green query sits in the tail."""
    from ipydataclean_spark.registry import CORE_FRESH_FIRST, ROWS_ONLY_FIRST

    load_all()
    oq = ordered_queries()
    assert set(oq) == set(QUERIES)
    names = list(oq)
    assert DRIVER_GREEN_PRIOR_ROUNDS <= set(QUERIES), "stale prior-green name"
    # a typo'd priority name would silently drop out of the window
    missing = [n for n in CORE_FRESH_FIRST + ROWS_ONLY_FIRST if n not in QUERIES]
    assert not missing, f"priority lists name unregistered queries: {missing}"
    core = [n for n in CORE_FRESH_FIRST
            if n in QUERIES and n not in DRIVER_GREEN_PRIOR_ROUNDS]
    assert names[: len(core)] == core, "core fresh-oracle tier must lead verbatim"
    assert all(QUERIES[n]["oracle"] is not None for n in core)
    rows_head = [n for n in ROWS_ONLY_FIRST
                 if n in QUERIES and n not in DRIVER_GREEN_PRIOR_ROUNDS]
    assert names[len(core): len(core) + len(rows_head)] == rows_head
    assert all(QUERIES[n]["oracle"] is None for n in rows_head)
    # no prior-green query may appear before ANY fresh query
    first_proven = min(names.index(n) for n in DRIVER_GREEN_PRIOR_ROUNDS)
    assert first_proven == len(names) - len(DRIVER_GREEN_PRIOR_ROUNDS)
    tail = names[-len(DRIVER_GREEN_PRIOR_ROUNDS):]
    assert set(tail) == set(DRIVER_GREEN_PRIOR_ROUNDS)


def test_every_query_has_fn_and_doc():
    load_all()
    for name, spec in QUERIES.items():
        assert callable(spec["fn"]), name
        assert spec["doc"], f"{name} has no docstring"


def test_query_names_are_wellformed_and_unique():
    """Driver hygiene: every registry key is a lowercase identifier
    (the harness uses names as JSON keys and file fragments), and
    re-registering a taken name raises rather than silently replacing
    a query — a renamed query can't shadow another and re-enter the
    driver window as 'fresh'."""
    import re

    import pytest

    from ipydataclean_spark.registry import register

    load_all()
    pat = re.compile(r"^[a-z0-9_]+$")
    for name in QUERIES:
        assert pat.match(name), f"malformed query name: {name!r}"
    taken = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate"):
        register(taken)(lambda spark, sf_dir: None)


def test_rows_only_outputs_are_scalar_typed(spark, sf_dir):
    """Rows-only driver rule (VERDICT r07 #1): the driver's rows-only
    canonicalizer sorts/hashes results with pandas, and an array/map
    cell raises ``TypeError: unhashable type: 'list'`` — recorded as a
    CRASH, not a rows row (p3b/f_map in CORRECTNESS_r07). Every
    oracle-less query's schema must therefore be scalar-typed:
    flatten arrays with array_join / element_at before registering."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType

    load_all()
    offenders = []
    for name, spec in QUERIES.items():
        if spec["oracle"] is not None:
            continue
        df = spec["fn"](spark, sf_dir)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, BinaryType))
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, f"rows-only queries with complex-typed columns: {offenders}"


def test_prior_green_rounds_match_correctness_files():
    """Every name in DRIVER_GREEN_PRIOR_ROUNDS must correspond to its
    MAXIMAL driver evidence in a committed CORRECTNESS_r*.json — a
    full rows+schema+hash green row for oracle-backed queries, or a
    non-error rows-only row (``err: "no_oracle"``, spark_rows
    recorded) for oracle-less-by-design queries, whose re-run would
    add nothing. The rotation list can't drift from the driver's
    actual evidence, and an oracle-BACKED query can never ride on a
    rows-only row."""
    import glob
    import json

    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    green: set[str] = set()
    rows_only_seen: set[str] = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                    green.add(name)
                elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                    rows_only_seen.add(name)
    for name in sorted(DRIVER_GREEN_PRIOR_ROUNDS):
        if name in green:
            continue
        assert name in QUERIES, f"prior-green name no longer registered: {name}"
        assert QUERIES[name]["oracle"] is None and name in rows_only_seen, (
            f"{name} listed as prior-green without a green CORRECTNESS row "
            "(oracle-backed queries need rows+schema+hash; oracle-less need "
            "a recorded rows-only row)"
        )
