"""Pins for L76 URL canonicalization + canonical-URL dedup
(operators/url_canonical.py).

The driver oracle hash-certifies the two-dialect canonicalizer
end-to-end; these pin hand vectors per damage class, combined
damage, idempotence, the no-scheme passthrough, and the pure-JVM
plan contract.
"""

import pytest
from pyspark.sql import functions as F

from ipydataclean_spark.operators.url_canonical import (
    canonical_url,
    canonical_url_sql,
    dedup_by_canonical_url,
    l76_url_canonical_dedup,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r.c for r in df.select(canonical_url(F.col("u")).alias("c")).collect()]


CASES = [
    ("https://example.com/p/1?id=1&x=1", "https://example.com/p/1?id=1&x=1"),
    ("HTTPS://EXAMPLE.COM/p/1?id=1&x=1", "https://example.com/p/1?id=1&x=1"),
    ("https://example.com:443/p/1?id=1&x=1", "https://example.com/p/1?id=1&x=1"),
    ("http://example.com:80/p", "http://example.com/p"),
    # NON-default port kept
    ("https://example.com:8443/p", "https://example.com:8443/p"),
    ("http://example.com:443/p", "http://example.com:443/p"),
    ("https://example.com/p/1?x=1&id=1", "https://example.com/p/1?id=1&x=1"),
    (
        "https://example.com/p/1?id=1&utm_source=feed&utm_medium=rss&x=1",
        "https://example.com/p/1?id=1&x=1",
    ),
    ("https://example.com/p/1?fbclid=abc&gclid=x", "https://example.com/p/1"),
    ("https://example.com/p/1?id=1&x=1#section-2", "https://example.com/p/1?id=1&x=1"),
    # empty query / bare ? / trailing &
    ("https://example.com/p?", "https://example.com/p"),
    ("https://example.com/p?a=1&", "https://example.com/p?a=1"),
    # path case is SIGNIFICANT (only scheme+authority fold)
    ("https://example.com/CaseSensitive/Path", "https://example.com/CaseSensitive/Path"),
    # userinfo-free authority with port and path and all damage at once
    (
        "HTTPS://Example.COM:443/a/b?z=9&utm_campaign=x&a=1#f",
        "https://example.com/a/b?a=1&z=9",
    ),
    # no scheme: passthrough, never a false merge
    ("not a url at all", "not a url at all"),
    ("example.com/p", "example.com/p"),
]


def test_hand_vectors(spark):
    got = _canon(spark, [c[0] for c in CASES])
    for (src, want), out in zip(CASES, got):
        assert out == want, (src, out, want)


def test_idempotence(spark):
    once = _canon(spark, [c[0] for c in CASES])
    twice = _canon(spark, once)
    assert twice == once


def test_sql_twin_agrees(spark):
    """The DuckDB dialect must produce the same canonical forms on
    the hand vectors (the driver hash proves it on the fixture; this
    proves it on the nastier hand set)."""
    import duckdb

    con = duckdb.connect()
    got = [
        con.execute(
            "SELECT " + canonical_url_sql("u") + " FROM (SELECT ? AS u)",
            [src],
        ).fetchone()[0]
        for src, _ in CASES
    ]
    assert got == [w for _, w in CASES]


def test_dedup_collapses_variants(spark):
    rows = [
        (1, "https://example.com/p/7?id=7&x=1"),
        (2, "HTTPS://EXAMPLE.COM/p/7?id=7&x=1"),
        (3, "https://example.com:443/p/7?x=1&id=7"),
        (4, "https://example.com/p/8?id=8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.canonical_url: r for r in dedup_by_canonical_url(df, "url").collect()}
    assert len(got) == 2
    seven = got["https://example.com/p/7?id=7&x=1"]
    assert seven.n_docs == 3 and seven.n_raw_variants == 3 and seven.min_doc == 1


def test_l76_plan_is_pure_jvm_and_nonvacuous(spark, sf_dir):
    q = l76_url_canonical_dedup(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PythonUDF" not in plan
    rows = q.collect()
    assert rows
    # real collapses occur: some canonical has multiple raw variants
    assert any(r.n_raw_variants > 1 for r in rows)
    assert all(r.n_docs >= r.n_raw_variants for r in rows)


def test_random_urls_twin_agreement_and_idempotence(spark):
    """Property check over generated URLs: for 120 random
    compositions of scheme case x host case x port x path depth x
    param multiset (with/without tracking) x fragment, the Spark and
    DuckDB canonicalizers agree exactly, canonicalization is
    idempotent, and adding pure damage (case/default port/tracking/
    fragment) to a clean base never changes its canonical form."""
    import duckdb
    import numpy as np

    rng = np.random.RandomState(1234)
    urls, bases = [], []
    for _ in range(120):
        scheme = ["http", "https", "HTTP", "HTTPS"][rng.randint(4)]
        host = "".join(
            (c.upper() if rng.randint(2) else c)
            for c in f"sub{rng.randint(9)}.example{rng.randint(9)}.com"
        )
        port = ["", ":80", ":443", ":8080"][rng.randint(4)]
        path = "/" + "/".join(
            f"seg{rng.randint(20)}" for _ in range(rng.randint(4))
        ).rstrip("/")
        n = rng.randint(4)
        params = [f"k{rng.randint(5)}={rng.randint(9)}" for _ in range(n)]
        if rng.randint(2):
            params.insert(rng.randint(len(params) + 1), "utm_source=x")
        qs = "?" + "&".join(params) if params else ""
        frag = "#frag" if rng.randint(2) else ""
        urls.append(f"{scheme}://{host}{port}{path}{qs}{frag}")
        kept = sorted(p for p in params if not p.startswith("utm_"))
        dport = {"http": ":80", "https": ":443"}[scheme.lower()]
        bases.append(
            scheme.lower() + "://" + host.lower()
            + (port if port not in ("", dport) else "")
            + path + ("?" + "&".join(kept) if kept else "")
        )
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r.c for r in df.select(canonical_url(F.col("u")).alias("c")).collect()]
    # expected form derived independently in the test
    assert got == bases
    # twin agreement
    con = duckdb.connect()
    duck = [
        con.execute(
            "SELECT " + canonical_url_sql("u") + " FROM (SELECT ? AS u)", [u]
        ).fetchone()[0]
        for u in urls
    ]
    assert duck == got
    # idempotence in one batch
    df2 = spark.createDataFrame([(u,) for u in got], "u string")
    again = [r.c for r in df2.select(canonical_url(F.col("u")).alias("c")).collect()]
    assert again == got
