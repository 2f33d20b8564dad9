"""Pins for L77 robots.txt evaluation (operators/robots_filter.py).

The driver oracle hash-certifies the relational evaluator in both
dialects; these pin RFC 9309 semantics the fixture exercises only
partially (tie-breaking, empty values, rules before any group, CRLF
tolerance, case-insensitive directives) plus the pure-JVM plan gate.
"""

import pytest
from pyspark.sql import functions as F

from ipydataclean_spark.operators.robots_filter import (
    l77_robots_filter,
    parse_robots,
    robots_decisions,
)


def _decide(spark, robots_txt, paths, agent="trainbot"):
    robots = spark.createDataFrame(
        [("h.example.com", robots_txt)], "host string, robots_txt string"
    )
    urls = spark.createDataFrame(
        [(i, "h.example.com", p) for i, p in enumerate(paths)],
        "doc_id long, host string, upath string",
    )
    rows = robots_decisions(urls, parse_robots(robots), agent).collect()
    return {r.upath: (r.decision, r.matched_rule) for r in rows}


def test_rfc9309_semantics(spark):
    txt = (
        "User-agent: *\n"
        "Disallow: /a\n"
        "Allow: /a/b\n"
        "Disallow: /a/b\n"   # SAME length as the Allow: Allow wins the tie
        "Disallow: /c\n"
        "Allow: \n"          # empty value: no-op, must not allow-all
    )
    got = _decide(spark, txt, ["/a/x", "/a/b/y", "/c", "/d"])
    assert got["/a/x"] == ("disallowed", "/a")
    assert got["/a/b/y"] == ("allowed", "/a/b")
    assert got["/c"] == ("disallowed", "/c")
    assert got["/d"] == ("allowed", "-")


def test_group_selection_specific_wins(spark):
    txt = (
        "User-agent: *\nDisallow: /\n"
        "User-agent: trainbot\nDisallow: /only-this\n"
    )
    got = _decide(spark, txt, ["/anything", "/only-this/x"])
    # the * group's Disallow: / must NOT apply — specific group wins
    assert got["/anything"] == ("allowed", "-")
    assert got["/only-this/x"] == ("disallowed", "/only-this")
    # and a crawler with no specific group uses *
    got2 = _decide(spark, txt, ["/anything"], agent="otherbot")
    assert got2["/anything"] == ("disallowed", "/")


def test_parser_edges(spark):
    txt = (
        "Disallow: /orphan\n"       # before any User-agent: dropped
        "USER-AGENT: TrainBot\n"    # case-insensitive directive AND token
        "DISALLOW: /x\n"
        "# not a directive\n"
        "Crawl-delay: 5\n"          # unknown directive ignored
    )
    rules = parse_robots(
        spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    ).collect()
    assert [(r.ua, r.directive, r.path) for r in rules] == [
        ("trainbot", "disallow", "/x")
    ]


def test_l77_plan_is_pure_jvm_and_nonvacuous(spark, sf_dir):
    q = l77_robots_filter(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PythonUDF" not in plan
    rows = q.collect()
    assert rows
    assert {r.decision for r in rows} == {"allowed", "disallowed"}
    # the precedence inversion is visible: /private paths are
    # disallowed on * hosts and allowed on trainbot (j%4==0) hosts
    priv = [r for r in rows if r.upath.startswith("/private/x")]
    assert priv
    for r in priv:
        j = int(r.host[1:].split(".")[0])
        assert r.decision == ("allowed" if j % 4 == 0 else "disallowed"), r


def test_pipeline_crawl_frontend(spark, sf_dir):
    from ipydataclean_spark.operators.robots_filter import (
        pipeline_crawl_frontend,
    )

    q = pipeline_crawl_frontend(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PythonUDF" not in plan
    rows = q.collect()
    assert rows
    for r in rows:
        assert 0 < r.n_allowed <= r.n_urls
        assert 0 < r.n_pages <= r.n_allowed
    # the canonical dedup is doing real work somewhere: the '/' shape
    # and the URL damage classes collapse to fewer pages than allowed
    assert any(r.n_pages < r.n_allowed for r in rows)
