"""Pins for L72 encoding QA (mojibake detect + repair).

The driver oracle hash-certifies the query end-to-end; these pin the
heuristic's boundary behavior (hand vectors, the inherent false
positive, non-Latin-1 passthrough) and the pure-JVM plan contract.
"""

import pytest
from pyspark.sql import functions as F

from ipydataclean_spark.operators.encoding_qa import (
    _L72_SUFFIXES,
    l72_encoding_qa,
    mojibake_repair,
)


def _run(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    fl, rep = mojibake_repair(F.col("t"))
    return df.select("t", fl.alias("f"), rep.alias("r")).collect()


def test_hand_vectors(spark):
    """Mojibake of every UTF-8 width repairs byte-exactly; ASCII,
    genuine Latin-1 accents, CJK, and emoji pass untouched."""
    originals = ["café", "naïve — déjà", "你好世界", "rocket 🚀 go", "ü" * 40]
    mojibake = [o.encode("utf-8").decode("latin-1") for o in originals]
    rows = _run(spark, mojibake)
    for orig, row in zip(originals, rows):
        assert row.f is True and row.r == orig
    clean = ["plain ascii", "café au lait", "你好世界", "🚀", "", "x"]
    for row in _run(spark, clean):
        assert row.f is False and row.r == row.t


def test_false_positive_boundary(spark):
    """The heuristic's inherent false positive (shared with ftfy):
    text that legitimately spells a valid UTF-8 sequence in Latin-1
    chars is 'repaired'. Pinned as documented behavior, not hidden."""
    (row,) = _run(spark, ["the sequence cafÃ© appears verbatim"])
    assert row.f is True
    assert row.r == "the sequence café appears verbatim"


def test_double_mojibake_repairs_one_layer(spark):
    """Twice-encoded text repairs the OUTER layer only per pass —
    running the repair again fixes the rest (the ftfy iteration
    contract); one pass never corrupts further."""
    orig = "déjà vu"
    once = orig.encode("utf-8").decode("latin-1")
    twice = once.encode("utf-8").decode("latin-1")
    (row,) = _run(spark, [twice])
    assert row.f is True and row.r == once
    (row2,) = _run(spark, [row.r])
    assert row2.f is True and row2.r == orig


def test_l72_query_nonvacuous_and_consistent(spark, sf_dir):
    rows = l72_encoding_qa(spark, sf_dir).collect()
    assert rows
    acts = {r.action for r in rows}
    assert acts == {"repaired", "kept"}
    for r in rows:
        d = r.doc_id
        decorated_suffix = _L72_SUFFIXES[(d // 2) % 4] if d % 2 == 0 else ""
        assert r.repaired.endswith(decorated_suffix) or decorated_suffix == ""
        assert (r.action == "repaired") == bool(r.mojibake)
        if r.mojibake:
            assert r.n_chars_in > r.n_chars_out  # bytes > codepoints
        else:
            assert r.n_chars_in == r.n_chars_out
    # all four suffix variants must occur among repaired rows at sf0.001+
    repaired_sfx = {
        _L72_SUFFIXES[(r.doc_id // 2) % 4]
        for r in rows
        if r.mojibake
    }
    assert len(repaired_sfx) >= 3


def test_l72_plan_is_pure_jvm(spark, sf_dir):
    """Plan gate: zero Python in the product path — the detector is
    regex + encode/is_valid_utf8/decode, all JVM expressions."""
    plan = (
        l72_encoding_qa(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PythonUDF" not in plan


def test_widget_loop_detects_and_repairs_mojibake(spark):
    """The reference's core loop, extended: problems() surfaces
    'mojibake' on a damaged string column, autofix routes to
    repair_mojibake FIRST (before any text interpretation), and the
    recipe's SQL export reproduces the repair value-for-value in
    DuckDB (the recipe_sql_export contract for the new step)."""
    import duckdb

    from ipydataclean_spark.api import DataCleaner

    originals = ["café au lait", "naïve — déjà", "你好", "plain", "x1 y", "señor"]
    dirty = [
        (i, o.encode("utf-8").decode("latin-1") if i % 2 == 0 else o)
        for i, o in enumerate(originals)
    ]
    df = spark.createDataFrame(dirty, "id long, note string")
    dc = DataCleaner(df)
    probs = dc.problems()
    assert ("note", "mojibake", 2) in probs  # ids 0 and 2 damaged non-ascii
    applied = dc.autofix(cols=["note"])
    fixes = [(a["problem"], a["fix"]) for a in applied]
    assert ("mojibake", "repair_mojibake") in fixes
    assert fixes.index(("mojibake", "repair_mojibake")) == 0
    got = {r.id: r.note for r in dc.df.collect()}
    assert got[0] == "café au lait" and got[2] == "你好"
    assert got[3] == "plain" and got[5] == "señor"

    # NULL passthrough of the standalone fix (autofix would also
    # mode-fill the null via the separate 'missing' problem)
    from ipydataclean_spark.operators.encoding_qa import repair_mojibake

    ndf = spark.createDataFrame([(None,)], "note string")
    assert repair_mojibake(ndf, "note").first().note is None

    # SQL export twin: run the generated SQL in DuckDB over the same
    # dirty rows and compare the repaired column value-for-value
    sql = dc.recipe.to_sql("src")
    con = duckdb.connect()
    con.execute("CREATE TABLE src(id BIGINT, note VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)", dirty)
    duck = {r[0]: r[1] for r in con.execute(
        f"SELECT id, note FROM ({sql})").fetchall()}
    assert duck == got
