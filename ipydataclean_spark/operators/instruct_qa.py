"""L71 — instruction-data conversation QA.

Instruction-tuning corpora arrive as JSON chat transcripts, and every
serious pipeline validates them before training: roles must
alternate user/assistant starting with user, no turn may be empty,
and per-role token budgets feed the mixture accounting. This
operator runs that QA Spark-NATIVE: the JSON parses with a schema'd
``from_json`` and every rule is a higher-order-function expression
over the parsed array (``exists``/``filter``/``aggregate`` — JVM,
whole-stage codegen), so at 100 TB the validation is a map-only scan
with zero Python in the hot path. Only the FIXTURE builder (a
deterministic transcript synthesized from ``documents.text``, with
seeded corruptions: doc_id % 7 == 3 breaks alternation, % 7 == 5
empties a turn) is a pandas kernel — the product path starts at the
JSON column.

Because transcript structure is a pure function of (text, doc_id),
the DuckDB oracle recomputes every output — turn counts, per-role
word counts under the corruptions, the violation verdict — directly
from the SOURCE text: a hash match certifies the whole
build→from_json→validate path (the l70/l9 closed-form trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T_

from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

#: words per synthesized turn
_L71_TURN_WORDS = 8

_CHAT_SCHEMA = T_.ArrayType(
    T_.StructType(
        [
            T_.StructField("role", T_.StringType()),
            T_.StructField("content", T_.StringType()),
        ]
    )
)


def conversation_qa(parsed: DataFrame, col: str = "turns") -> DataFrame:
    """(..., turns array<struct<role,content>>) -> + n_turns,
    n_user_words, n_assistant_words, valid, violation. Rule order
    (first failure wins): first_role, role_alternation,
    empty_content. All JVM-side expressions."""
    c = F.col(col)
    words = lambda s: F.size(F.filter(F.split(s, " "), lambda x: x != ""))  # noqa: E731
    role_words = lambda role: F.aggregate(  # noqa: E731
        F.filter(c, lambda t: t.role == role),
        F.lit(0),
        lambda acc, t: acc + words(t.content),
    ).cast("long")
    first_bad = F.element_at(c, 1).role != "user"
    # adjacent-pair alternation: zip the array with itself shifted by 1
    alt_bad = F.exists(
        F.zip_with(
            F.slice(c, 1, F.greatest(F.size(c) - 1, F.lit(0))),
            F.slice(c, 2, F.greatest(F.size(c) - 1, F.lit(0))),
            lambda a, b: a.role == b.role,
        ),
        lambda x: x,
    )
    empty_bad = F.exists(c, lambda t: F.length(t.content) == 0)
    violation = (
        F.when(first_bad, F.lit("first_role"))
        .when(alt_bad, F.lit("role_alternation"))
        .when(empty_bad, F.lit("empty_content"))
        .otherwise(F.lit("none"))
    )
    return parsed.select(
        "doc_id",
        F.size(c).cast("long").alias("n_turns"),
        role_words("user").alias("n_user_words"),
        role_words("assistant").alias("n_assistant_words"),
        (violation == "none").cast("int").alias("valid"),
        violation.alias("violation"),
    )


def _l71_oracle() -> str:
    tw = _L71_TURN_WORDS
    return (
        # transcript structure is a pure function of (text, doc_id):
        # words -> 8-word turns, roles alternate from user; %7==3
        # re-roles turn index 1 to user (alternation break), %7==5
        # empties turn index 1 (its words vanish) — both only when a
        # second turn exists
        "WITH src AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), w -> w <> '') AS ws "
        "FROM documents WHERE doc_id % 13 = 9 AND text IS NOT NULL "
        "AND length(text) > 0), "
        "base AS (SELECT doc_id, len(ws) AS nw, "
        f"CAST(CEIL(len(ws) / {tw}.0) AS BIGINT) AS n_turns FROM src "
        "WHERE len(ws) > 0), "
        "t AS (SELECT doc_id, nw, n_turns, "
        "unnest(range(0, n_turns)) AS ti FROM base), "
        "turns AS (SELECT doc_id, nw, n_turns, ti, "
        f"LEAST({tw}, nw - ti * {tw}) AS tw, "
        "CASE WHEN doc_id % 7 = 3 AND ti = 1 THEN 'user' "
        "WHEN ti % 2 = 0 THEN 'user' ELSE 'assistant' END AS role, "
        "CASE WHEN doc_id % 7 = 5 AND ti = 1 THEN 0 ELSE 1 END AS kept "
        "FROM t), "
        "agg AS (SELECT doc_id, MAX(n_turns) AS n_turns, "
        "CAST(SUM(CASE WHEN role = 'user' AND kept = 1 THEN tw ELSE 0 END) "
        "AS BIGINT) AS n_user_words, "
        "CAST(SUM(CASE WHEN role = 'assistant' AND kept = 1 THEN tw ELSE 0 END) "
        "AS BIGINT) AS n_assistant_words, "
        "MAX(CASE WHEN doc_id % 7 = 3 AND n_turns >= 2 THEN 1 ELSE 0 END) "
        "AS alt_bad, "
        "MAX(CASE WHEN doc_id % 7 = 5 AND n_turns >= 2 THEN 1 ELSE 0 END) "
        "AS empty_bad FROM turns GROUP BY doc_id) "
        "SELECT doc_id, n_turns, n_user_words, n_assistant_words, "
        "CASE WHEN alt_bad = 0 AND empty_bad = 0 THEN 1 ELSE 0 END AS valid, "
        "CASE WHEN alt_bad = 1 THEN 'role_alternation' "
        "WHEN empty_bad = 1 THEN 'empty_content' ELSE 'none' END AS violation "
        "FROM agg ORDER BY doc_id"
    )


@register("l71_conversation_qa", oracle=_l71_oracle(), tags=("L71", "L5", "L7", "quality"))
def l71_conversation_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L71: chat-transcript QA end-to-end — REAL JSON through a
    schema'd ``from_json`` parse and JVM higher-order-function
    validation (alternation via a self-shifted zip_with, emptiness
    via exists, per-role budgets via filter+aggregate folds). The
    fixture transcripts carry seeded corruptions (doc_id % 7 == 3:
    double-user turn; % 7 == 5: emptied turn), and the oracle
    recomputes every verdict and word budget from the SOURCE text, so
    a hash match certifies parse + all three rules + the budget
    arithmetic. Rule coverage on hand JSON (wrong first role, escaped
    quotes, malformed JSON -> null parse) is pinned in
    tests/test_html_extract.py."""

    def build(batches):
        import json as _json

        import pandas as _pd

        tw = _L71_TURN_WORDS
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                d = int(r.doc_id)
                words = [w for w in (r.text or "").split(" ") if w]
                if not words:
                    continue
                turns = []
                for ti in range(0, -(-len(words) // tw)):
                    chunk = " ".join(words[ti * tw : (ti + 1) * tw])
                    role = "user" if ti % 2 == 0 else "assistant"
                    if d % 7 == 3 and ti == 1:
                        role = "user"
                    if d % 7 == 5 and ti == 1:
                        chunk = ""
                    turns.append({"role": role, "content": chunk})
                rows.append({"doc_id": d, "chat_json": _json.dumps(turns)})
            yield _pd.DataFrame(rows, columns=["doc_id", "chat_json"])

    docs = (
        T(spark, sf_dir, "documents")
        .where(
            (F.col("doc_id") % 13 == 9)
            & F.col("text").isNotNull()
            & (F.length("text") > 0)
        )
        .select("doc_id", "text")
    )
    raw = docs.mapInPandas(build, schema="doc_id BIGINT, chat_json STRING")
    parsed = raw.select(
        "doc_id", F.from_json("chat_json", _CHAT_SCHEMA).alias("turns")
    )
    return conversation_qa(parsed).orderBy("doc_id")
