"""Recipe — the engine's IR for cleaning sessions (SURVEY.md §1.2, §3.2).

The reference mutates a pandas DataFrame eagerly and keeps an op
history it can export as standalone pandas code [P]. The Spark-native
analogue: an immutable ordered list of named, parameterized steps,
each a pure DataFrame→DataFrame function. ``apply`` folds the steps
into ONE lazy plan (Catalyst optimizes across step boundaries —
filters written in step 5 still push down into the step-1 scan);
``to_code`` pretty-prints the session as standalone PySpark source
(the code-export parity feature); ``to_sql`` exports the same session
as a DuckDB-dialect CTE chain (warehouse interop) — value-verified
against the Spark execution by the registered ``recipe_sql_export``
query, whose ORACLE is the generated SQL itself.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class RecipeStep:
    name: str
    params: dict
    fn: Callable[[DataFrame], DataFrame]
    code: str  # the equivalent standalone PySpark expression ("df = ...")
    #: SQL twin: (prev-CTE name[, target-exists flag]) -> SELECT
    #: reproducing this step (DuckDB dialect — the oracle engine;
    #: None = step has no SQL form). Two-arg generators receive
    #: whether their ``out`` column already exists in the input (see
    #: Recipe.sql_ctes output-column tracking).
    sql: Callable | None = None


def _sql_lit(v) -> str:
    """Embed a Python scalar as a SQL literal."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


#: Java datetime pattern -> C strptime, longest tokens first (the two
#: vocabularies Spark's try_to_timestamp and DuckDB's TRY_STRPTIME use).
_JAVA_TO_STRPTIME = [
    ("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"),
    ("HH", "%H"), ("mm", "%M"), ("ss", "%S"),
]


def java_format_to_strptime(fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        for tok, rep in _JAVA_TO_STRPTIME:
            if fmt.startswith(tok, i):
                out.append(rep)
                i += len(tok)
                break
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


@dataclass
class Recipe:
    steps: list[RecipeStep] = field(default_factory=list)

    def add(
        self,
        name: str,
        fn: Callable[[DataFrame], DataFrame],
        code: str,
        sql: Callable[[str], str] | None = None,
        **params,
    ) -> "Recipe":
        self.steps.append(
            RecipeStep(name=name, params=params, fn=fn, code=code, sql=sql)
        )
        return self

    def apply(self, df: DataFrame) -> DataFrame:
        for step in self.steps:
            df = step.fn(df)
        return df

    def to_code(self, source_expr: str = "df") -> str:
        """Standalone PySpark source reproducing the session."""
        lines = [
            "from pyspark.sql import functions as F",
            "from pyspark.sql import Window",
            "from ipydataclean_spark.operators.cleaning import dedup_exact, fill_aggregate",
            "from ipydataclean_spark.operators.featprep import (",
            "    one_hot, parse_dates, redact_patterns, scale_minmax, scale_zscore,",
            "    standardize_units, standardize_values_cluster,",
            ")",
            f"df = {source_expr}",
        ]
        for step in self.steps:
            lines.append(f"# step: {step.name} {step.params}")
            lines.append(step.code)
        return "\n".join(lines)

    # ------------------------------------------------------------------
    # SQL export (DuckDB dialect — the same engine the oracle runs)
    # ------------------------------------------------------------------

    def sql_ctes(self, source: str, prefix: str = "s") -> tuple[str, str]:
        """The recipe as a chain of CTE bodies over ``source``;
        returns (", s0 AS (...), s1 AS (...)", last_cte_name) for
        composition inside a larger WITH. Raises for steps without a
        SQL twin.

        Output-column tracking: a step whose ``out`` column was ADDED
        by an earlier step must emit ``SELECT * REPLACE`` (Spark's
        withColumn replaces silently; a bare ``SELECT *, e AS out``
        would duplicate the name and DuckDB would auto-rename it) —
        two-arg sql generators receive that existence flag."""
        import inspect

        parts, prev = [], source
        added_outs: set[str] = set()
        for i, step in enumerate(self.steps):
            if step.sql is None:
                raise ValueError(f"step {step.name!r} has no SQL twin")
            cur = f"{prefix}{i}"
            n_params = len(inspect.signature(step.sql).parameters)
            if n_params >= 2:
                tgt = step.params.get("out") or step.params.get("col")
                exists = tgt == step.params.get("col") or tgt in added_outs
                sql = step.sql(prev, exists)
            else:
                sql = step.sql(prev)
            out = step.params.get("out")
            if out and out != step.params.get("col"):
                added_outs.add(out)
            parts.append(f"{cur} AS ({sql})")
            prev = cur
        body = (", " + ", ".join(parts)) if parts else ""
        return body, prev

    def to_sql(self, source: str) -> str:
        """Standalone SQL reproducing the session over table
        ``source`` — the interop export: the same cleaning pipeline,
        runnable on any warehouse speaking DuckDB-flavored SQL, and
        value-identical to ``apply`` (the registered
        ``recipe_sql_export`` query uses THIS output as its oracle, so
        the export is driver-hash-verified, not just eyeballed)."""
        body, last = self.sql_ctes(source)
        if not body:
            return f"SELECT * FROM {source}"
        return f"WITH {body[2:]} SELECT * FROM {last}"

    # ------------------------------------------------------------------
    # Fluent step constructors (the user-facing cleaning API)
    # ------------------------------------------------------------------

    def fill_value(self, col: str, value) -> "Recipe":
        from ipydataclean_spark.operators.cleaning import fill_value

        return self.add(
            "fill_value",
            lambda df: fill_value(df, col, value),
            f"df = df.withColumn({col!r}, F.coalesce(F.col({col!r}), F.lit({value!r})))",
            sql=lambda p: (
                f"SELECT * REPLACE (COALESCE({col}, {_sql_lit(value)}) AS {col}) FROM {p}"
            ),
            col=col,
            value=value,
        )

    def fill_aggregate(self, col: str, strategy: str = "mean") -> "Recipe":
        from ipydataclean_spark.operators.cleaning import fill_aggregate

        from ipydataclean_spark.functions import exact

        def _scalar_sql(p: str) -> str:
            if strategy == "mean":
                return f"(SELECT {exact.davg_sql(col)} FROM {p})"
            if strategy == "median":
                # exact_median interpolates like QUANTILE_CONT (proven
                # by the recipe_pipeline oracle)
                return f"(SELECT QUANTILE_CONT({col}, 0.5) FROM {p})"
            if strategy == "mode":
                return (
                    f"(SELECT {col} FROM {p} WHERE {col} IS NOT NULL "
                    f"GROUP BY {col} ORDER BY COUNT(*) DESC, {col} LIMIT 1)"
                )
            raise ValueError(f"unknown fill strategy: {strategy}")

        return self.add(
            "fill_aggregate",
            lambda df: fill_aggregate(df, col, strategy),
            f"df = fill_aggregate(df, {col!r}, {strategy!r})  # two-phase scalar fill",
            sql=lambda p: (
                f"SELECT * REPLACE (COALESCE({col}, {_scalar_sql(p)}) AS {col}) FROM {p}"
            ),
            col=col,
            strategy=strategy,
        )

    def convert_numeric(self, col: str, out: str | None = None) -> "Recipe":
        from pyspark.sql import functions as F

        out = out or col
        expr = f"TRY_CAST(REPLACE(REPLACE({col}, ' kg', ''), ',', '') AS DOUBLE)"
        return self.add(
            "convert_numeric",
            lambda df: df.withColumn(out, F.expr(expr)),
            f"df = df.withColumn({out!r}, F.expr({expr!r}))",
            # the cleanup expression is already dialect-shared
            sql=lambda p, ex: (
                f"SELECT * REPLACE ({expr} AS {out}) FROM {p}"
                if ex
                else f"SELECT *, {expr} AS {out} FROM {p}"
            ),
            col=col,
            out=out,
        )

    def clip(self, col: str, lo: float, hi: float) -> "Recipe":
        from ipydataclean_spark.operators.cleaning import clip

        return self.add(
            "clip",
            lambda df: clip(df, col, lo, hi),
            f"df = df.withColumn({col!r}, F.greatest(F.least(F.col({col!r}), F.lit({hi!r})), F.lit({lo!r})))",
            sql=lambda p: (
                f"SELECT * REPLACE (GREATEST(LEAST({col}, {_sql_lit(hi)}), "
                f"{_sql_lit(lo)}) AS {col}) FROM {p}"
            ),
            col=col,
            lo=lo,
            hi=hi,
        )

    def drop_missing(self, cols: list[str]) -> "Recipe":
        return self.add(
            "drop_missing",
            lambda df: df.na.drop(subset=cols),
            f"df = df.na.drop(subset={cols!r})",
            sql=lambda p: (
                f"SELECT * FROM {p} WHERE "
                + " AND ".join(f"{c} IS NOT NULL" for c in cols)
            ),
            cols=tuple(cols),
        )

    def dedup(self, keys: list[str], order_col: str) -> "Recipe":
        from ipydataclean_spark.operators.cleaning import dedup_exact

        return self.add(
            "dedup",
            lambda df: dedup_exact(df, keys, order_col),
            f"df = dedup_exact(df, {keys!r}, {order_col!r})",
            sql=lambda p: (
                f"SELECT * FROM {p} QUALIFY ROW_NUMBER() OVER "
                f"(PARTITION BY {', '.join(keys)} ORDER BY {order_col}) = 1"
            ),
            keys=tuple(keys),
            order_col=order_col,
        )

    def parse_dates(self, col: str, formats: list[str], out: str | None = None) -> "Recipe":
        from ipydataclean_spark.operators.featprep import parse_dates

        tries = ", ".join(
            f"TRY_STRPTIME({col}, {_sql_lit(java_format_to_strptime(f))})"
            for f in formats
        )
        tgt = out or col
        return self.add(
            "parse_dates",
            lambda df: parse_dates(df, col, formats, out),
            f"df = parse_dates(df, {col!r}, {formats!r}, {out!r})",
            sql=lambda p, ex: (
                f"SELECT * REPLACE (CAST(COALESCE({tries}) AS DATE) AS {tgt}) FROM {p}"
                if ex
                else f"SELECT *, CAST(COALESCE({tries}) AS DATE) AS {tgt} FROM {p}"
            ),
            col=col,
            formats=tuple(formats),
            out=out,
        )

    def standardize_units(
        self, col: str, conversions: dict[str, float], out: str | None = None
    ) -> "Recipe":
        from ipydataclean_spark.operators.featprep import standardize_units

        tgt = out or col
        num = f"TRY_CAST(REGEXP_EXTRACT({col}, '^([0-9.]+)', 1) AS DOUBLE)"
        unit = f"REGEXP_EXTRACT({col}, '([a-z]+)$', 1)"
        whens = " ".join(
            f"WHEN {_sql_lit(u)} THEN {_sql_lit(float(k))}"
            for u, k in sorted(conversions.items())
        )
        # empty conversions (headless autofix identity map) must NOT
        # render 'CASE <unit> ELSE 1.0 END' — a CASE with zero WHEN arms
        # is invalid SQL in both Spark and DuckDB; mirror the DataFrame
        # path's F.lit(1.0) fallback (ADVICE r04)
        factor = f"CASE {unit} {whens} ELSE 1.0 END" if whens else "1.0"
        return self.add(
            "standardize_units",
            lambda df: standardize_units(df, col, conversions, out),
            f"df = standardize_units(df, {col!r}, {conversions!r}, {out!r})",
            sql=lambda p, ex: (
                f"SELECT * REPLACE ({num} * {factor} AS {tgt}) FROM {p}"
                if ex
                else f"SELECT *, {num} * {factor} AS {tgt} FROM {p}"
            ),
            col=col,
            conversions=tuple(sorted(conversions.items())),
            out=out,
        )

    def repair_mojibake(self, col: str, out: str | None = None) -> "Recipe":
        """L72 as a widget fix: repair UTF-8-as-Latin-1 double
        encoding in ``col`` (clean values untouched — see
        operators.encoding_qa). The SQL twin re-reads code points as
        bytes behind the one-definition strict-validity regex, so the
        export reproduces the repair on any DuckDB-dialect warehouse."""
        from ipydataclean_spark.operators.encoding_qa import (
            mojibake_repair_sql,
            repair_mojibake,
        )

        tgt = out or col
        return self.add(
            "repair_mojibake",
            lambda df: repair_mojibake(df, col, out),
            "from ipydataclean_spark.operators.encoding_qa import repair_mojibake\n"
            f"df = repair_mojibake(df, {col!r}, {out!r})",
            sql=lambda p, ex: (
                f"SELECT * REPLACE ({mojibake_repair_sql(col)} AS {tgt}) FROM {p}"
                if ex
                else f"SELECT *, {mojibake_repair_sql(col)} AS {tgt} FROM {p}"
            ),
            col=col,
            out=out,
        )

    def standardize_values(self, col: str, out: str | None = None) -> "Recipe":
        """OpenRefine-style bulk value standardization (c34/c35): every
        raw variant of ``col`` is replaced by its fingerprint cluster's
        canonical (most frequent variant, ties lexicographic; key =
        lower+trim). Two-phase like fill_aggregate: the mapping is
        computed FROM the data at apply time — variant-table sized, so
        the apply is a broadcast join at any scale. NULLs pass through
        (left join + coalesce). The SQL twin derives the identical
        mapping from the same source CTE."""
        from ipydataclean_spark.operators.featprep import standardize_values_cluster

        tgt = out or col

        def _sql(p: str, ex: bool) -> str:
            fp = f"LOWER(TRIM(s.{col}))"
            canon = (
                f"(SELECT fp, canonical FROM ("
                f"SELECT LOWER(TRIM({col})) AS fp, {col} AS canonical, "
                f"ROW_NUMBER() OVER (PARTITION BY LOWER(TRIM({col})) "
                f"ORDER BY COUNT(*) DESC, {col}) AS rn "
                f"FROM {p} WHERE {col} IS NOT NULL GROUP BY 1, 2) WHERE rn = 1)"
            )
            expr = f"COALESCE(c.canonical, s.{col})"
            if ex:
                sel = f"s.* REPLACE ({expr} AS {tgt})"
            else:
                sel = f"s.*, {expr} AS {tgt}"
            return (
                f"SELECT {sel} FROM {p} s LEFT JOIN {canon} c ON {fp} = c.fp"
            )

        return self.add(
            "standardize_values",
            lambda df: standardize_values_cluster(df, col, out),
            f"df = standardize_values_cluster(df, {col!r}, {out!r})",
            sql=_sql,
            col=col,
            out=out,
        )

    def scale(self, col: str, method: str = "zscore", out: str | None = None) -> "Recipe":
        from ipydataclean_spark.operators.featprep import scale_minmax, scale_zscore

        from ipydataclean_spark.functions import exact

        fn = scale_zscore if method == "zscore" else scale_minmax
        tgt = out or col

        def _scale_sql(p: str, ex: bool) -> str:
            # one CASE covering BOTH driver-time branches of the Spark
            # two-phase form (constant/empty column -> 0.0-or-NULL)
            if method == "zscore":
                m = f"(SELECT {exact.davg_sql(col)} FROM {p})"
                sd = f"(SELECT {exact.dstddev_sql(col)} FROM {p})"
                e = (
                    f"CASE WHEN {sd} IS NULL OR {sd} = 0 THEN "
                    f"CASE WHEN {col} IS NOT NULL THEN 0.0 END "
                    f"ELSE ({col} - {m}) / {sd} END"
                )
            else:
                lo = f"(SELECT MIN({col}) FROM {p})"
                hi = f"(SELECT MAX({col}) FROM {p})"
                e = (
                    f"CASE WHEN {lo} IS NULL OR {lo} = {hi} THEN "
                    f"CASE WHEN {col} IS NOT NULL THEN 0.0 END "
                    f"ELSE ({col} - {lo}) / ({hi} - {lo}) END"
                )
            if ex:
                return f"SELECT * REPLACE ({e} AS {tgt}) FROM {p}"
            return f"SELECT *, {e} AS {tgt} FROM {p}"

        return self.add(
            "scale",
            lambda df: fn(df, col, out),
            f"df = {fn.__name__}(df, {col!r}, {out!r})  # two-phase scalar job + codegen pass",
            sql=_scale_sql,
            col=col,
            method=method,
            out=out,
        )

    def one_hot(self, col: str, values: list[str]) -> "Recipe":
        from ipydataclean_spark.operators.featprep import one_hot

        indicators = ", ".join(
            f"CAST(CASE WHEN {col} = {_sql_lit(v)} THEN 1 ELSE 0 END AS INT) AS "
            + f"{col}__{str(v).lower().replace(' ', '_').replace('-', '_')}"
            for v in sorted(values)
        )
        return self.add(
            "one_hot",
            lambda df: one_hot(df, col, values),
            f"df = one_hot(df, {col!r}, {values!r})",
            sql=lambda p: f"SELECT *, {indicators} FROM {p}",
            col=col,
            values=tuple(values),
        )

    def redact(self, col: str, patterns: dict[str, str], out: str | None = None) -> "Recipe":
        from ipydataclean_spark.operators.featprep import redact_patterns

        tgt = out or col
        e = col
        for pat, repl in patterns.items():
            # Spark regexp_replace is replace-ALL; DuckDB needs 'g'
            e = f"REGEXP_REPLACE({e}, {_sql_lit(pat)}, {_sql_lit(repl)}, 'g')"
        redact_expr = e
        return self.add(
            "redact",
            lambda df: redact_patterns(df, col, patterns, out),
            f"df = redact_patterns(df, {col!r}, {patterns!r}, {out!r})",
            sql=lambda p, ex: (
                f"SELECT * REPLACE ({redact_expr} AS {tgt}) FROM {p}"
                if ex
                else f"SELECT *, {redact_expr} AS {tgt} FROM {p}"
            ),
            col=col,
            patterns=tuple(patterns.items()),
            out=out,
        )
