"""Recipe — the engine's IR for cleaning sessions (SURVEY.md §1.2, §3.2).

The reference mutates a pandas DataFrame eagerly and keeps an op
history it can export as standalone pandas code [P]. The Spark-native
analogue: an immutable ordered list of named, parameterized steps,
each a pure DataFrame→DataFrame function. ``apply`` folds the steps
into ONE lazy plan (Catalyst optimizes across step boundaries —
filters written in step 5 still push down into the step-1 scan);
``to_code`` pretty-prints the session as standalone PySpark source
(the code-export parity feature).
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


@dataclass
class Recipe:
    steps: list[RecipeStep] = field(default_factory=list)

    def add(self, name: str, fn: Callable[[DataFrame], DataFrame], code: str, **params) -> "Recipe":
        self.steps.append(RecipeStep(name=name, params=params, fn=fn, code=code))
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
            "    standardize_units,",
            ")",
            f"df = {source_expr}",
        ]
        for step in self.steps:
            lines.append(f"# step: {step.name} {step.params}")
            lines.append(step.code)
        return "\n".join(lines)

    # ------------------------------------------------------------------
    # Fluent step constructors (the user-facing cleaning API)
    # ------------------------------------------------------------------

    def fill_value(self, col: str, value) -> "Recipe":
        from ipydataclean_spark.operators.cleaning import fill_value

        return self.add(
            "fill_value",
            lambda df: fill_value(df, col, value),
            f"df = df.withColumn({col!r}, F.coalesce(F.col({col!r}), F.lit({value!r})))",
            col=col,
            value=value,
        )

    def fill_aggregate(self, col: str, strategy: str = "mean") -> "Recipe":
        from ipydataclean_spark.operators.cleaning import fill_aggregate

        return self.add(
            "fill_aggregate",
            lambda df: fill_aggregate(df, col, strategy),
            f"df = fill_aggregate(df, {col!r}, {strategy!r})  # two-phase scalar fill",
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
            col=col,
            out=out,
        )

    def clip(self, col: str, lo: float, hi: float) -> "Recipe":
        from ipydataclean_spark.operators.cleaning import clip

        return self.add(
            "clip",
            lambda df: clip(df, col, lo, hi),
            f"df = df.withColumn({col!r}, F.greatest(F.least(F.col({col!r}), F.lit({hi!r})), F.lit({lo!r})))",
            col=col,
            lo=lo,
            hi=hi,
        )

    def drop_missing(self, cols: list[str]) -> "Recipe":
        return self.add(
            "drop_missing",
            lambda df: df.na.drop(subset=cols),
            f"df = df.na.drop(subset={cols!r})",
            cols=tuple(cols),
        )

    def dedup(self, keys: list[str], order_col: str) -> "Recipe":
        from ipydataclean_spark.operators.cleaning import dedup_exact

        return self.add(
            "dedup",
            lambda df: dedup_exact(df, keys, order_col),
            f"df = dedup_exact(df, {keys!r}, {order_col!r})",
            keys=tuple(keys),
            order_col=order_col,
        )

    def parse_dates(self, col: str, formats: list[str], out: str | None = None) -> "Recipe":
        from ipydataclean_spark.operators.featprep import parse_dates

        return self.add(
            "parse_dates",
            lambda df: parse_dates(df, col, formats, out),
            f"df = parse_dates(df, {col!r}, {formats!r}, {out!r})",
            col=col,
            formats=tuple(formats),
            out=out,
        )

    def standardize_units(
        self, col: str, conversions: dict[str, float], out: str | None = None
    ) -> "Recipe":
        from ipydataclean_spark.operators.featprep import standardize_units

        return self.add(
            "standardize_units",
            lambda df: standardize_units(df, col, conversions, out),
            f"df = standardize_units(df, {col!r}, {conversions!r}, {out!r})",
            col=col,
            conversions=tuple(sorted(conversions.items())),
            out=out,
        )

    def scale(self, col: str, method: str = "zscore", out: str | None = None) -> "Recipe":
        from ipydataclean_spark.operators.featprep import scale_minmax, scale_zscore

        fn = scale_zscore if method == "zscore" else scale_minmax
        return self.add(
            "scale",
            lambda df: fn(df, col, out),
            f"df = {fn.__name__}(df, {col!r}, {out!r})  # two-phase scalar job + codegen pass",
            col=col,
            method=method,
            out=out,
        )

    def one_hot(self, col: str, values: list[str]) -> "Recipe":
        from ipydataclean_spark.operators.featprep import one_hot

        return self.add(
            "one_hot",
            lambda df: one_hot(df, col, values),
            f"df = one_hot(df, {col!r}, {values!r})",
            col=col,
            values=tuple(values),
        )

    def redact(self, col: str, patterns: dict[str, str], out: str | None = None) -> "Recipe":
        from ipydataclean_spark.operators.featprep import redact_patterns

        return self.add(
            "redact",
            lambda df: redact_patterns(df, col, patterns, out),
            f"df = redact_patterns(df, {col!r}, {patterns!r}, {out!r})",
            col=col,
            patterns=tuple(patterns.items()),
            out=out,
        )
