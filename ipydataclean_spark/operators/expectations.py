"""Declarative data-quality expectations (Deequ-style, public method:
Schelter et al., "Automating Large-Scale Data Quality Verification",
VLDB 2018) — a check suite where EVERY check contributes one aggregate
expression and the whole suite evaluates in a SINGLE scan/agg pass,
the same P10 one-pass rule the profiler follows.

Spark-first shape: checks fold into one ``agg`` (all partial-
aggregable, map-side combined); the per-check verdict rows come from
exploding a literal-indexed array over the 1-row metric result —
zero extra scans, zero shuffles beyond the single global agg. On a
100 TB table the suite costs exactly one pass regardless of how many
checks it carries.

Each check also emits a DuckDB SQL twin, so a suite can be exported
as one oracle query (`x1_expectations` is hash-verified this way —
the registered oracle is generated from the same check objects).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T, lineitem_dirty
from ipydataclean_spark.operators.qhelp import with_lineitem_dirty
from ipydataclean_spark.registry import register


@dataclass(frozen=True)
class Check:
    name: str
    #: thunk -> aggregate Column (lazy: Columns need an active
    #: SparkContext, but suites are also built at import time to
    #: generate the oracle SQL)
    metric: "object"
    metric_sql: str  # DuckDB twin of ``metric()``
    # verdict bounds: metric must land in [lo, hi] (None = unbounded)
    lo: float | None
    hi: float | None
    #: True for checks whose Spark metric depends on the session
    #: timezone (evaluate() enforces UTC for these)
    tz_sensitive: bool = False
    #: optional ROW-level form (thunk -> Column boolean; None for
    #: suite-level-only checks like uniqueness/mean/size/freshness) —
    #: powers Suite.split()'s quarantine routing
    row_pred: "object" = None
    row_pred_sql: str | None = None

    def passed(self, m: Column) -> Column:
        conds = []
        if self.lo is not None:
            conds.append(m >= self.lo)
        if self.hi is not None:
            conds.append(m <= self.hi)
        out = F.lit(True)
        for c in conds:
            out = out & c
        return out

    def passed_sql(self, m: str) -> str:
        conds = []
        if self.lo is not None:
            conds.append(f"{m} >= {self.lo!r}")
        if self.hi is not None:
            conds.append(f"{m} <= {self.hi!r}")
        return " AND ".join(conds) if conds else "TRUE"


def _frac(cond: Column) -> Column:
    return F.round(
        F.sum(cond.cast("long")).cast("double") / F.count(F.lit(1)), 8
    )


def _frac_sql(cond: str) -> str:
    return f"ROUND(CAST(COUNT_IF({cond}) AS DOUBLE) / COUNT(*), 8)"


class Suite:
    """Fluent builder for a one-pass expectation suite."""

    def __init__(self) -> None:
        self.checks: list[Check] = []

    def _add(self, c: Check) -> "Suite":
        if any(x.name == c.name for x in self.checks):
            raise ValueError(f"duplicate check name: {c.name}")
        self.checks.append(c)
        return self

    # -- check constructors -------------------------------------------

    def completeness(self, col: str, min_ratio: float) -> "Suite":
        return self._add(Check(
            f"completeness_{col}",
            lambda: _frac(F.col(col).isNotNull()),
            _frac_sql(f"{col} IS NOT NULL"),
            lo=min_ratio, hi=None,
            row_pred=lambda: F.col(col).isNotNull(),
            row_pred_sql=f"{col} IS NOT NULL",
        ))

    def uniqueness(self, col: str, min_ratio: float = 1.0) -> "Suite":
        """distinct / non-null count (1.0 = key-like)."""
        return self._add(Check(
            f"uniqueness_{col}",
            lambda: F.round(
                F.countDistinct(F.col(col)).cast("double")
                / F.sum(F.col(col).isNotNull().cast("long")), 8
            ),
            f"ROUND(CAST(COUNT(DISTINCT {col}) AS DOUBLE) / COUNT({col}), 8)",
            lo=min_ratio, hi=None,
        ))

    def bounds(self, col: str, lo: float, hi: float) -> "Suite":
        """Every non-null value inside [lo, hi] (metric = conforming
        fraction, must be 1.0)."""
        return self._add(Check(
            f"bounds_{col}",
            lambda: _frac(
                F.col(col).isNull() | ((F.col(col) >= lo) & (F.col(col) <= hi))
            ),
            _frac_sql(f"({col} IS NULL OR ({col} >= {lo!r} AND {col} <= {hi!r}))"),
            lo=1.0, hi=None,
            row_pred=lambda: F.col(col).isNull()
            | ((F.col(col) >= lo) & (F.col(col) <= hi)),
            row_pred_sql=f"({col} IS NULL OR ({col} >= {lo!r} AND {col} <= {hi!r}))",
        ))

    def mean_between(self, col: str, lo: float, hi: float) -> "Suite":
        return self._add(Check(
            f"mean_{col}",
            lambda: F.round(exact.davg(col), 8),
            f"ROUND({exact.davg_sql(col)}, 8)",
            lo=lo, hi=hi,
        ))

    def contained_in(self, col: str, values: list[str], min_ratio: float) -> "Suite":
        vals = sorted(values)
        in_sql = ", ".join("'" + str(v).replace("'", "''") + "'" for v in vals)
        return self._add(Check(
            f"contained_{col}",
            lambda: _frac(F.col(col).isin(vals)),
            _frac_sql(f"{col} IN ({in_sql})"),
            lo=min_ratio, hi=None,
            row_pred=lambda: F.col(col).isin(vals),
            row_pred_sql=f"{col} IN ({in_sql})",
        ))

    def matches(self, col: str, pattern: str, min_ratio: float) -> "Suite":
        pat_sql = pattern.replace("'", "''")
        return self._add(Check(
            f"matches_{col}",
            lambda: _frac(F.col(col).rlike(pattern)),
            _frac_sql(f"REGEXP_MATCHES({col}, '{pat_sql}')"),
            lo=min_ratio, hi=None,
            row_pred=lambda: F.col(col).rlike(pattern),
            row_pred_sql=f"REGEXP_MATCHES({col}, '{pat_sql}')",
        ))

    def matches_decimal(self, col: str, min_ratio: float) -> "Suite":
        """``matches(col, '^[0-9]+(\\.[0-9]+)?\\z', ...)`` with a
        REGEX-FREE Spark predicate: strip digits with ``translate``
        and require the residue to be empty (pure integer) or a
        single interior dot. Exactly equivalent to the regex for ALL
        inputs including NULL (residue comparisons propagate NULL
        like rlike does), empty string (length guard), and trailing
        line terminators — the pattern anchors with \\z (end of
        input) rather than $ precisely because Java's $ matches
        BEFORE a final newline while RE2/DuckDB's does not
        (round-5 review finding): with $ the two engines and the
        translate predicate three-way disagree on '12.5\\n'. The SQL
        twin keeps the regex form, so the oracle hash certifies the
        equivalence on real data, and the check NAME matches
        matches()'s so quarantine reason strings are interchangeable.

        Measured slower than the regex on this fixture (x3b, BENCH.md
        round 5: translate's per-row allocation loses to a compiled
        1-6-char anchored pattern) — use when the pattern is long or
        backtracking-prone, not as a blanket regex replacement."""
        def pred() -> F.Column:
            c = F.col(col)
            rest = F.translate(c, "0123456789", "")
            return ((rest == "") & (F.length(c) >= 1)) | (
                (rest == ".") & ~c.startswith(".") & ~c.endswith(".")
            )

        pat_sql = "^[0-9]+(\\.[0-9]+)?\\z".replace("'", "''")
        return self._add(Check(
            f"matches_{col}",
            lambda: _frac(pred()),
            _frac_sql(f"REGEXP_MATCHES({col}, '{pat_sql}')"),
            lo=min_ratio, hi=None,
            row_pred=pred,
            row_pred_sql=f"REGEXP_MATCHES({col}, '{pat_sql}')",
        ))

    def unique_rows(self, cols: list[str], min_ratio: float = 1.0) -> "Suite":
        """Multi-column key check: distinct(cols-tuple) / rows.
        NULL semantics pinned to Spark's countDistinct (tuples with
        any NULL column are excluded from the distinct count); the
        SQL twin wraps the tuple in a CASE so DuckDB's ROW(NULL,...)
        counting can't diverge."""
        name = "unique_" + "_".join(cols)
        tup = ", ".join(cols)
        not_null = " AND ".join(f"{c} IS NOT NULL" for c in cols)
        return self._add(Check(
            name,
            lambda: F.round(
                F.countDistinct(*[F.col(c) for c in cols]).cast("double")
                / F.count(F.lit(1)), 8
            ),
            f"ROUND(CAST(COUNT(DISTINCT CASE WHEN {not_null} THEN ({tup}) END) "
            "AS DOUBLE) / COUNT(*), 8)",
            lo=min_ratio, hi=None,
        ))

    def fresh_after(self, ts_col: str, cutoff_iso: str) -> "Suite":
        """Freshness: max(ts_col) must be at or after the cutoff
        (metric = max epoch seconds; bound = cutoff epoch seconds,
        cutoff interpreted as UTC). The staleness alarm a
        daily-loaded table needs.

        TIMEZONE-SENSITIVE: Spark's unix_timestamp reads wall-clock
        DATE/NTZ values in the SESSION timezone, while the DuckDB
        twin's EPOCH() is UTC — so evaluate() refuses to run this
        check unless spark.sql.session.timeZone is UTC (the engine
        session pins it; a foreign session gets a clear error instead
        of a ±14 h alarm skew)."""
        import datetime as _dt

        cut = _dt.datetime.fromisoformat(cutoff_iso).replace(
            tzinfo=_dt.timezone.utc
        ).timestamp()
        return self._add(Check(
            f"fresh_{ts_col}",
            lambda: F.unix_timestamp(F.max(ts_col)).cast("double"),
            f"CAST(EPOCH(MAX({ts_col})) AS DOUBLE)",
            lo=float(cut), hi=None,
            tz_sensitive=True,
        ))

    def size_between(self, lo: int, hi: int) -> "Suite":
        return self._add(Check(
            "size",
            lambda: F.count(F.lit(1)).cast("double"),
            "CAST(COUNT(*) AS DOUBLE)",
            lo=float(lo), hi=float(hi),
        ))

    # -- quarantine routing -------------------------------------------

    def split(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Route rows by the suite's ROW-level checks (Deequ's
        row-level-results / expectation-quarantine pattern): returns
        (passing rows unchanged, failing rows + a ``failed_checks``
        column naming every violated check in suite order). One
        projection, no shuffle — the split is two filters over the
        same tagged plan, so a writer can fan both sides out of a
        single scan. Suite-level checks (uniqueness, mean, size,
        freshness) don't name individual rows and are ignored here;
        evaluate() carries them."""
        row_checks = [c for c in self.checks if c.row_pred is not None]
        if not row_checks:
            raise ValueError("no row-level checks in suite")
        tags = F.array_compact(F.array(*[
            F.when(~c.row_pred(), F.lit(c.name)) for c in row_checks
        ]))
        tagged = df.withColumn("failed_checks", F.array_join(tags, ","))
        good = tagged.where(F.col("failed_checks") == "").drop("failed_checks")
        bad = tagged.where(F.col("failed_checks") != "")
        return good, bad

    def quarantine_sql(self, source: str, out_cols: list[str]) -> str:
        """DuckDB twin of split()[1]: the failing rows with the same
        comma-joined failed_checks string."""
        row_checks = [c for c in self.checks if c.row_pred_sql is not None]
        cases = ", ".join(
            f"CASE WHEN NOT ({c.row_pred_sql}) THEN '{c.name}' END"
            for c in row_checks
        )
        cols = ", ".join(out_cols)
        return (
            f"SELECT {cols}, array_to_string(list_filter([{cases}], "
            f"x -> x IS NOT NULL), ',') AS failed_checks FROM {source} "
            f"WHERE array_to_string(list_filter([{cases}], "
            "x -> x IS NOT NULL), ',') <> ''"
        )

    # -- evaluation ----------------------------------------------------

    def evaluate(self, df: DataFrame) -> DataFrame:
        """ONE agg pass -> (check_name, metric, passed) rows.

        Plan: a single partial-aggregable global Aggregate computes
        every metric; the verdict rows explode a literal array over
        the 1-row result (driver-free, still one job)."""
        if any(c.tz_sensitive for c in self.checks):
            tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
            if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
                names = [c.name for c in self.checks if c.tz_sensitive]
                raise ValueError(
                    f"checks {names} need spark.sql.session.timeZone=UTC "
                    f"(session has {tz!r}); Spark reads wall-clock values "
                    "in the session zone while the SQL twin uses UTC"
                )
        agged = df.agg(
            *[c.metric().alias(f"__m{i}") for i, c in enumerate(self.checks)]
        )
        rows = F.array(*[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col(f"__m{i}").cast("double").alias("metric"),
                c.passed(F.col(f"__m{i}")).alias("passed"),
            )
            for i, c in enumerate(self.checks)
        ])
        return (
            agged.select(F.explode(rows).alias("r"))
            .select("r.check_name", "r.metric", "r.passed")
            .orderBy("check_name")
        )

    def to_sql(self, source: str) -> str:
        """The whole suite as ONE DuckDB query over ``source`` (single
        scan there too: one metric CTE + a literal unpivot)."""
        metrics = ", ".join(
            f"{c.metric_sql} AS __m{i}" for i, c in enumerate(self.checks)
        )
        arms = " UNION ALL ".join(
            f"SELECT '{c.name}' AS check_name, CAST(__m{i} AS DOUBLE) AS metric, "
            f"CAST({c.passed_sql(f'__m{i}')} AS BOOLEAN) AS passed FROM m"
            for i, c in enumerate(self.checks)
        )
        return f"WITH m AS (SELECT {metrics} FROM {source}) {arms} ORDER BY check_name"

    def to_sql_embedded(self, source: str) -> str:
        """Same query shaped for composition inside an existing WITH:
        ``", m AS (...) SELECT ..."`` appended after the caller's CTEs."""
        full = self.to_sql(source)
        return ", " + full[len("WITH ") :]


def _x1_suite() -> Suite:
    return (
        Suite()
        .completeness("qty_parsed", 0.97)
        .completeness("l_quantity", 1.0)
        .uniqueness("l_orderkey", 0.9)   # fails: ~4 lines per order
        .bounds("l_discount", 0.0, 0.1)
        .mean_between("l_quantity", 20.0, 30.0)
        .contained_in("l_returnflag", ["A", "N", "R"], 1.0)
        .contained_in("l_linestatus", ["F", "O"], 1.0)
        .matches("quantity_str", "^[0-9]+(\\.[0-9]+)?\\z", 0.9)
        .size_between(1000, 10_000_000)
    )


#: INDEPENDENT hand-written oracle for x1 (VERDICT r03 #7): derived
#: from the documented check semantics, NOT generated by ``to_sql`` —
#: each check is its own hand-spelled SELECT, so a bug in the SQL
#: generator and a bug in the Spark metrics can no longer cancel out.
_X1_ORACLE_BY_HAND = (
    ", c AS (SELECT 'completeness_qty_parsed' AS check_name, "
    "ROUND(CAST(COUNT(qty_parsed) AS DOUBLE) / COUNT(*), 8) AS metric "
    "FROM lineitem_dirty "
    "UNION ALL SELECT 'completeness_l_quantity', "
    "ROUND(CAST(COUNT(l_quantity) AS DOUBLE) / COUNT(*), 8) FROM lineitem_dirty "
    "UNION ALL SELECT 'uniqueness_l_orderkey', "
    "ROUND(CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) / COUNT(l_orderkey), 8) "
    "FROM lineitem_dirty "
    "UNION ALL SELECT 'bounds_l_discount', "
    "ROUND(CAST(COUNT_IF(l_discount IS NULL OR (l_discount >= 0.0 AND "
    "l_discount <= 0.1)) AS DOUBLE) / COUNT(*), 8) FROM lineitem_dirty "
    "UNION ALL SELECT 'mean_l_quantity', "
    "ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) "
    "/ COUNT(l_quantity), 8) FROM lineitem_dirty "
    "UNION ALL SELECT 'contained_l_returnflag', "
    "ROUND(CAST(COUNT_IF(l_returnflag IN ('A', 'N', 'R')) AS DOUBLE) "
    "/ COUNT(*), 8) FROM lineitem_dirty "
    "UNION ALL SELECT 'contained_l_linestatus', "
    "ROUND(CAST(COUNT_IF(l_linestatus IN ('F', 'O')) AS DOUBLE) "
    "/ COUNT(*), 8) FROM lineitem_dirty "
    "UNION ALL SELECT 'matches_quantity_str', "
    "ROUND(CAST(COUNT_IF(REGEXP_MATCHES(quantity_str, "
    "'^[0-9]+(\\.[0-9]+)?\\z')) AS DOUBLE) / COUNT(*), 8) FROM lineitem_dirty "
    "UNION ALL SELECT 'size', CAST(COUNT(*) AS DOUBLE) FROM lineitem_dirty) "
    "SELECT check_name, metric, CAST(CASE check_name "
    "WHEN 'completeness_qty_parsed' THEN metric >= 0.97 "
    "WHEN 'completeness_l_quantity' THEN metric >= 1.0 "
    "WHEN 'uniqueness_l_orderkey' THEN metric >= 0.9 "
    "WHEN 'bounds_l_discount' THEN metric >= 1.0 "
    "WHEN 'mean_l_quantity' THEN metric >= 20.0 AND metric <= 30.0 "
    "WHEN 'contained_l_returnflag' THEN metric >= 1.0 "
    "WHEN 'contained_l_linestatus' THEN metric >= 1.0 "
    "WHEN 'matches_quantity_str' THEN metric >= 0.9 "
    "WHEN 'size' THEN metric >= 1000.0 AND metric <= 10000000.0 "
    "END AS BOOLEAN) AS passed FROM c ORDER BY check_name"
)


@register(
    "x1_expectations",
    oracle=with_lineitem_dirty(_X1_ORACLE_BY_HAND),
    tags=("X1", "P2", "D1", "quality"),
)
def x1_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: declarative expectation suite over the dirty fixture — 8
    checks (completeness, uniqueness, bounds, mean window, set
    containment, regex conformity, table size) in ONE scan+agg.
    The oracle is HAND-WRITTEN from the documented check semantics
    (``_X1_ORACLE_BY_HAND``), independent of the suite's ``to_sql``
    generator — x2/x3 keep the generated twins, so both the
    generator path and the independent path are driver-verified
    (VERDICT r03 #7). The uniqueness check on l_orderkey is
    intentionally failing (lineitem has ~4 rows per order) so the
    verdict column carries signal."""
    return _x1_suite().evaluate(lineitem_dirty(spark, sf_dir))


def _x2_suite() -> Suite:
    return (
        Suite()
        .unique_rows(["o_orderkey"], 1.0)                  # true key
        .unique_rows(["o_custkey", "o_orderdate"], 0.999)  # near-key
        .completeness("o_totalprice", 1.0)
        .bounds("o_totalprice", 0.0, 1_000_000.0)
        .fresh_after("o_orderdate", "1998-01-01T00:00:00")
        .size_between(1000, 10_000_000)
    )


@register(
    "x2_expectations_orders",
    oracle="WITH src AS (SELECT * FROM orders)"
    + _x2_suite().to_sql_embedded("src"),
    tags=("X1", "P16", "quality"),
)
def x2_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: the table-contract checks on orders — single- and
    multi-column key uniqueness, value bounds, and FRESHNESS (max
    order date at/after cutoff, the staleness alarm for a daily
    load) — still ONE scan+agg; oracle generated by the suite's own
    to_sql."""
    return _x2_suite().evaluate(T(spark, sf_dir, "orders"))


_X3_COLS = ["l_orderkey", "l_linenumber", "quantity_str", "qty_parsed", "l_discount"]


@register(
    "x3_quarantine",
    oracle=with_lineitem_dirty(
        _x1_suite().quarantine_sql("lineitem_dirty", _X3_COLS)
        + " ORDER BY l_orderkey, l_linenumber LIMIT 500"
    ),
    tags=("X3", "X1", "D1", "quality"),
)
def x3_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: expectation quarantine — the failing side of Suite.split()
    over the dirty lineitem, each row tagged with EVERY row-level
    check it violates (comma-joined in suite order). The ingest
    pattern at 100 TB: one scan fans rows into the clean table and
    the quarantine table with reasons; the oracle is GENERATED from
    the same suite object (quarantine_sql), so routing logic and SQL
    twin cannot drift apart."""
    li = lineitem_dirty(spark, sf_dir)
    _good, bad = _x1_suite().split(li)
    return (
        bad.select(*_X3_COLS, "failed_checks")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    )


def _x1_suite_codegen() -> Suite:
    """_x1_suite with the regex conformity check swapped for the
    codegen-only matches_decimal — identical check names, thresholds,
    and semantics; only the Spark-side physical predicate differs."""
    return (
        Suite()
        .completeness("qty_parsed", 0.97)
        .completeness("l_quantity", 1.0)
        .uniqueness("l_orderkey", 0.9)
        .bounds("l_discount", 0.0, 0.1)
        .mean_between("l_quantity", 20.0, 30.0)
        .contained_in("l_returnflag", ["A", "N", "R"], 1.0)
        .contained_in("l_linestatus", ["F", "O"], 1.0)
        .matches_decimal("quantity_str", 0.9)
        .size_between(1000, 10_000_000)
    )


@register(
    "x3b_quarantine_codegen",
    oracle=with_lineitem_dirty(
        _x1_suite_codegen().quarantine_sql("lineitem_dirty", _X3_COLS)
        + " ORDER BY l_orderkey, l_linenumber LIMIT 500"
    ),
    tags=("X3", "X1", "quality", "scale-pattern"),
)
def x3b_quarantine_codegen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3b: x3's quarantine with the regex conformity check rewritten
    regex-free (matches_decimal) — the MEASURED A/B of x3's recorded
    "drop the regex" scale lever, and the measurement REFUTES it:
    idle order-swapped sf1 medians are x3 8.9-9.7 s vs x3b 16.9-17.9 s
    (BENCH.md round 5). The translate/startswith predicate allocates
    an intermediate string per row, while java.util.regex on a 1-6
    char anchored digit pattern is a tight compiled loop — so the
    regex form IS the hot-path choice here, and x3's ~linear scaling
    is row-proportional predicate work, not regex pathology. Kept
    registered because the equivalence itself is load-bearing: same
    reasons, same routing, same oracle SQL (the twin keeps
    REGEXP_MATCHES, so the driver hash certifies the rewrite exact on
    real data), and tests pin x3b row-equal to x3 — the harness a
    future predicate-rewrite candidate drops into."""
    li = lineitem_dirty(spark, sf_dir)
    _good, bad = _x1_suite_codegen().split(li)
    return (
        bad.select(*_X3_COLS, "failed_checks")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    )


_X5_ORACLE = (
    # quasi-identifier = (nation, market segment, account-balance band);
    # the release-candidate "view" a privacy audit would check
    "WITH qi AS (SELECT c_nationkey, c_mktsegment, "
    "CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT) AS bal_band "
    "FROM customer), "
    "grp AS (SELECT c_nationkey, c_mktsegment, bal_band, "
    "CAST(COUNT(*) AS BIGINT) AS group_size FROM qi GROUP BY 1, 2, 3) "
    "SELECT c_nationkey, c_mktsegment, bal_band, group_size "
    "FROM grp WHERE group_size < 5 "
    "ORDER BY group_size, c_nationkey, c_mktsegment, bal_band"
)


@register(
    "x5_k_anonymity",
    oracle=_X5_ORACLE,
    tags=("X5", "X1", "privacy", "quality"),
)
def x5_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: k-anonymity audit — the privacy-side data-quality check a
    release pipeline runs before publishing a dataset: group the table
    by its QUASI-IDENTIFIER columns (here nation × market segment ×
    $1000 account-balance band) and surface every equivalence class
    smaller than k=5, i.e. the rows a linkage attacker could single
    out by joining on public attributes. The table's k-anonymity level
    is MIN(group_size); the fix loop is coarsening a QI column
    (wider bands, dropped segment) until no class is small.

    Plan: ONE partial-aggregable groupBy on the QI tuple + a size
    filter — identical shape at 100 TB (the QI-class count, not the
    row count, bounds the agg output). The balance band is FLOOR over
    a DOUBLE cast, pinned identically in both engines."""
    qi = T(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal").cast("double") / F.lit(1000.0))
        .cast("long")
        .alias("bal_band"),
    )
    return (
        qi.groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < 5)
        .orderBy("group_size", "c_nationkey", "c_mktsegment", "bal_band")
    )


_X6_L = 3

_X6_ORACLE = (
    # QI = (nation, balance band); sensitive attribute = market segment
    "WITH qi AS (SELECT c_nationkey, "
    "CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT) AS bal_band, "
    "c_mktsegment FROM customer), "
    "grp AS (SELECT c_nationkey, bal_band, "
    "CAST(COUNT(*) AS BIGINT) AS group_size, "
    "CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive "
    "FROM qi GROUP BY 1, 2) "
    f"SELECT c_nationkey, bal_band, group_size, n_sensitive "
    f"FROM grp WHERE n_sensitive < {_X6_L} "
    "ORDER BY n_sensitive, group_size, c_nationkey, bal_band"
)


@register(
    "x6_l_diversity",
    oracle=_X6_ORACLE,
    tags=("X6", "X5", "privacy", "quality"),
)
def x6_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: l-diversity audit — x5's k-anonymity catches SMALL
    quasi-identifier classes; this catches HOMOGENEOUS ones: a class
    can be large (k-anonymous) yet reveal its members' sensitive
    attribute because everyone in it shares one value (Machanavajjhala
    et al., "l-Diversity", ICDE'06). QI = (nation, $1000 balance
    band); sensitive = market segment; every class with fewer than
    l=3 distinct sensitive values is surfaced. The release fix loop
    pairs with x5's: coarsen QI columns until both audits clear.

    Plan: one groupBy on the QI tuple with a partial-aggregable count
    + distinct-count — the QI-class count bounds the output, identical
    shape at 100 TB (swap COUNT(DISTINCT) for approx_count_distinct
    when the sensitive domain is large; here it is 5 segments)."""
    qi = T(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal").cast("double") / F.lit(1000.0))
        .cast("long")
        .alias("bal_band"),
        "c_mktsegment",
    )
    return (
        qi.groupBy("c_nationkey", "bal_band")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("c_mktsegment").alias("n_sensitive"),
        )
        .where(F.col("n_sensitive") < _X6_L)
        .orderBy("n_sensitive", "group_size", "c_nationkey", "bal_band")
    )
