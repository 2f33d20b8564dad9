"""Skew-safe join helper — the manual salting pattern for the cases
AQE's runtime skew-join split cannot reach (stream-stream and
stream-static joins, pre-AQE engines, and deliberately disabled AQE),
complementing `groupstats.salted_sum` (aggregation side) and the LSH
hot-bucket split (candidate-join side).

Method (public, standard): replicate the SMALL side ``salt_n`` times
(one copy per salt value) and give each BIG-side row one deterministic
salt; joining on (key, salt) spreads a hot key's rows over ``salt_n``
reducers instead of funneling them into one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on ``key`` with ``salt_n``-way salting.

    The big side's salt is ``pmod(xxhash64(<all columns>), salt_n)`` —
    deterministic (stable across runs/partitionings, per this repo's
    exactness contract) and row-dependent, so a hot key's DISTINCT
    rows spread evenly; exact duplicate rows share a salt (documented:
    dedup first if hot keys carry byte-identical duplicates). The
    small side is replicated ``salt_n``× via an exploded literal
    range — cost salt_n·|small|, the standard price of manual skew
    handling; keep the genuinely small side on the ``small`` argument.

    Correct for inner and left joins (every big row carries exactly
    one salt; every (key, salt) pair exists on the replicated small
    side, so match semantics are unchanged). Right/full joins would
    multiply unmatched small-side rows — rejected."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_big = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n))
    b = big.withColumn(SALT, salt_big.cast("int"))
    s = small.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))).alias("__e"),
    ).select(*small.columns, F.col("__e").cast("int").alias(SALT))
    return b.join(s, [key, SALT], how).drop(SALT)
