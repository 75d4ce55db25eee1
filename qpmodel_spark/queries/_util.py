"""Shared helpers for query implementations.

Numeric-parity discipline (SURVEY.md §7 watch list): money columns are IEEE
doubles with ≤6 significant decimals per row (prices 2dp × discounts 2dp ×
tax 2dp).  A double SUM is order-dependent, so Spark and DuckDB can disagree
in the last bits and round() can land on different sides of a .005 boundary.
Fix: cast each row to DECIMAL(30,6) first — the per-row cast is deterministic
and engine-identical (values sit within 1e-10 of the 6dp grid), and decimal
sums are exact and order-independent — then round.  The oracle SQL uses the
same construction.  At scale this is one extra cast inside the partial
aggregate; it does not add a shuffle or break codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from qpmodel_spark import catalog

DEC = "decimal(30,6)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a catalog table (lazy parquet scan — pushdown/pruning apply)."""
    return catalog.load(spark, sf_dir, name)


def dsum(c: Column) -> Column:
    """Order-independent exact sum: per-row cast to decimal, then SUM."""
    return F.sum(c.cast(DEC))


def msum(c: Column, nd: int = 2) -> Column:
    """Money sum: exact decimal sum → round(nd) → double."""
    return F.round(dsum(c), nd).cast("double")


def davg(c: Column, nd: int = 4) -> Column:
    """Deterministic average: exact decimal sum → double ÷ count, rounded.

    Rounding is ``floor(q·10^nd + 0.5)/10^nd`` rather than ``round()``:
    when the true quotient sits exactly on a rounding boundary (an avg of
    2dp money over a small count easily lands on .xxxx5), Spark's round()
    rounds the *shortest decimal repr* of the double (half-up) while
    DuckDB's rounds the *binary* value — they disagree by 1 in the last
    digit.  The floor form is pure IEEE arithmetic on an identical input
    double, so both engines produce the same bits.  Half-up == half-away
    for the non-negative measures this is used on.
    """
    q = dsum(c).cast("double") / F.count(c)
    scale = float(10**nd)
    return F.floor(q * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def o_msum(expr: str, nd: int = 2) -> str:
    """Oracle-SQL twin of :func:`msum`."""
    return f"CAST(round(sum(CAST(({expr}) AS DECIMAL(30,6))), {nd}) AS DOUBLE)"


def o_davg(expr: str, nd: int = 4) -> str:
    """Oracle-SQL twin of :func:`davg` (same floor-based rounding)."""
    scale = 10**nd
    return (
        f"floor((CAST(sum(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE)"
        f" / count({expr})) * {scale}.0 + 0.5) / {scale}.0"
    )


def o_dsum_dbl(expr: str) -> str:
    """Oracle-SQL exact sum surfaced as double (for ratios of sums)."""
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE)"


def dsum_dbl(c: Column) -> Column:
    return dsum(c).cast("double")


def revenue() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


REVENUE_SQL = "l_extendedprice * (1 - l_discount)"
