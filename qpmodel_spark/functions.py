"""Scalar-function shims with reference-exact semantics.

The reference's scalar library (ExprFunc.cs:111-401) mostly maps 1:1 onto
``pyspark.sql.functions``; the shims below cover the places where the
*semantics* differ (SURVEY §2.8), so a query ported from the reference
behaves identically:

- ``qp_substring(s, start, end)`` — reference substring is 1-based with an
  INCLUSIVE end (ExprFunc.cs:212-237); Spark's is (start, length).
- ``qp_coalesce(a, b)`` — reference coalesce is strictly 2-arg
  (ExprFunc.cs:338-358); Spark's is n-ary (superset — shim provided for
  signature parity).
- ``qp_date(s)`` — reference date() parses a string to datetime
  (ExprFunc.cs:374-386) → to_timestamp.
- ``qp_hash(x)`` — reference hash() is the CLR GetHashCode
  (ExprFunc.cs:388-401); engine-portable replacement is xxhash64 (stable
  across runs/machines, unlike GetHashCode — a strict improvement).
- ``qp_year``, ``qp_repeat``, ``qp_round``, ``qp_abs``, ``qp_upper`` — same
  semantics as Spark built-ins; exported for a complete reference surface.

All shims are Column-in/Column-out (JVM-side, codegen'd — no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qp_substring(s: Column | str, start: int, end: int) -> Column:
    """1-based, end-INCLUSIVE substring (reference ExprFunc.cs:212-237)."""
    col = F.col(s) if isinstance(s, str) else s
    return F.substring(col, start, end - start + 1)


def qp_coalesce(a: Column, b: Column) -> Column:
    """2-arg coalesce (reference arity — ExprFunc.cs:338-358)."""
    return F.coalesce(a, b)


def qp_date(s: Column | str) -> Column:
    """date('yyyy-mm-dd') string → timestamp (reference ExprFunc.cs:374-386)."""
    col = F.col(s) if isinstance(s, str) else s
    return F.to_timestamp(col)


def qp_hash(*cols: Column | str) -> Column:
    """Stable 64-bit hash (replaces the reference's CLR GetHashCode)."""
    return F.xxhash64(*cols)


qp_year = F.year
qp_repeat = F.repeat
qp_round = F.round
qp_abs = F.abs
qp_upper = F.upper
