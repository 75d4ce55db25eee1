"""Skew mitigation helpers — salting for hot keys.

AQE's skew-join handling (on in session.py) splits oversized partitions at
runtime; salting is the plan-level tool when a single key is so hot that
even a split partition's *build side* is the problem, or for aggregations
(AQE does not salt aggregates).  Both helpers preserve exact semantics:

- ``salted_agg``: two-phase aggregate with an explicit salt — groupBy
  (key, salt) partial → groupBy(key) final.  Generalizes Spark's built-in
  partial aggregation to arbitrary mergeable aggregates when one key
  dominates a partition.
- ``salted_join``: replicate the small side N ways, scatter the big side's
  hot keys across N salts — the classic broadcast-averse skew join.

Salt assignment uses a deterministic hash of a row-unique column (never
rand(): retries/speculative tasks must land identical rows — a correctness
requirement at scale, not a style choice).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact sum/count per key via explicit two-phase salted aggregation.

    Returns (key, sum_<agg_col>, cnt).  The partial aggregate spreads a hot
    key over ``n_salts`` reducers; the final aggregate merges n_salts rows
    per key — O(keys × salts) instead of one reducer eating the hot key.
    """
    from qpmodel_spark.queries._util import _MICRO, _micro_parts

    # split-integer partials (see queries/_util.py): long sums commute
    # across the two phases, stay exact, and stay in whole-stage codegen
    # (a decimal(30,6) partial would fall back to interpreted BigDecimal)
    hi, lo = _micro_parts(F.col(agg_col))
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(hi).alias("_ph"),
        F.sum(lo).alias("_pl"),
        F.count("*").alias("_pc"),
    )
    total = (
        F.sum("_ph").cast("double") * _MICRO + F.sum("_pl").cast("double")
    ) / F.lit(float(_MICRO))
    return partial.groupBy(key).agg(
        (F.floor(total * 100 + F.lit(0.5)) / 100).alias(f"sum_{agg_col}"),
        F.sum("_pc").alias("cnt"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side replicated.

    Equivalent to ``big.join(small, key)``; the shuffle key becomes
    (key, salt) so a hot key's rows land on n_salts reducers instead of one.
    Cost: small side × n_salts (bounded — the small side is small).
    """
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)))
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return big_s.join(small_r, [key, "_salt"]).drop("_salt")
