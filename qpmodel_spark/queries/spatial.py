"""Spatial-lite analytics: grid-bucketed distance join + density map.

No geo columns exist in the testdata, so points derive deterministically
from customer keys as INTEGER centi-degree coordinates — which makes every
distance an exact int64 (dx² + dy²) and the whole family engine-portable
with zero trig (no sin/cos libm parity risk; a haversine variant would
quantize the same way the ln()-based entries do).

The scale story is the classic spatial-join discipline: bucket points
into R-sized grid cells, generate candidates only from the 3×3 cell
neighborhood of each query (a 9-row explode per query — never an
all-pairs join), verify with the exact integer distance.  At 100 TB the
points table shuffles ONCE on cell id; density skew (a popular city) is
bounded per cell and AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qpmodel_spark.queries._util import t
from qpmodel_spark.registry import register

_R = 500           # radius in coordinate units; also the grid cell size
_NQ = 10           # query points: c_custkey < _NQ

_POINTS_DUCK = """
  SELECT c_custkey AS pid,
         (c_custkey * 7919) % 36000 AS x,
         (c_custkey * 104729) % 18000 AS y
  FROM customer
"""

_GRID_JOIN_ORACLE = f"""
WITH p AS ({_POINTS_DUCK}),
q AS (SELECT pid AS qid, x AS qx, y AS qy FROM p WHERE pid < {_NQ})
SELECT q.qid, p.pid,
       CAST((p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy) AS BIGINT)
         AS dist2
FROM q JOIN p ON p.pid <> q.qid
WHERE (p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy) <= {_R * _R}
"""


@register("op_spatial_grid_join", tags=("spatial", "custom-op"), oracle=_GRID_JOIN_ORACLE)
def op_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search via grid bucketing: points within R of each query point.

    Cells are R-sized, so every point within R of a query lies in the 3×3
    cell neighborhood — candidates come from an EQUI-join on cell id
    (query side exploded ×9), then the exact integer distance decides.
    The oracle states the semantics with no bucketing at all (all-pairs at
    driver scale), so the pruning is proven lossless by value equality —
    the same oracle-witness pattern as the dedup blocking entries.
    """
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * 7919) % 36000).alias("x"),
        ((F.col("c_custkey") * 104729) % 18000).alias("y"),
    )
    p = c.withColumn("cx", F.expr(f"x div {_R}")).withColumn("cy", F.expr(f"y div {_R}"))
    q = (
        p.where(F.col("pid") < _NQ)
        .select(
            F.col("pid").alias("qid"),
            F.col("x").alias("qx"),
            F.col("y").alias("qy"),
            F.col("cx").alias("qcx"),
            F.col("cy").alias("qcy"),
        )
        .withColumn("dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            "qid", "qx", "qy",
            (F.col("qcx") + F.col("dx")).alias("cx"),
            (F.col("qcy") + F.col("dy")).alias("cy"),
        )
    )
    dist2 = (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx")) + (
        F.col("y") - F.col("qy")
    ) * (F.col("y") - F.col("qy"))
    return (
        q.join(p, ["cx", "cy"])
        .where(F.col("pid") != F.col("qid"))
        .withColumn("dist2", dist2.cast("bigint"))
        .where(F.col("dist2") <= _R * _R)
        .select("qid", "pid", "dist2")
    )


_DENSITY_ORACLE = f"""
WITH p AS ({_POINTS_DUCK})
SELECT CAST(x // {_R} AS BIGINT) AS cx, CAST(y // {_R} AS BIGINT) AS cy,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(min(pid) AS BIGINT) AS min_pid
FROM p GROUP BY 1, 2
"""


@register("op_spatial_density", tags=("spatial",), oracle=_DENSITY_ORACLE)
def op_spatial_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid density map: point count per R-sized cell.

    The heatmap/hotspot primitive and the diagnostic that sizes the grid
    for op_spatial_grid_join (a cell whose count explodes gets a finer
    grid or AQE skew-split).  One cell-keyed aggregate at scan speed.
    """
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * 7919) % 36000).alias("x"),
        ((F.col("c_custkey") * 104729) % 18000).alias("y"),
    )
    return (
        c.groupBy(
            F.expr(f"CAST(x div {_R} AS BIGINT)").alias("cx"),
            F.expr(f"CAST(y div {_R} AS BIGINT)").alias("cy"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.min("pid").cast("bigint").alias("min_pid"),
        )
    )


# --------------------------------------------------------------------------
# Grid k-nearest-neighbors — exact top-5 per query point via the same
# 3×3-cell candidate discipline as op_spatial_grid_join, with the cell
# size as the exactness certificate: every point within KC of a query
# lies in its 3×3 neighborhood, so IF the candidate 5th-nearest sits at
# distance ≤ KC the candidate top-5 is provably the GLOBAL top-5 (any
# point outside the neighborhood is farther than KC).  KC = 4500 covers
# the measured worst 5th-NN across every driver SF (3,954 at sf0.001,
# shrinking as density grows — at production density the cell shrinks
# with it; the knob is the op_spatial_density histogram).  The oracle is
# the UNBUCKETED all-pairs kNN, so value equality proves the pruning
# lossless; the in_bound flag self-certifies the geometry argument.
#
# Scale: ONE cell-keyed equi-join (query side ×9), per-query top-5 via
# window rank over candidate rows only.  Deterministic (dist2, pid)
# tiebreak on both engines.
_KC = 4500
_KNN_K = 5

_KNN_ORACLE = f"""
WITH p AS ({_POINTS_DUCK}),
q AS (SELECT pid AS qid, x AS qx, y AS qy FROM p WHERE pid < {_NQ}),
d AS (
  SELECT qid, pid,
         CAST((p.x - qx) * (p.x - qx) + (p.y - qy) * (p.y - qy) AS BIGINT)
           AS dist2,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY (p.x - qx) * (p.x - qx) + (p.y - qy) * (p.y - qy), p.pid
         ) AS rnk
  FROM q JOIN p ON p.pid <> q.qid
)
SELECT qid, CAST(rnk AS BIGINT) AS rnk, pid, dist2,
       dist2 <= {_KC * _KC} AS in_bound
FROM d WHERE rnk <= {_KNN_K}
"""


@register("op_spatial_knn", tags=("spatial", "custom-op"), oracle=_KNN_ORACLE)
def op_spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grid-pruned kNN: per-query top-5 from the 3×3 KC-cell
    neighborhood, proven lossless against the all-pairs oracle (block
    comment)."""
    from pyspark.sql import Window

    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * 7919) % 36000).alias("x"),
        ((F.col("c_custkey") * 104729) % 18000).alias("y"),
    )
    p = c.withColumn("cx", F.expr(f"x div {_KC}")).withColumn(
        "cy", F.expr(f"y div {_KC}")
    )
    q = (
        p.where(F.col("pid") < _NQ)
        .select(
            F.col("pid").alias("qid"),
            F.col("x").alias("qx"),
            F.col("y").alias("qy"),
            F.col("cx").alias("qcx"),
            F.col("cy").alias("qcy"),
        )
        .withColumn("dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            "qid", "qx", "qy",
            (F.col("qcx") + F.col("dx")).alias("cx"),
            (F.col("qcy") + F.col("dy")).alias("cy"),
        )
    )
    dist2 = (
        (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
        + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy"))
    ).cast("bigint")
    cand = (
        q.join(p, ["cx", "cy"])
        .where(F.col("pid") != F.col("qid"))
        .withColumn("dist2", dist2)
    )
    wr = Window.partitionBy("qid").orderBy("dist2", "pid")
    return (
        cand.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .where(F.col("rnk") <= _KNN_K)
        .select(
            "qid", "rnk", "pid", "dist2",
            (F.col("dist2") <= _KC * _KC).alias("in_bound"),
        )
    )
