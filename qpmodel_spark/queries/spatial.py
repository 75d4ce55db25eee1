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
