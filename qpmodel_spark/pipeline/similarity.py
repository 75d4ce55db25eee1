"""Similarity search over the ``embeddings`` table (array<float> column).

Three tiers:

- ``sim_topk_bruteforce`` — exact cosine top-k: broadcast the (small) query
  set against all candidates, rank per query.  The baseline and the oracle.
- ``sim_topk_ivf``        — partition-pruned top-k: candidates restricted to
  the query's coarse partition (the ``label`` column stands in for a kmeans
  cell id).  This is the IVF/probe=1 plan shape: at 100 TB the candidate
  scan drops by the partition fan-out and the join is an equi-join on the
  cell id, so Catalyst shuffles by cell instead of replicating the corpus.
- ``sim_ann_lsh``         — random-hyperplane LSH: 8 hash tables × 4-bit
  signatures (see the tuning note at _N_TABLES), candidates = bucket
  collisions in any table, exact rerank.  Approximate (recall asserted in
  tests) → rows-only driver check.
- ``sim_ann_kmeans_ivf``  — trained coarse quantizer (MLlib KMeans) +
  probe=1 cell search; rows-only, recall-tested.

All dot products are left-fold double arithmetic (bit-identical across
engines); ranking ties are broken by vec_id so top-k is deterministic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qpmodel_spark.queries._util import t
from qpmodel_spark.registry import register

K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors


def _with_norm(df: DataFrame) -> DataFrame:
    return df.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn(
        "nrm",
        F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)),
    )


def _cosine_topk(queries: DataFrame, cands: DataFrame, extra_on=None) -> DataFrame:
    q = queries.select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"),
        F.col("v").alias("qv"), F.col("nrm").alias("qn"),
    )
    c = cands.select("vec_id", "label", "v", "nrm")
    cond = q.qid != c.vec_id
    if extra_on is not None:
        cond = cond & extra_on(q, c)
    dot = F.aggregate(F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    scored = (
        F.broadcast(q).join(c, cond)
        .withColumn("cos_raw", dot / (F.col("qn") * F.col("nrm")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= K)
        .select("qid", "vec_id", "rnk", F.round("cos_raw", 4).alias("cos"))
    )


_BRUTE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings
), n AS (
  SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
), scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
           / (q.nrm * c.nrm) AS cos_raw
  FROM n q JOIN n c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
), ranked AS (
  SELECT qid, vec_id, cos_raw,
         row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT qid, vec_id, rnk, round(cos_raw, 4) AS cos FROM ranked WHERE rnk <= {K}
"""


@register("sim_topk_bruteforce", bench=True, tags=("similarity",), oracle=_BRUTE_ORACLE)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast queries × scan candidates × window rank."""
    e = _with_norm(t(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < N_QUERIES)
    return _cosine_topk(q, e)


_IVF_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings
), n AS (
  SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
), scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
           / (q.nrm * c.nrm) AS cos_raw
  FROM n q JOIN n c ON q.vec_id <> c.vec_id AND q.label = c.label
  WHERE q.vec_id < {N_QUERIES}
), ranked AS (
  SELECT qid, vec_id, cos_raw,
         row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT qid, vec_id, rnk, round(cos_raw, 4) AS cos FROM ranked WHERE rnk <= {K}
"""


@register("sim_topk_ivf", tags=("similarity", "ivf"), oracle=_IVF_ORACLE)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned top-k (IVF plan shape, probe=1 on the label cell)."""
    e = _with_norm(t(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < N_QUERIES)
    return _cosine_topk(q, e, extra_on=lambda qd, cd: qd.qlabel == cd.label)


# Deterministic random hyperplanes (seeded numpy, public API).
# 8 tables x 4-bit signatures: collision prob for a cos≈0.5 neighbor is
# (1-θ/π)^4 ≈ 0.19 per table → recall ≈ 1-(1-0.19)^8 ≈ 0.81.  Fewer bits
# per table = higher recall, more candidates — tune per corpus density.
_N_TABLES = 8
_PLANES_PER_TABLE = 4
_DIM = 64


def _planes() -> list[list[list[float]]]:
    rng = np.random.RandomState(42)
    return rng.normal(size=(_N_TABLES, _PLANES_PER_TABLE, _DIM)).tolist()


@register("sim_ann_lsh", tags=("similarity", "lsh"), oracle=None)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH + exact rerank.

    Signature per table = 8 sign bits of dot(v, plane).  Candidates share a
    bucket in ≥1 table — an equi-join on (table, signature), which shuffles
    by bucket instead of replicating candidates (the 100 TB path).  Exact
    cosine rerank keeps the output meaningful; recall vs brute force is
    asserted in tests (engine-specific plan → rows-only driver check).
    """
    e = _with_norm(t(spark, sf_dir, "embeddings"))
    planes = _planes()

    def sig_col(tbl: int):
        bits = []
        for p in range(_PLANES_PER_TABLE):
            plane = F.array(*[F.lit(float(x)) for x in planes[tbl][p]])
            dot = F.aggregate(
                F.zip_with("v", plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
            )
            bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for bcol in bits[1:]:
            out = out + bcol
        return out

    sigs = e.select(
        "vec_id", "label", "v", "nrm",
        F.explode(
            F.array(*[F.struct(F.lit(tb).alias("tbl"), sig_col(tb).alias("sig")) for tb in range(_N_TABLES)])
        ).alias("s"),
    ).select("vec_id", "label", "v", "nrm", "s.tbl", "s.sig")

    q = sigs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn"), "tbl", "sig"
    )
    cand = (
        F.broadcast(q).join(sigs, ["tbl", "sig"])
        .where(F.col("qid") != F.col("vec_id"))
        .select("qid", "qv", "qn", "vec_id", "v", "nrm")
        .distinct()
    )
    dot = F.aggregate(F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    w = Window.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    return (
        cand.withColumn("cos_raw", dot / (F.col("qn") * F.col("nrm")))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= K)
        .select("qid", "vec_id", "rnk", F.round("cos_raw", 4).alias("cos"))
    )


@register("sim_ann_kmeans_ivf", tags=("similarity", "ivf", "kmeans"), oracle=None)
def sim_ann_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a *trained* coarse quantizer (MLlib KMeans, seeded).

    The production IVF pipeline: train k centroids, assign every vector to
    its nearest cell, then search each query only in its own cell
    (probe=1).  Training is a bounded MLlib job; assignment is a map; the
    search join is an equi-join on cell id — O(corpus/k) candidates per
    query.  Seeded → deterministic per corpus, but the cell boundaries are
    model output, so this is a rows-only driver check; recall vs brute
    force is asserted in tests.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = _with_norm(t(spark, sf_dir, "embeddings"))
    feat = e.withColumn("features", array_to_vector("v"))
    km = KMeans(k=8, seed=42, featuresCol="features", predictionCol="cell")
    model = km.fit(feat)
    cells = model.transform(feat).select("vec_id", "label", "v", "nrm", "cell")
    q = cells.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), "cell",
    )
    dot = F.aggregate(F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    return (
        F.broadcast(q).join(cells, "cell")
        .where(F.col("qid") != F.col("vec_id"))
        .withColumn("cos_raw", dot / (F.col("qn") * F.col("nrm")))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= K)
        .select("qid", "vec_id", "rnk", F.round("cos_raw", 4).alias("cos"))
    )
