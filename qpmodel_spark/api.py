"""DataSet-style DataFrame API — the reference's second entry point.

Reference (stmt.cs:957-1049):

    SQLContext.Read("a").filter("a1>1").join(b, "b2=a2").select("a1").show();

Here the same chain delegates to Spark's DataFrame API — ``expr()`` strings
bind through Catalyst's analyzer instead of the reference's hand-built
binder (SURVEY §1.3), and every step stays a lazy logical plan.

Also hosts the one genuinely custom CTE piece: ``shared_cte`` — the
reference materializes a CTE referenced ≥2 times via CteProducer
(subquery.cs:871-1021, El-Helw et al. VLDB'15); Catalyst always inlines, so
multi-referenced expensive CTEs recompute.  ``shared_cte`` persists the
DataFrame at MEMORY_AND_DISK for the scope of the query and unpersists
after — correct at any scale (spills, partition-local).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from qpmodel_spark import catalog


class QpDataset:
    """Thin chainable wrapper; every method is lazy plan construction."""

    def __init__(self, df: DataFrame):
        self.df = df

    def filter(self, cond: str) -> "QpDataset":
        return QpDataset(self.df.where(F.expr(cond)))

    def join(self, other: "QpDataset | DataFrame", cond: str, how: str = "inner") -> "QpDataset":
        right = other.df if isinstance(other, QpDataset) else other
        return QpDataset(self.df.join(right, on=F.expr(cond), how=how))

    def select(self, *exprs: str) -> "QpDataset":
        return QpDataset(self.df.selectExpr(*exprs))

    def groupby(self, *keys: str) -> "QpGroupedDataset":
        return QpGroupedDataset(self.df, list(keys))

    def orderby(self, *exprs: str) -> "QpDataset":
        return QpDataset(self.df.orderBy(*[F.expr(e) for e in exprs]))

    def limit(self, n: int) -> "QpDataset":
        return QpDataset(self.df.limit(n))

    def distinct(self) -> "QpDataset":
        return QpDataset(self.df.distinct())

    def union(self, other: "QpDataset") -> "QpDataset":
        return QpDataset(self.df.unionByName(other.df))

    def show(self, n: int = 20) -> None:
        self.df.show(n)

    def collect(self):
        return self.df.collect()

    def explain(self, mode: str = "formatted") -> str:
        from qpmodel_spark.ddl import explain_string

        return explain_string(self.df, mode)


class QpGroupedDataset:
    def __init__(self, df: DataFrame, keys: list[str]):
        self.df = df
        self.keys = keys

    def agg(self, *exprs: str) -> QpDataset:
        gdf = self.df.groupBy(*[F.expr(k) for k in self.keys])
        return QpDataset(gdf.agg(*[F.expr(e) for e in exprs]))


class QpContext:
    """≙ reference SQLContext: table reads, SQL, function registration."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir
        if sf_dir:
            catalog.register_views(spark, sf_dir)

    def read(self, table: str) -> QpDataset:
        if self.sf_dir:
            return QpDataset(catalog.load(self.spark, self.sf_dir, table))
        return QpDataset(self.spark.table(table))

    def sql(self, text: str) -> QpDataset:
        return QpDataset(self.spark.sql(text))

    def register_function(self, name: str, fn: Callable, return_type: str = "double") -> None:
        """≙ SQLContext.Register<T..> (stmt.cs:1036-1049): scalar UDF.

        Row-at-a-time Python UDF — correct but the slow path; prefer
        ``register_pandas_function`` for anything in a hot loop.
        """
        self.spark.udf.register(name, fn, return_type)

    def register_pandas_function(self, name: str, fn: Callable, return_type: str = "double") -> None:
        """Vectorized (Arrow) UDF registration — the scale path."""
        self.spark.udf.register(name, F.pandas_udf(fn, return_type))

    def register_grouped_agg(self, name: str, fn: Callable, return_type: str = "double") -> None:
        """Custom aggregate (UDAF) — absent in the reference (its aggregate
        set is fixed, SURVEY §2.14).  A GROUPED_AGG pandas UDF receives each
        group's column as a pandas Series and returns one scalar; usable in
        SQL GROUP BY and DataFrame .agg().  Note: no partial aggregation —
        each group's values ship to one reducer, so keep groups bounded.
        """
        udaf = F.pandas_udf(fn, return_type, F.PandasUDFType.GROUPED_AGG)
        self.spark.udf.register(name, udaf)


@contextmanager
def shared_cte(df: DataFrame) -> Iterator[DataFrame]:
    """Materialize a multi-referenced CTE once (reference: CteProducer)."""
    df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        yield df
    finally:
        df.unpersist()
