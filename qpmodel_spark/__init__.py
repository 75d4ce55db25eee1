"""qpmodel_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
zhouqingqing/qpmodel (see SURVEY.md), re-expressed Spark-first: the
SQL/DataFrame surface is declared against Spark's Catalyst optimizer and
Tungsten execution, not re-implemented.  Modules:

- ``session``   — SparkSession factory (AQE + CBO + UTC, scale-aware conf)
- ``catalog``   — parquet table registry over the driver testdata layout
- ``registry``  — central query registry: every supported operator/query is
                  registered with a Spark implementation and a DuckDB oracle
                  SQL string (the correctness contract)
- ``queries``   — TPC-H-style and operator-coverage queries
- ``pipeline``  — LLM-data-pipeline operators (dedup, similarity, text,
                  multimodal) designed for 100 TB scale
- ``streaming`` — tumble/hop/session windowing, batch + Structured Streaming
- ``api``       — qpmodel DataSet-style DataFrame API shim
- ``ddl``       — DDL/DML/utility statement surface (CREATE/INSERT/COPY/
                  ANALYZE/EXPLAIN)
- ``functions`` — scalar-function shims with reference semantics
"""

__version__ = "0.1.0"

from qpmodel_spark.session import get_spark  # noqa: F401
