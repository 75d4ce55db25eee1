"""Deterministic corpus sampling — training-pipeline operators.

Sampling a 100 TB corpus has two hard requirements the naive ``rand()``
approach fails: reproducibility (re-running the pipeline must select the
same rows — rand() is per-task-attempt nondeterministic, so a retried
partition silently changes the sample) and obliviousness to partitioning
(the decision must depend only on the row, not on scan order).  Both ops
here derive the decision from row content, so they are exactly
reproducible, partition-local where possible, and oracle-checkable —
DuckDB runs the same selection and the driver hash-compares.

Complements rel_sample_* (TABLESAMPLE parity with the reference,
PhysicSampleScan) with the stratified/deterministic forms a data-curation
pipeline actually uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qpmodel_spark.queries._util import t
from qpmodel_spark.registry import register

# rate 0.1 ≙ md5-prefix threshold: first 4 hex digits < 0x1999 (6553/65536).
_HASH_THRESHOLD = "1999"

_HASH_RATE_ORACLE = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_HASH_THRESHOLD}'
"""


@register("pipeline_sample_hash_rate", tags=("pipeline", "sampling"), oracle=_HASH_RATE_ORACLE)
def pipeline_sample_hash_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample, deterministic by content hash.

    ``md5(doc_id)`` prefix-compared against a hex threshold: a pure
    per-row predicate — no shuffle, no state, no RNG.  At 100 TB this
    pushes into the scan as a cheap filter, survives task retries and
    repartitioning bit-identically, and composes (sampling twice with
    nested thresholds yields nested samples).  MD5 (not xxhash64) because
    the selection must be engine-portable — the oracle runs the identical
    predicate in DuckDB.
    """
    docs = t(spark, sf_dir, "documents")
    return docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < _HASH_THRESHOLD
    ).select("doc_id", "lang", "n_chars")


_STRATIFIED_ORACLE = """
SELECT doc_id, lang
FROM (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents)
WHERE (rn - 1) % 10 = 0
"""


@register("pipeline_sample_stratified", tags=("pipeline", "sampling"), oracle=_STRATIFIED_ORACLE)
def pipeline_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-10 sample per language stratum.

    Equal sampling pressure per stratum regardless of stratum skew (a 90%%
    English corpus still yields 10%% of each minority language).  One
    shuffle by the stratum key + a per-stratum sort — at 100 TB prefer
    :func:`pipeline_sample_hash_rate` per stratum when a total order is
    not required; systematic sampling is the form the reference's
    PhysicSampleScan calls 'systematic' and is exactly
    oracle-reproducible.
    """
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where((F.col("rn") - 1) % 10 == 0)
        .select("doc_id", "lang")
    )
