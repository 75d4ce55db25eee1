"""Oracle-verified relational operator coverage (rel_* registry entries)."""

from __future__ import annotations

import pytest

from qpmodel_spark import registry
from tests.conftest import assert_matches_oracle

REL = [
    n for n, s in registry.all_specs().items()
    if n.startswith(("rel_", "ds_", "job_")) and s.oracle
]
NO_ORACLE = [
    n for n, s in registry.all_specs().items()
    if n.startswith(("rel_", "ds_", "job_")) and not s.oracle
]


@pytest.mark.parametrize("name", REL)
def test_relational_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, registry.get(name))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_relational_rows_only(spark, name):
    from tests.conftest import SF_DIR

    df = registry.get(name).spark_fn(spark, SF_DIR)
    assert df.count() >= 0


def test_scalar_subquery_multirow_errors(spark):
    """Reference: ScalarSubqueryExpr errors when the subquery returns >1 row
    (ExprSubquery.cs:206-240).  Spark enforces the same at runtime."""
    from qpmodel_spark.catalog import register_views
    from tests.conftest import SF_DIR

    register_views(spark, SF_DIR)
    df = spark.sql("SELECT (SELECT o_orderkey FROM orders) AS x")
    with pytest.raises(Exception, match="[Mm]ore than one row"):
        df.collect()
