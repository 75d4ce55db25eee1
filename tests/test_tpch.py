"""Oracle-verified TPC-H-style suite (every registered q* query)."""

from __future__ import annotations

import pytest

from qpmodel_spark import registry
from tests.conftest import assert_matches_oracle

TPCH = [n for n in registry.all_specs() if n.startswith("q") and n[1:].isdigit()]


@pytest.mark.parametrize("name", TPCH)
def test_tpch_query_matches_oracle(spark, duck, name):
    spec = registry.get(name)
    assert spec.oracle, f"{name} has no oracle"
    assert_matches_oracle(spark, duck, spec)
