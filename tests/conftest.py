"""Shared pytest fixtures: one SparkSession per test run + DuckDB oracle.

The oracle comparison mirrors the driver's: run the registered Spark query
and its oracle SQL on the same parquet, sort columns by name, compare as
multisets with float tolerance.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from qpmodel_spark import catalog
from qpmodel_spark.session import get_spark

SF_DIR = os.environ.get("QPSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("qpmodel_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{catalog.table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize signed zero: Spark's round() emits +0.0 where
        # DuckDB emits -0.0 for tiny negatives; they compare == but
        # str-sort differently, desyncing the positional row compare
        return round(v, 6) + 0.0
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    return v


def normalize_rows(cols, rows):
    """Sort columns by name, normalize cells, return sorted multiset."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda tup: tuple((x is None, str(x)) for x in tup))


def assert_matches_oracle(spark, duck, spec, sf_dir=SF_DIR):
    """Run spec.spark_fn and spec.oracle, compare order-insensitively."""
    sdf = spec.spark_fn(spark, sf_dir)
    srows = normalize_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = duck.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = normalize_rows(ocols, res.fetchall())
    assert sorted(c.lower() for c in sdf.columns) == sorted(c.lower() for c in ocols), (
        f"{spec.name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{spec.name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    assert not mismatches, f"{spec.name}: first mismatches {mismatches[:3]}"
