#!/usr/bin/env python
"""Oracle-only zero-row audit — the vacuous-green guard, standalone.

Counts every registry oracle's result rows in DuckDB (no Spark session —
seconds, not minutes) and flags empty ones.  A 0-row Spark result matching
a 0-row oracle is "green" but proves nothing about the operator; round 6's
audit caught op_churn_hazard's first censoring horizon producing zero
deaths at every SF.  The two disjoint-filter join-shape stress entries are
intentionally empty (their CBO-facing emptiness IS the semantics).

Usage:
    python scripts/zero_row_audit.py [sf_dir]   # default /root/testdata/sf0.01
Exit 1 if any non-allowlisted oracle is empty.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from qpmodel_spark import catalog, registry  # noqa: E402

EMPTY_OK = {"job_dim_alias_disjoint_filters", "job_semi_anti_same_fact"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for name in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{catalog.table_path(sf_dir, name)}')"
        )
    bad, errs = [], []
    for name, spec in registry.all_specs().items():
        try:
            n = con.execute(f"SELECT count(*) FROM ({spec.oracle})").fetchone()[0]
        except Exception as e:  # noqa: BLE001 - report, don't die mid-audit
            errs.append((name, str(e)[:120]))
            continue
        if n == 0 and name not in EMPTY_OK:
            bad.append(name)
    print(f"{len(registry.all_specs())} oracles audited at {sf_dir}")
    if errs:
        print("oracle errors:", errs)
    if bad:
        print("VACUOUS (0-row) oracles:", bad)
    raise SystemExit(1 if (bad or errs) else 0)


if __name__ == "__main__":
    main()
