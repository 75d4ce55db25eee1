"""Full driver-contract simulation — run me before every round commit.

Replicates the round driver exactly (see .claude/skills/verify/SKILL.md):
a FRESH plain SparkSession without qpmodel_spark.session confs (pinned to a
non-UTC zone to prove the runtime conf pins in catalog.load), DuckDB views
over the same parquet, every `queries()` entry vs its `oracle_sql()` entry,
columns sorted by name, multiset compare with floats rounded to 6dp.
Flags vacuous (0-row) passes. Oracle-less entries get the driver's weaker
rows-only check (runs + reports row count).

Usage:  python scripts/driver_sim.py [sf_dir] [name_prefix ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from qpmodel_spark import catalog
    from tests.conftest import normalize_rows

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "Asia/Tokyo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for name in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{catalog.table_path(SF_DIR, name)}')"
        )

    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows OK", flush=True)

    qs, oracles = e.queries(), e.oracle_sql()
    fails, vacuous = [], []
    t_all = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        if ONLY and not any(name.startswith(p) for p in ONLY):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = normalize_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
            if name not in oracles:
                status = f"rows-only n={len(srows)}"
                if not srows:
                    vacuous.append(name)
            else:
                res = con.execute(oracles[name])
                ocols = [d[0] for d in res.description]
                orows = normalize_rows(ocols, res.fetchall())
                if sorted(c.lower() for c in sdf.columns) != sorted(
                    c.lower() for c in ocols
                ):
                    status = f"FAIL cols spark={sorted(sdf.columns)} oracle={sorted(ocols)}"
                    fails.append(name)
                elif len(srows) != len(orows):
                    status = f"FAIL rows spark={len(srows)} oracle={len(orows)}"
                    fails.append(name)
                elif srows != orows:
                    bad = [
                        (a, b) for a, b in zip(srows, orows) if a != b
                    ][:2]
                    status = f"FAIL values {bad}"
                    fails.append(name)
                else:
                    status = f"ok n={len(srows)}"
                    if not srows:
                        vacuous.append(name)
        except Exception:
            status = "ERROR " + traceback.format_exc(limit=3).replace("\n", " | ")
            fails.append(name)
        print(f"[{i + 1}/{len(qs)}] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)

    print(f"\ntotal {time.time() - t_all:.0f}s  fails={len(fails)} {fails}")
    if vacuous:
        print(f"VACUOUS (0-row pass — check selectivity): {vacuous}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
