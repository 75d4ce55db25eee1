#!/usr/bin/env python
"""Per-entry optimization profiler (round 13 tooling).

For each named registry entry: one untimed warm-up (codegen, footer reads),
then N timed noop-sink reps — prints min/median, Spark job count and stage
count per steady-state rep, and optionally writes `.explain("formatted")`
to plans/r13/<name>_<tag>.txt.

Usage:
    python scripts/opt_profile.py [--reps 5] [--plans TAG] name [name ...]

Mirrors bench.py methodology (noop sink, steady-state min) so numbers are
comparable; job/stage counts come from the status tracker via a per-rep
job group.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qpmodel_spark import registry  # noqa: E402
from qpmodel_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plans", default=None, help="write plans/<round>/<name>_<TAG>.txt")
    ap.add_argument("--plans-round", default="r14", help="plans subdir (default r14)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("qpmodel_spark_opt_profile")
    sc = spark.sparkContext
    specs = [registry.get(n) for n in args.names]

    # mirror bench.py: warm the Python/Arrow worker pool once
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.mode("overwrite").format("noop").save()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", args.plans_round)
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    for spec in specs:
        # untimed warm-up
        df = spec.spark_fn(spark, args.sf_dir)
        df.write.mode("overwrite").format("noop").save()
        if args.plans:
            p = os.path.join(plans_dir, f"{spec.name}_{args.plans}.txt")
            with open(p, "w") as fh:
                fh.write(spec.spark_fn(spark, args.sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        reps = []
        jobs = stages = 0
        for i in range(args.reps):
            group = f"opt_{spec.name}_{i}"
            sc.setJobGroup(group, spec.name)
            t0 = time.perf_counter()
            spec.spark_fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            reps.append(time.perf_counter() - t0)
            if i == args.reps - 1:
                tracker = sc.statusTracker()
                ids = tracker.getJobIdsForGroup(group)
                jobs = len(ids)
                stages = sum(
                    len(tracker.getJobInfo(j).stageIds)
                    for j in ids
                    if tracker.getJobInfo(j) is not None
                )
            sc.setJobGroup("", "")
        reps.sort()
        print(
            f"{spec.name:36s} min={reps[0]:7.3f} med={reps[len(reps)//2]:7.3f} "
            f"max={reps[-1]:7.3f} jobs={jobs} stages={stages}"
        )


if __name__ == "__main__":
    main()
