#!/usr/bin/env python
"""Benchmark harness — runs the registry's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end via the noop sink (full plan runs, nothing
collects to the driver — the distributed-scale measurement, not a
driver-materialization one).

Stdout contract (judge r07 item #1): the driver tail-captures only ~2 KB of
stdout, and the r07 line (52 entries x times+spread, ~4.6 KB) outgrew it —
BENCH_r07.json has `parsed: null`.  The single stdout line is therefore kept
compact and BOUNDED: `value` is the total over the frozen 37-entry HEADLINE
set (the exact set BENCH_r06 parsed, so the round-over-round ratio is
computable from driver artifacts alone) and `queries` carries 2dp times for
those 37 names only (~1.2 KB).  The FULL per-query map — every benched
entry at 3dp, per-entry spread, and a median-of-5 second pass for any entry
whose 3-rep spread exceeded 3 (contention forensics, judge r07 item #6) —
is written to the committed side file BENCH_detail_r{N}.json instead.

Methodology notes (explains the r01 driver-vs-builder delta):
- JVM startup, parquet-footer reads, and first-query codegen are excluded:
  one untimed warm-up query runs before the timed loop.
- Totals are comparable only within one harness run.  The r01 driver run
  recorded ~1.6x the builder's in-session numbers uniformly across all 15
  queries — consistent with driver-host CPU contention and/or a smaller
  $SPARK_GRAFT_CPUS, not with any per-query plan difference (plan contracts
  are pinned load-independently in tests/test_plans.py).  Round-over-round
  driver totals (BENCH_r{N} vs BENCH_r{N-1}) are the meaningful comparison.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qpmodel_spark import registry  # noqa: E402
from qpmodel_spark.session import get_spark  # noqa: E402


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


# The 37 names BENCH_r06.json parsed — frozen so the stdout line stays
# bounded forever and `value` compares 1:1 against the last cleanly-parsed
# driver round.  New bench entries land in BENCH_detail only.
HEADLINE = (
    "q1", "q3", "q5", "q6", "q10", "q13", "q18", "q18_bucketed",
    "op_sessionize", "op_retention", "op_ohlc_bars", "op_dwell_time",
    "op_triangle_support2", "op_pagerank_support2", "op_ab_test_z",
    "op_sliding_distinct", "op_cms_heavy_hitters", "op_market_basket",
    "stream_tumble", "dedup_exact", "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh", "dedup_embedding_cosine", "sim_topk_bruteforce",
    "sim_range_search", "sim_knn_join", "sim_eval_rank_metrics",
    "text_quality", "pipeline_prep_compose", "pipeline_corpus_build",
    "text_bm25_search", "text_lm_score", "pipeline_mixture_sample",
    "pipeline_release_pass", "ds_q1_returns_above_avg",
    "ds_q3_brand_year_revenue", "job_chain9_two_regions",
)

# spread (max/min over interleaved reps) above this ⇒ the entry's minimum
# itself is suspect under burst contention: run a 5-rep second pass and
# record its median alongside, so a contaminated run is detectable from
# the artifact (judge r07 item #6)
SPREAD_RERUN_THRESHOLD = 3.0


# pre-flight 1-min loadavg above this ⇒ the host is already busy before we
# run a single query — stamp the whole run as contended (judge r09 item #2:
# three straight driver benches carried 5-37x spreads from external load;
# the artifact should label itself instead of relying on post-hoc forensics)
LOAD_CONTENDED_THRESHOLD = 2.0

# post-run 1-min loadavg above this ⇒ contention STARTED mid-run and
# inflated all reps uniformly (spread stays < 3, the r01/r02 signature).
# Calibration: the noop-sink bench's own steady self-load measured ~2.0
# post-run on an idle host (BENCH_detail_r10_clean) vs 4.0 on the
# contended run — 3.5 splits the two observed populations with margin.
# Named + emitted in the detail artifact so a JSON reader can reconstruct
# why a post-load-only contended flag fired (ADVICE r10).
LOAD_POST_CONTENDED_THRESHOLD = 3.5


# --- calibration anchor (judge r12 item #1) -------------------------------
# Two consecutive rounds excused headline deltas as "ambient host drift"
# with nothing in the artifact able to prove it.  A fixed CPU-bound,
# I/O-free, shuffle-free workload timed at the START and END of every
# bench run turns that narrative into arithmetic: the ratio of measured
# calibration time to a pinned clean-host reference decomposes any
# headline delta into host x engine.  Two gauges: a JVM one (32-slice
# chained-xxhash64 fold over spark.range — exercises the same codegen'd
# executor pool the queries run on; the only exchange is the 32-row
# partial-agg gather) and a pure-Python driver loop (catches driver-host
# contention a parallel JVM measure can average out).  MEDIANS on
# purpose, NOT mins: the queries take min to ride out bursts, but the
# calibration gauge must MEASURE sustained ambient load, not ride it
# out.  Correspondingly the factor corrects SUSTAINED drift; bursts
# remain the spread/healing machinery's job.
CALIB_JVM_ROWS = 1 << 29
CALIB_PY_ITERS = 2_000_000
# an 8-deep xxhash64 chain per row: enough arithmetic per row that the
# gauge measures compute throughput, not task-scheduling overhead (the
# single-hash form at 2^27 rows ran ~0.5s and jittered 1.5x rep-to-rep
# on an idle host; this form runs ~1.4s/rep with median-of-5 repeatable
# to ~±10%, measured at r13 close — deltas inside that envelope are
# gauge noise, not host drift)
_CALIB_EXPR = "id"
for _ in range(8):
    _CALIB_EXPR = f"xxhash64({_CALIB_EXPR})"
# clean-host reference (r13 close, 1-min loadavg 0.00, SPARK_GRAFT_CPUS=32,
# four consecutive median-of-5 gauges [1.392, 1.347, 1.352, 1.364] —
# 3.3% spread truly idle; the ±10% envelope above is what residual
# background load does to the gauge): the divisor that turns a measured
# jvm gauge into a host-speed factor.  The Python gauge read
# 0.231-0.233s on the same idle host (CALIB_PY_REF_SEC) — its ratio
# separates driver-host contention from executor-pool contention.
CALIB_REF_SEC = 1.358
CALIB_PY_REF_SEC = 0.232


def _calib_frame(spark):
    """The ONE gauge plan, shared by warm-up and timed reps — a warm-up
    compiling a different plan would leave the first timed rep paying
    whole-stage-codegen again (review r13).  pmod before the sum keeps
    the fold inside int64 under ANSI mode (sum of raw xxhash64
    overflows)."""
    from pyspark.sql import functions as F

    return (
        spark.range(0, CALIB_JVM_ROWS, 1, 32)
        .selectExpr(f"pmod({_CALIB_EXPR}, 1000003) h")
        .agg(F.sum("h"))
    )


def calib_jvm(spark) -> float:
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        _calib_frame(spark).write.mode("overwrite").format("noop").save()
        reps.append(time.perf_counter() - t0)
    return round(sorted(reps)[2], 3)


def calib_py() -> float:
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(CALIB_PY_ITERS):
            acc = (acc * 1103515245 + i) & 0x7FFFFFFFFFFFFFFF
        reps.append(time.perf_counter() - t0)
    return round(sorted(reps)[1], 3)


def host_load() -> dict:
    """Snapshot /proc/loadavg + cgroup/psi CPU pressure (best-effort)."""
    out: dict = {}
    try:
        with open("/proc/loadavg") as fh:
            out["loadavg"] = [float(x) for x in fh.read().split()[:3]]
    except (OSError, ValueError):
        pass
    # PSI "some avg10" = % of the last 10s in which ≥1 task stalled on CPU;
    # prefer the cgroup-local file (container view) over the host-wide one
    for path in ("/sys/fs/cgroup/cpu.pressure", "/proc/pressure/cpu"):
        try:
            with open(path) as fh:
                line = fh.readline()  # "some avg10=... avg60=... ..."
            out["cpu_pressure_some_avg10"] = float(
                dict(kv.split("=") for kv in line.split()[1:])["avg10"]
            )
            break
        except (OSError, ValueError, KeyError, IndexError):
            continue
    return out


def spread_of(v: list[float]) -> float:
    """max/min over a rep series — the burst-contention signature."""
    return round(max(v) / max(min(v), 1e-9), 2)


def effective_spread(spread: dict[str, float], spread_heal: dict[str, float]) -> dict[str, float]:
    """Per-entry spread with the healing pass folded in (judge r10 item #3).

    The 5-rep second pass re-measures exactly the burst-suspect entries;
    if it observes a tight series (the burst has passed — confirmed by the
    load re-check recorded alongside), the entry's steady-state claim is
    the HEALED spread, and the contended flag should not stay latched on
    the poisoned first series.  min(first, heal): a genuinely unstable
    entry stays wide in both series and keeps the flag up."""
    return {k: min(v, spread_heal.get(k, v)) for k, v in spread.items()}


def max_headline_spread_of(spread: dict[str, float], times: dict[str, float]) -> float:
    """Worst spread over headline entries with steady-state min >= 0.5s —
    sub-second entries jitter past 3x from scheduler noise alone
    (measured at sf0.01), while the r07-r09 pollution signature was 5-37x
    spreads on multi-second entries."""
    return max(
        (spread[k] for k in HEADLINE if k in spread and times.get(k, 0.0) >= 0.5),
        default=0.0,
    )


def is_contended(pre_load1: float, post_load1: float, max_spread: float) -> bool:
    """Self-labeling contention flag (judge r09 item #2): pre-flight load
    already above threshold, post-run load above the calibrated cutoff
    (contention that starts mid-run inflates all reps uniformly), or any
    qualifying headline entry's spread above the rerun threshold."""
    return bool(
        pre_load1 > LOAD_CONTENDED_THRESHOLD
        or post_load1 > LOAD_POST_CONTENDED_THRESHOLD
        or max_spread > SPREAD_RERUN_THRESHOLD
    )


def next_round() -> int:
    """Infer the in-progress round: driver artifacts BENCH_r{N}.json exist
    for completed rounds only, so we are in max+1 (env-overridable)."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for f in os.listdir(here)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
    ]
    return max(rounds, default=0) + 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_pre = host_load()  # before the JVM exists — external load only
    spark = get_spark("qpmodel_spark_bench")

    specs = [s for s in registry.all_specs().values() if s.bench]
    # warm the Python/Arrow worker pool (spark.python.worker.reuse keeps
    # them alive): otherwise the first Pandas-UDF query in the timed loop
    # pays ~1.5s of one-time worker spawn + BLAS init that no steady-state
    # query would see
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.mode("overwrite").format("noop").save()
    # one FULL untimed pass: every query pays its one-time whole-stage-codegen
    # compilation, parquet footer reads and any one-time fixture cost (e.g.
    # q18_bucketed's existence-guarded bucketed-table build) here, outside
    # the timed loop — so the timed reps measure only steady-state execution
    # for every entry, not just the first one
    for spec in specs:
        spec.spark_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    # calibration anchor: one untimed warm-up (codegen), then the START
    # gauge — the END gauge runs after the healing pass, so a mid-run
    # host-speed shift is visible as start-vs-end disagreement
    for _ in range(2):
        _calib_frame(spark).write.mode("overwrite").format("noop").save()
    calib = {"jvm_start_sec": calib_jvm(spark), "py_start_sec": calib_py()}

    # min of 3 executions per query: the first execution pays one-time
    # whole-stage-codegen compilation and is exposed to scheduler noise on a
    # shared host (r01/r02 driver runs showed 1.6-2.3x uniform inflation;
    # r4 measured single queries bouncing 0.6s↔10s between back-to-back runs
    # under external load spikes — min-of-3 rides them out); the min is the
    # steady-state per-query cost — the number that scales to a
    # long-running cluster, where plans compile once and run many times.
    # Reps are INTERLEAVED (full pass over all queries, three times) rather
    # than back-to-back: the observed contention comes in ~minute-long
    # bursts, long enough to poison every consecutive rep of one query but
    # not three passes separated by the rest of the suite.
    reps: dict[str, list[float]] = {}
    for _ in range(3):
        for spec in specs:
            t0 = time.perf_counter()
            spec.spark_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            reps.setdefault(spec.name, []).append(time.perf_counter() - t0)
    times = {k: round(min(v), 3) for k, v in reps.items()}
    # per-query spread (max/min over the 3 interleaved reps): > ~1.3 on many
    # entries flags host-contention bursts — read round-over-round deltas of
    # that size as jitter, not plan regressions (judge r05 item #4)
    spread = {k: spread_of(v) for k, v in reps.items()}

    # healing pass for burst-contaminated entries (judge r10 item #3): a
    # load re-check is snapshotted FIRST (so the artifact shows whether the
    # burst had passed), then 5 more interleaved reps per suspect entry —
    # median recorded, min folded in (more reps only tighten it), and the
    # healed spread feeds the contended flag via effective_spread so one
    # mid-run spike can't permanently taint the headline.
    noisy = sorted(k for k, v in spread.items() if v > SPREAD_RERUN_THRESHOLD)
    median5: dict[str, float] = {}
    spread_heal: dict[str, float] = {}
    load_heal: dict = {}
    if noisy:
        load_heal = host_load()
        by_name = {s.name: s for s in specs}
        reps2: dict[str, list[float]] = {k: [] for k in noisy}
        for _ in range(5):
            for name in noisy:
                t0 = time.perf_counter()
                by_name[name].spark_fn(spark, sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
                reps2[name].append(time.perf_counter() - t0)
        for name, v in reps2.items():
            median5[name] = round(sorted(v)[2], 3)
            times[name] = round(min(min(v), times[name]), 3)
            spread_heal[name] = spread_of(v)

    # post-run load is snapped BEFORE the end gauges: the flag exists to
    # catch EXTERNAL contention, and the end gauge is itself a deliberate
    # 32-thread CPU burn that drives 1-min loadavg past the threshold —
    # the first r13 clean run self-flagged contended exactly this way
    load_post = host_load()
    calib["jvm_end_sec"] = calib_jvm(spark)
    calib["py_end_sec"] = calib_py()
    calib["jvm_mean_sec"] = round(
        (calib["jvm_start_sec"] + calib["jvm_end_sec"]) / 2, 3
    )
    calib["ref_sec"] = CALIB_REF_SEC
    calib["py_ref_sec"] = CALIB_PY_REF_SEC
    # Host-speed factors, measured/reference (>1 = slower than the pinned
    # clean-host state).  The NORMALIZED HEADLINE divides by the START
    # factor, not the mean: the headline is min-of-interleaved-reps, and
    # the min lands in each query's fastest host window — which is the
    # start-gauge window (measured r13: after a sustained ~110s query
    # pass the JVM gauge reads +23% and the PURE-PYTHON gauge +18% on an
    # externally idle host, an after-load host-slowdown that decays over
    # minutes; four back-to-back gauges at true idle spread only 3.3%,
    # so the gauge's own load does not cause it).  Dividing a min-based
    # total by the run-MEAN factor would overcorrect — crediting the
    # engine for host slowdown the recorded minima never experienced.
    # Both factors are in the artifact; start-vs-end disagreement is the
    # drift witness the judge asked the anchor to provide.
    calib_factor = (
        round(calib["jvm_start_sec"] / CALIB_REF_SEC, 4)
        if CALIB_REF_SEC
        else None
    )
    calib["factor_start"] = calib_factor
    calib["factor_mean"] = (
        round(calib["jvm_mean_sec"] / CALIB_REF_SEC, 4)
        if CALIB_REF_SEC
        else None
    )
    calib["factor"] = calib_factor
    rnd = next_round()
    total_all = round(sum(times.values()), 3)
    # contention flag inputs (judge r09 item #2 + r10 item #3): the spread
    # component uses effective_spread — the healed series supersedes a
    # poisoned first series for the flag, while the raw `spread` map stays
    # in the artifact for forensics.  Carried in BOTH channels so the
    # trend line the driver sees flags its own noisy points.
    pre_load1 = (load_pre.get("loadavg") or [0.0])[0]
    eff_spread = effective_spread(spread, spread_heal)
    max_headline_spread = max_headline_spread_of(eff_spread, times)
    post_load1 = (load_post.get("loadavg") or [0.0])[0]
    contended = is_contended(pre_load1, post_load1, max_headline_spread)
    # Headline-set integrity (ADVICE r08): `value` must always sum exactly
    # the frozen 37 entries — if one is ever un-benched or renamed, a
    # silently-shrunken sum would read as a fake speedup.  Surface any gap
    # loudly in BOTH channels: an explicit field in the stdout line and the
    # detail file (so it's detectable from artifacts), on top of summing
    # only what exists.
    missing_headline = sorted(set(HEADLINE) - set(times))
    headline = {k: round(times[k], 2) for k in HEADLINE if k in times}
    total_headline = round(sum(times[k] for k in HEADLINE if k in times), 3)
    total_headline_norm = (
        round(total_headline / calib_factor, 3) if calib_factor else None
    )
    # Detail-file convention (judge r08 item #3): the driver's (often
    # contention-polluted) run and the builder's clean-host run must BOTH
    # survive in the working tree — r08's clean detail was overwritten by
    # the driver run.  The driver writes the plain BENCH_detail_r{N}.json;
    # a builder run sets SPARK_GRAFT_BENCH_TAG=clean and gets the
    # _clean-suffixed name.  run_utc inside the file disambiguates further.
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG", "").strip()
    suffix = f"_{tag}" if tag else ""
    detail_name = f"BENCH_detail_r{rnd:02d}{suffix}.json"
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name)
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "round": rnd,
                "sf": sf_from_dir(sf_dir),
                "n_queries": len(times),
                "total_all_queries": total_all,
                "total_headline": total_headline,
                "total_headline_calib_normalized": total_headline_norm,
                "calib": calib,
                "headline_names": list(HEADLINE),
                "missing_headline": missing_headline,
                "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "tag": tag or "driver",
                "times": times,
                "spread": spread,
                "spread_heal": spread_heal,
                "load_heal": load_heal,
                "median5": median5,
                "spread_rerun_threshold": SPREAD_RERUN_THRESHOLD,
                "load_pre": load_pre,
                "load_post": load_post,
                "load_contended_threshold": LOAD_CONTENDED_THRESHOLD,
                "load_post_contended_threshold": LOAD_POST_CONTENDED_THRESHOLD,
                "max_headline_spread": max_headline_spread,
                "contended": contended,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    print(
        json.dumps(
            {
                "metric": "headline37_total_wall",
                "value": total_headline,
                "unit": "sec",
                "queries": headline,
                "sf": sf_from_dir(sf_dir),
                "n_queries": len(times),
                "total_all_queries": total_all,
                "missing_headline": missing_headline,
                "contended": contended,
                "calib_start_sec": calib["jvm_start_sec"],
                "calib_end_sec": calib["jvm_end_sec"],
                "calib_factor": calib_factor,
                "value_calib_normalized": total_headline_norm,
                "detail": detail_name,
            }
        )
    )


if __name__ == "__main__":
    main()
