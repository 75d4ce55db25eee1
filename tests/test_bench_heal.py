"""bench.py contention self-healing (judge r10 item #3).

Synthetic-load scenarios over the pure pieces of bench.py's pipeline
(spread_of / effective_spread / max_headline_spread_of / is_contended +
the min-fold the healing pass applies): a burst that poisons one headline
entry's first rep series must not permanently taint the run — after the
healing pass re-measures under a clean load, the headline value converges
to the clean value within ~5% and the contended flag releases, while the
raw spread stays in the artifact for forensics.  A genuinely unstable
entry (wide in BOTH series) must keep the flag up.
"""

from __future__ import annotations

import bench

# a real headline name with multi-second steady state (so the >=0.5s
# spread-qualification gate applies, as in a live run)
ENTRY = "op_pagerank_support2"
CLEAN = 1.0  # the entry's clean steady-state seconds in this scenario


def _fold(reps: dict[str, list[float]], heal: dict[str, list[float]]):
    """Replicate main()'s fold: min-of-first-series, then heal min folded
    in; returns (times, raw spread, healed spread)."""
    times = {k: round(min(v), 3) for k, v in reps.items()}
    spread = {k: bench.spread_of(v) for k, v in reps.items()}
    spread_heal = {}
    for k, v in heal.items():
        times[k] = round(min(min(v), times[k]), 3)
        spread_heal[k] = bench.spread_of(v)
    return times, spread, spread_heal


def test_headline_converges_after_heal():
    # burst poisons the first series: min-of-3 lands 35% above clean and
    # the spread (8.9) correctly trips the rerun threshold
    reps = {ENTRY: [12.0, 1.35, 9.0]}
    assert bench.spread_of(reps[ENTRY]) > bench.SPREAD_RERUN_THRESHOLD
    # healing pass under a re-checked clean host: tight series at clean
    heal = {ENTRY: [1.02, 1.0, 1.01, 1.03, 1.0]}
    times, spread, spread_heal = _fold(reps, heal)
    # headline value converged to the clean value within 5%
    assert abs(times[ENTRY] - CLEAN) / CLEAN <= 0.05
    # contended flag releases: healed spread supersedes the poisoned one
    eff = bench.effective_spread(spread, spread_heal)
    ms = bench.max_headline_spread_of(eff, times)
    assert ms <= bench.SPREAD_RERUN_THRESHOLD
    assert not bench.is_contended(0.5, 2.0, ms)
    # forensics retained: the raw spread still shows the burst
    assert spread[ENTRY] > bench.SPREAD_RERUN_THRESHOLD


def test_unstable_entry_keeps_flag():
    # wide in BOTH series — not a passing burst; the flag must stay up
    reps = {ENTRY: [10.0, 3.0, 1.0]}
    heal = {ENTRY: [8.0, 1.0, 5.0, 1.2, 7.0]}
    times, spread, spread_heal = _fold(reps, heal)
    eff = bench.effective_spread(spread, spread_heal)
    ms = bench.max_headline_spread_of(eff, times)
    assert bench.is_contended(0.5, 2.0, ms)


def test_subsecond_spread_does_not_qualify():
    # sub-0.5s entries jitter past 3x from scheduler noise alone — their
    # spread must not reach the flag
    times = {ENTRY: 0.3}
    assert bench.max_headline_spread_of({ENTRY: 9.0}, times) == 0.0


def test_load_thresholds_still_latch():
    assert bench.is_contended(5.0, 0.0, 1.0)  # pre-flight busy host
    assert bench.is_contended(0.0, 4.0, 1.0)  # contention onset mid-run
    assert not bench.is_contended(1.0, 3.0, 1.2)  # clean run
