"""Round-6 operators: containment dedup, PCA power iteration, MERGE
semantics, embedding outliers, autocorrelation, BFS — oracle equality plus
the semantic properties an oracle match alone doesn't witness."""

from __future__ import annotations

from pyspark.sql import functions as F

from qpmodel_spark import registry
from qpmodel_spark.pipeline._util import CLONE_OFFSET
from tests.conftest import SF_DIR, assert_matches_oracle


def test_containment_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("dedup_containment"))


def test_containment_finds_every_excerpt(spark, duck):
    """Every planted 30-word prefix excerpt must hit its original at
    containment exactly 1.0 — the asymmetric case Jaccard misses."""
    rows = registry.get("dedup_containment").spark_fn(spark, SF_DIR).collect()
    got = {
        (r.src_id, r.dst_id): r.containment_micros
        for r in rows
    }
    n_sources = duck.execute(
        "SELECT count(*) FROM documents WHERE doc_id % 7 = 0"
    ).fetchone()[0]
    hits = [
        v
        for (src, dst), v in got.items()
        if src >= CLONE_OFFSET and dst == src - CLONE_OFFSET
    ]
    assert len(hits) == n_sources and all(v == 1_000_000 for v in hits)
    # and the symmetric Jaccard of those pairs is far below any dedup
    # threshold for at least one pair (the operator exists for a reason):
    # a 30-word excerpt of a ~200-word doc has jaccard ~ 0.15
    jac = duck.execute(
        f"""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        SELECT min(len(list_intersect(a.w, b.w))
                   / CAST(len(list_distinct(a.w)) + len(list_distinct(b.w)) AS DOUBLE))
        FROM ws a JOIN ws b ON a.doc_id % 7 = 0 AND b.doc_id = a.doc_id
        """
    ).fetchone()[0]
    assert jac is not None  # sanity: witness population non-empty


def test_pca_power_matches_oracle_and_is_unit_scaled(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_pca_power"))
    rows = registry.get("pipeline_pca_power").spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 64
    mags = [abs(r.loading_milli) for r in rows]
    # renormalization contract: the largest |loading| is exactly the scale
    assert max(mags) == 1000


def test_merge_upsert_action_partition(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("rel_merge_upsert"))
    rows = registry.get("rel_merge_upsert").spark_fn(spark, SF_DIR).collect()
    by_action = {}
    for r in rows:
        by_action.setdefault(r.action, []).append(r.o_orderkey)
    # inserts are change-set keys absent from the snapshot: % 2 == 0 and % 3 == 0
    assert all(k % 6 == 0 for k in by_action["insert"])
    # updates carry both predicates; keeps are snapshot-only keys
    assert all(k % 2 == 0 and k % 3 != 0 for k in by_action["update"])
    assert all(k % 2 == 1 and k % 3 != 0 for k in by_action["keep"])
    # MERGE output is keyed: one row per key
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys))


def test_embedding_outliers_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_embedding_outliers"))
    rows = registry.get("pipeline_embedding_outliers").spark_fn(spark, SF_DIR).collect()
    for r in rows:
        # p95 selected order statistic => at most 5% strictly above it
        assert r.n_outliers <= r.n * 0.05 + 1, r


def test_autocorrelation_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_autocorrelation"))
    rows = registry.get("op_autocorrelation").spark_fn(spark, SF_DIR).collect()
    assert all(-1.0 <= r.acf <= 1.0 for r in rows) and len(rows) > 0


def test_graph_bfs_matches_oracle_and_levels_are_disjoint(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_graph_bfs"))
    rows = registry.get("op_graph_bfs").spark_fn(spark, SF_DIR).collect()
    nodes = [r.node for r in rows]
    assert len(nodes) == len(set(nodes))  # each node labeled once
    assert sorted({r.dist for r in rows})[0] == 0


def test_graph_support2_triangles_consistent(spark):
    """Sparse-witness stats sanity: triangles require edges, degrees bound
    the wedge count."""
    row = registry.get("op_triangle_support2").spark_fn(spark, SF_DIR).collect()[0]
    assert row.n_edges <= row.n_nodes * (row.n_nodes - 1) // 2
    assert row.max_degree < row.n_nodes


def test_funnel_timebound_matches_oracle_and_is_stricter(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_funnel_timebound"))
    tb = registry.get("op_funnel_timebound").spark_fn(spark, SF_DIR).collect()
    ub = registry.get("op_funnel").spark_fn(spark, SF_DIR).collect()
    order = {"none": 0, "view": 1, "click": 2, "purchase": 3}
    tb_stage = {r.user_id: order[r.stage] for r in tb}
    ub_stage = {r.user_id: order[r.stage] for r in ub}
    # the 1h window can only demote stages relative to the unbounded funnel
    assert set(tb_stage) == set(ub_stage)
    assert all(tb_stage[u] <= ub_stage[u] for u in tb_stage)


def test_decay_sum_matches_oracle_and_bounds(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_decay_sum"))
    rows = registry.get("op_decay_sum").spark_fn(spark, SF_DIR).collect()
    raw = {
        r[0]: r[1]
        for r in duck.execute(
            "SELECT user_id, sum(CAST(floor(value*1000+0.5) AS BIGINT))"
            " FROM events GROUP BY user_id"
        ).fetchall()
    }
    # decay only shrinks: 0 <= decayed <= undecayed sum (values are >= 0)
    assert all(0 <= r.decayed_millis <= raw[r.user_id] for r in rows)


def test_inverted_index_matches_oracle_and_postings_sorted(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("text_inverted_index"))
    rows = registry.get("text_inverted_index").spark_fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids) and len(ids) == r.df


def test_stream_cdc_upsert_converges(spark, duck):
    """The real foreachBatch MERGE sink equals the batch aggregate."""
    assert_matches_oracle(spark, duck, registry.get("stream_cdc_upsert"))


def test_k_anonymity_matches_oracle_and_accounts(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_k_anonymity"))
    rows = registry.get("pipeline_k_anonymity").spark_fn(spark, SF_DIR).collect()
    total = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(r.n_docs for r in rows) == total  # every doc accounted once
    assert all(0 <= r.suppression_micros <= 1_000_000 for r in rows)


def test_benford_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_benford_test"))
    rows = registry.get("op_benford_test").spark_fn(spark, SF_DIR).collect()
    assert all(r.chi2_micros >= 0 for r in rows) and len(rows) > 0


def test_stream_user_stats_equals_batch(spark, duck):
    """Custom per-key stateful streaming aggregation converges to the batch
    aggregate (split-integer money accumulators make the compare exact)."""
    assert_matches_oracle(spark, duck, registry.get("stream_user_stats"))


def test_stream_session_live_equals_batch(spark, duck):
    """session_window under real streaming merges sessions across
    micro-batch boundaries to exactly the batch sessionization."""
    assert_matches_oracle(spark, duck, registry.get("stream_session_live"))
    live = {
        tuple(r)
        for r in registry.get("stream_session_live").spark_fn(spark, SF_DIR).collect()
    }
    batch = {
        tuple(r)
        for r in registry.get("stream_session").spark_fn(spark, SF_DIR).collect()
    }
    assert live == batch and len(live) > 0


def test_containment_prefix_filter_is_lossless(spark, duck):
    """Prefix filtering is EXACT for a containment threshold: the operator's
    output must equal the brute-force ALL-PAIRS containment >= 0.8 over the
    same gram sets — no blocked-candidate recall loss (the pigeonhole
    guarantee, witnessed)."""
    got = {
        (r.src_id, r.dst_id, r.containment_micros)
        for r in registry.get("dedup_containment").spark_fn(spark, SF_DIR).collect()
    }
    brute = duck.execute(
        f"""
        WITH base AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + {CLONE_OFFSET}, array_to_string(ws[1:30], ' ')
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
          WHERE doc_id % 7 = 0
        ), g AS (
          SELECT doc_id, list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                        for i in range(1, len(ws) - 1)]) AS gs
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM base)
        )
        SELECT a.doc_id, b.doc_id,
               CAST(floor(CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
                          * 1000000 / len(a.gs)) AS BIGINT) AS cm
        FROM g a JOIN g b ON a.doc_id <> b.doc_id
        WHERE len(a.gs) > 0
          AND CAST(floor(CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
                         * 1000000 / len(a.gs)) AS BIGINT) >= 800000
        """
    ).fetchall()
    assert got == {tuple(r) for r in brute} and len(got) > 0


def test_jaccard_prefix_equals_lsh_and_oracle(spark, duck):
    """The deterministic prefix path and the probabilistic LSH path must
    both equal the exact all-pairs oracle (and hence each other)."""
    assert_matches_oracle(spark, duck, registry.get("dedup_jaccard_prefix"))
    a = {
        tuple(r)
        for r in registry.get("dedup_jaccard_prefix").spark_fn(spark, SF_DIR).collect()
    }
    b = {
        tuple(r)
        for r in registry.get("dedup_minhash_lsh").spark_fn(spark, SF_DIR).collect()
    }
    assert a == b and len(a) > 0


def test_bootstrap_ci_matches_oracle_and_brackets_mean(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_bootstrap_ci"))
    rows = registry.get("op_bootstrap_ci").spark_fn(spark, SF_DIR).collect()
    for r in rows:
        assert r.ci_lo_millis <= r.mean_millis <= r.ci_hi_millis, r
        assert r.ci_hi_millis - r.ci_lo_millis > 0, r


def test_permutation_test_matches_oracle_and_p_bounds(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_permutation_test"))
    rows = registry.get("op_permutation_test").spark_fn(spark, SF_DIR).collect()
    lo = 1_000_000 // 65  # (1+0)/(B+1)
    for r in rows:
        assert lo <= r.p_micros <= 1_000_000, r


def test_forecast_backtest_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_forecast_backtest"))
    rows = registry.get("op_forecast_backtest").spark_fn(spark, SF_DIR).collect()
    # sMAPE is bounded by 2 (2e6 micros) by construction
    assert all(0 <= r.smape_micros <= 2_000_000 for r in rows) and rows


def test_churn_hazard_matches_oracle_and_monotone_risk(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_churn_hazard"))
    rows = sorted(
        registry.get("op_churn_hazard").spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.duration_days,
    )
    assert len(rows) > 0  # non-vacuous: the horizon must produce deaths
    # the at-risk set shrinks as lifetime grows; hazards are probabilities
    for a, b in zip(rows, rows[1:]):
        assert a.at_risk >= b.at_risk
    assert all(0 < r.hazard_micros <= 1_000_000 for r in rows)


def test_er_golden_record_matches_oracle_and_accounts(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("er_golden_record"))
    rows = registry.get("er_golden_record").spark_fn(spark, SF_DIR).collect()
    n_links_total = sum(r.n_links for r in rows)
    n_matches = duck.execute(
        registry.get("er_match_score").oracle.replace(
            "WHERE score >= 25", "WHERE score >= 30"
        )
    ).df().shape[0]
    # every match link lands in exactly one entity cluster
    assert n_links_total == n_matches and len(rows) > 0
    for r in rows:
        assert r.n_customers >= 1 and r.n_suppliers >= 1
        assert r.n_links >= max(r.n_customers, r.n_suppliers) - 1  # connected


def test_money_sum_recombination_is_order_independent():
    """Property: the split-integer money-sum discipline (queries/_util) is
    bit-identical under ANY aggregation order — the invariant every oracle
    comparison of a money column rests on.  Pure-Python replica of both
    engines' arithmetic: per-value micros split into (hi, lo) int parts,
    summed in two int64 accumulators (exact in any order), recombined by
    one fixed IEEE expression."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def recombine(vals, order):
        hi = sum((math.floor(v * 1_000_000 + 0.5)) // 1_000_000 for v in order(vals))
        lo = sum((math.floor(v * 1_000_000 + 0.5)) % 1_000_000 for v in order(vals))
        total = (float(hi) * 1e6 + float(lo)) / 1e6
        return math.floor(total * 100 + 0.5) / 100

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=0.0, max_value=1e6, allow_nan=False, width=64),
            min_size=1,
            max_size=50,
        )
    )
    def check(vals):
        fwd = recombine(vals, lambda v: v)
        rev = recombine(vals, lambda v: list(reversed(v)))
        srt = recombine(vals, sorted)
        assert fwd == rev == srt

    check()


def test_diff_in_diff_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_diff_in_diff"))
    rows = registry.get("op_diff_in_diff").spark_fn(spark, SF_DIR).collect()
    assert all(r.min_cell_n > 0 for r in rows) and len(rows) > 0


def test_uplift_deciles_matches_oracle_and_accounts(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_uplift_deciles"))
    rows = registry.get("op_uplift_deciles").spark_fn(spark, SF_DIR).collect()
    total = duck.execute("SELECT count(*) FROM events").fetchone()[0]
    assert sum(r.n_t + r.n_c for r in rows) == total
    assert all(abs(r.uplift_micros) <= 1_000_000 for r in rows)


def test_er_blocked_equals_unblocked(spark, duck):
    """Lossless blocking witness: the banded/suffix candidate union must
    reproduce er_match_score's output exactly (same oracle proves both)."""
    assert_matches_oracle(spark, duck, registry.get("er_match_blocked"))
    a = {
        tuple(r)
        for r in registry.get("er_match_blocked").spark_fn(spark, SF_DIR).collect()
    }
    b = {
        tuple(r)
        for r in registry.get("er_match_score").spark_fn(spark, SF_DIR).collect()
    }
    assert a == b


def test_ohlc_bars_matches_oracle_and_invariants(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_ohlc_bars"))
    rows = registry.get("op_ohlc_bars").spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # OHLC containment: open/close inside [low, high]; totals consistent
        assert r.low_c <= r.open_c <= r.high_c
        assert r.low_c <= r.close_c <= r.high_c
        assert r.n >= 1 and r.low_c * r.n <= r.total_c <= r.high_c * r.n
        # single-event bars degenerate to open==close==high==low
        if r.n == 1:
            assert r.open_c == r.close_c == r.high_c == r.low_c == r.total_c


def test_kmv_distinct_matches_oracle_and_estimates(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_kmv_distinct"))
    rows = registry.get("op_kmv_distinct").spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.n_exact < 64:
            # below the sketch's resolution the estimate is exact
            assert r.kmv_est == r.n_exact
        else:
            # KMV k=64 relative std err ~ 1/sqrt(k-2) ≈ 13%; allow 4σ
            assert abs(r.kmv_est - r.n_exact) <= r.n_exact * 0.52


def test_rolling_bands_matches_oracle_and_window_sums(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_rolling_bands"))
    rows = registry.get("op_rolling_bands").spark_fn(spark, SF_DIR).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.bar_start_us)
        # trailing count never below the bar's own count, and the first
        # bar's trail is exactly itself
        assert rs[0].nn == rs[0].n_b
        assert all(r.nn >= r.n_b for r in rs)
        # a flagged bar needs a non-degenerate trail (can't deviate from
        # a window that is only itself unless variance is zero and means
        # differ — impossible when the bar IS the window)
        assert all(not (r.out_of_band and r.nn == r.n_b) for r in rs)


def test_cumulative_distinct_matches_oracle_and_converges(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_cumulative_distinct"))
    rows = registry.get("op_cumulative_distinct").spark_fn(spark, SF_DIR).collect()
    assert rows
    final = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        # running sum is strictly increasing by the day's new_users
        prev = final.get(r.event_type, 0)
        assert r.cum_users == prev + r.new_users and r.new_users >= 1
        final[r.event_type] = r.cum_users
    # converged value == exact distinct per type
    exact = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert final == exact


def test_asof_nearest_matches_oracle_and_dominates_backward(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_asof_nearest"))
    near = {
        r.event_id: r
        for r in registry.get("op_asof_nearest").spark_fn(spark, SF_DIR).collect()
    }
    back = {
        r.event_id: r
        for r in registry.get("op_asof_join").spark_fn(spark, SF_DIR).collect()
    }
    assert set(near) == set(back) and near
    for eid, n in near.items():
        b = back[eid]  # op_asof_join surfaces whole-second epochs
        if b.click_s is not None:
            # on the backward side the picks coincide (second resolution);
            # either way the nearest gap never exceeds the backward gap
            # (±1s slack for the second-floor)
            if n.side == 1:
                assert n.click_us // 1_000_000 == b.click_s
            gap_near = abs(n.click_us - n.purchase_us) // 1_000_000
            gap_back = n.purchase_us // 1_000_000 - b.click_s
            assert gap_near <= gap_back + 1
        else:
            # no backward click: nearest must be forward or absent
            assert n.side in (0, 2)


def test_stream_hop_live_equals_batch_twin(spark, duck):
    """Real-run streaming hop == the batch stream_hop plan bit-for-bit
    (same oracle; this pins the stream==batch claim directly)."""
    assert_matches_oracle(spark, duck, registry.get("stream_hop_live"))
    live = sorted(
        tuple(r)
        for r in registry.get("stream_hop_live").spark_fn(spark, SF_DIR).collect()
    )
    batch = sorted(
        tuple(r)
        for r in registry.get("stream_hop").spark_fn(spark, SF_DIR).collect()
    )
    assert live == batch and live


def test_stream_restart_resume_exactly_once(spark, duck):
    """Restart-resume on one checkpoint: offsets AND state survive, the
    converged table equals the batch aggregate (no loss, no double count)."""
    assert_matches_oracle(spark, duck, registry.get("stream_restart_resume"))


def test_mm_resize_matches_oracle_and_shrinks(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("mm_resize"))
    rows = registry.get("mm_resize").spark_fn(spark, SF_DIR).collect()
    lens = dict(
        duck.execute("SELECT doc_id, length(text) FROM documents").fetchall()
    )
    assert rows and len(rows) == len(lens)
    from qpmodel_spark.pipeline.multimodal import RESIZE_FACTOR

    for r in rows:
        n_in = lens[r.doc_id]
        assert r.n_out == -(-n_in // RESIZE_FACTOR)  # ceil division
        assert 0 <= r.first_px <= 255
        assert 0 <= r.px_checksum <= 255 * r.n_out


def test_ds_q36_rank_within_rollup(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("ds_q36_rank_within_rollup"))
    rows = registry.get("ds_q36_rank_within_rollup").spark_fn(spark, SF_DIR).collect()
    # exactly one grand-total row at the top level, ranked 1 in its
    # singleton partition; detail ranks start at 1 within every parent
    top = [r for r in rows if r.lochierarchy == 2]
    assert len(top) == 1 and top[0].rank_in_parent == 1
    parents = {}
    for r in rows:
        if r.lochierarchy == 0:
            parents.setdefault(r.p_type, []).append(r.rank_in_parent)
    assert parents and all(sorted(v)[0] == 1 for v in parents.values())


def test_ds_q44_best_worst_paired(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("ds_q44_best_worst_paired"))
    rows = registry.get("ds_q44_best_worst_paired").spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.lo_ratio_micros <= r.hi_ratio_micros


def test_ds_q31_growth_compare(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("ds_q31_growth_compare"))
    rows = registry.get("ds_q31_growth_compare").spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # the filter's meaning: urgent growth ratio strictly beats standard
        assert r.urgent_cur * r.standard_prev > r.standard_cur * r.urgent_prev


def test_ds_q78_returns_ratio(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("ds_q78_returns_ratio"))
    rows = registry.get("ds_q78_returns_ratio").spark_fn(spark, SF_DIR).collect()
    assert rows
    # LEFT JOIN + COALESCE: parts with no returned rows survive with 0
    assert any(r.ret_qty == 0 for r in rows)
    assert all(r.sold_qty >= 100 for r in rows)


def test_rrf_fusion_matches_oracle_and_dominates_singles(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("sim_rrf_fusion"))
    rows = registry.get("sim_rrf_fusion").spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    got = sorted((r.fused_rnk, r.rrf_micros) for r in rows)
    # fused ranks are 1..20 and scores are non-increasing along the ranks
    assert [r for r, _ in got] == list(range(1, 21))
    scores = [s for _, s in got]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    # the fused top score is at least each side's best single-source score
    assert scores[0] >= 1_000_000 // 61


def test_ngram_novelty_matches_oracle_and_bounds(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("text_ngram_novelty"))
    rows = registry.get("text_ngram_novelty").spark_fn(spark, SF_DIR).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert by_doc
    # the first document is 100% novel by construction
    first = by_doc[min(by_doc)]
    assert first.n_novel == first.n_grams and first.novelty_micros == 1_000_000
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams


def test_eventual_pairs_matches_oracle_and_contains_transitions(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_eventual_pairs"))
    rows = registry.get("op_eventual_pairs").spark_fn(spark, SF_DIR).collect()
    got = {(r.type_a, r.type_b): r.n_pair_users for r in rows}
    assert got
    n_users = duck.execute(
        "SELECT count(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    assert all(0 < v <= n_users for v in got.values())
    # eventual-follow is a superset of adjacent transitions: every user
    # counted in an (a -> b) adjacent transition also has earliest-a
    # strictly before latest-b
    adj = duck.execute(
        """
        WITH o AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt
          FROM events
        )
        SELECT event_type, nxt, count(DISTINCT user_id)
        FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    for a, b, _n in adj:
        assert (a, b) in got  # pair present whenever an adjacency exists


def test_ohlc_bars_partition_all_events(spark, duck):
    """Bars tile the event stream: per-bar counts sum to the table size,
    and totals sum to the exact centi-quantized value sum."""
    rows = registry.get("op_ohlc_bars").spark_fn(spark, SF_DIR).collect()
    n_events, vc_sum = duck.execute(
        "SELECT count(*), sum(CAST(floor(value * 100 + 0.5) AS BIGINT))"
        " FROM events"
    ).fetchone()
    assert sum(r.n for r in rows) == n_events
    assert sum(r.total_c for r in rows) == vc_sum


def test_eventual_pairs_diagonal_is_repeat_users(spark, duck):
    """The (a, a) diagonal counts users whose earliest a strictly precedes
    their latest a — i.e. users with >= 2 distinct-time a-events."""
    rows = registry.get("op_eventual_pairs").spark_fn(spark, SF_DIR).collect()
    diag = {r.type_a: r.n_pair_users for r in rows if r.type_a == r.type_b}
    want = dict(
        duck.execute(
            """
            SELECT event_type, count(*) FROM (
              SELECT event_type, user_id
              FROM events GROUP BY event_type, user_id
              HAVING min(epoch_us(ts)) < max(epoch_us(ts))
            ) GROUP BY event_type
            """
        ).fetchall()
    )
    assert diag == want and diag
