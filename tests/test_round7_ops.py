"""Round-7 operators: PQ asymmetric-distance search and link prediction —
oracle equality plus the semantic properties an oracle match alone doesn't
witness."""

from __future__ import annotations

from qpmodel_spark import registry
from tests.conftest import SF_DIR, assert_matches_oracle


def test_pq_adc_topk_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("sim_pq_adc_topk"))


def test_pq_adc_topk_is_a_ranked_heap_per_query(spark):
    rows = registry.get("sim_pq_adc_topk").spark_fn(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == 4  # the fixed query set
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, 11))
        d = [r.adc_d2 for r in rs]
        assert d == sorted(d) and all(x >= 0 for x in d), qid


def test_pq_adc_agrees_with_encode_reconstruction(spark):
    """ADC distance of a vector to ITS OWN query column: for a query q in
    the corpus, the (q, q) ADC distance equals the table-lookup sum over
    q's own codes — which is exactly the encode entry's recon_d2 for q
    (the distance table row dt[q][b][code_b] IS the reconstruction term).
    Ties the search entry to the encode entry by construction."""
    adc = registry.get("sim_pq_adc_topk").spark_fn(spark, SF_DIR).collect()
    recon = {
        r.vec_id: r.recon_d2
        for r in registry.get("pipeline_embedding_pq").spark_fn(spark, SF_DIR).collect()
    }
    self_hits = {r.qid: r.adc_d2 for r in adc if r.vec_id == r.qid}
    # every query must see itself in its top-10 (its own recon error is
    # near-minimal) and the ADC value must equal the encode recon exactly
    assert len(self_hits) == 4
    for qid, d2 in self_hits.items():
        assert d2 == recon[qid], (qid, d2, recon[qid])


def test_link_prediction_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_link_prediction"))


def test_link_prediction_predicts_only_non_edges(spark, duck):
    rows = registry.get("op_link_prediction").spark_fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    edges = set(
        map(
            tuple,
            duck.execute(
                """
      SELECT a.l_partkey, b.l_partkey
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
      """
            ).fetchall(),
        )
    )
    for r in rows:
        assert (r.u, r.w) not in edges and r.u < r.w and r.cn >= 1
    ranked = sorted(rows, key=lambda r: r.rnk)
    keys = [(-r.cn, -r.ra_micros, r.u, r.w) for r in ranked]
    assert keys == sorted(keys)  # rank order == the declared total order


def test_ivfpq_search_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("sim_ivfpq_search"))


def test_ivfpq_results_come_only_from_probed_cells(spark, duck):
    """Inverted-list restriction: every returned vec_id's assigned cell is
    one of its query's probed cells (recomputed independently here)."""
    rows = registry.get("sim_ivfpq_search").spark_fn(spark, SF_DIR).collect()
    assert {r.qid for r in rows} and all(1 <= r.rnk <= 10 for r in rows)
    probe_and_assign = duck.execute(
        """
WITH q AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(floor(
             x * (127.0 / list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                                  y -> abs(y)))) + 0.5
         ) AS BIGINT)) AS qv
  FROM embeddings
), ccb AS (
  SELECT vec_id AS cell, qv AS cqv FROM q
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
), cd AS (
  SELECT q.vec_id, ccb.cell,
         list_sum(list_transform(range(1, 65),
                  i -> (q.qv[i] - ccb.cqv[i]) * (q.qv[i] - ccb.cqv[i]))) AS d2
  FROM q CROSS JOIN ccb
), ca AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) rn
    FROM cd) WHERE rn = 1
), probe AS (
  SELECT vec_id AS qid, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) rn
    FROM cd WHERE vec_id IN (SELECT vec_id FROM embeddings WHERE vec_id >= 100
                             ORDER BY vec_id LIMIT 4)) WHERE rn <= 2
)
SELECT probe.qid, ca.vec_id FROM probe JOIN ca ON ca.cell = probe.cell
"""
    ).fetchall()
    allowed = set(map(tuple, probe_and_assign))
    for r in rows:
        assert (r.qid, r.vec_id) in allowed, (r.qid, r.vec_id)


def test_skyline_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_skyline"))


def test_skyline_is_mutually_non_dominating_and_tight(spark, duck):
    rows = registry.get("op_skyline").spark_fn(spark, SF_DIR).collect()
    assert rows
    pts = [(r.price_c, r.size) for r in rows]
    for i, (ax, ay) in enumerate(pts):
        for j, (bx, by) in enumerate(pts):
            if i != j:
                assert not (
                    bx <= ax and by <= ay and (bx < ax or by < ay)
                ), ((ax, ay), (bx, by))
    # tightness: the global min-price and min-size points are on the frontier
    mn = duck.execute(
        "SELECT min(CAST(floor(p_retailprice*100+0.5) AS BIGINT)), min(p_size) FROM part"
    ).fetchone()
    assert min(x for x, _ in pts) == mn[0] and min(y for _, y in pts) == mn[1]


def test_mmr_rerank_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("sim_mmr_rerank"))


def test_mmr_selects_distinct_items_starting_from_argmax_relevance(spark):
    rows = registry.get("sim_mmr_rerank").spark_fn(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, {})[r.step] = r
    assert len(by_q) == 4
    for qid, steps in by_q.items():
        assert sorted(steps) == [1, 2, 3]
        picked = [steps[k].vec_id for k in (1, 2, 3)]
        assert len(set(picked)) == 3, (qid, picked)


def test_bitmap_distinct_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_bitmap_distinct"))


def test_bitmap_distinct_is_exact(spark):
    """The bitmap popcount must equal COUNT(DISTINCT) on every day — it is
    an exact encoding, not a sketch; and blocks never exceed ceil(|users|/63)."""
    rows = registry.get("op_bitmap_distinct").spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.bitmap_distinct == r.n_exact, r
        assert r.n_blocks <= (r.n_exact + 62) // 63 + 3  # sparse ids spread blocks


def test_kmv_intersection_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_kmv_intersection"))


def test_kmv_intersection_estimates_bracket_exact(spark):
    """Small-cardinality regime at test SF: the union fits under k, so the
    sketch is exhaustive and both estimates must be EXACT; the invariant
    k_both <= n_k <= k holds at any scale."""
    rows = registry.get("op_kmv_intersection").spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.k_both <= r.n_k <= 64
    if r.n_k < 64:  # sub-k regime: sketch is the full set
        assert r.union_est == r.union_exact
        assert r.inter_est == r.inter_exact


def test_streaks_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_streaks"))


def test_streaks_are_consistent(spark):
    rows = registry.get("op_streaks").spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.longest_streak <= r.n_active_days
        assert r.n_streaks >= 1
        # streaks partition active days: n_streaks * longest >= active days
        assert r.n_streaks * r.longest_streak >= r.n_active_days


def test_perplexity_buckets_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_perplexity_buckets"))


def test_perplexity_buckets_cover_every_source(spark, duck):
    """Every source splits into exactly head/middle/tail, the doc counts per
    source sum to the source's corpus count, and head <= middle <= tail by
    score range (edges are selected order statistics)."""
    rows = registry.get("pipeline_perplexity_buckets").spark_fn(spark, SF_DIR).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, {})[r.bucket] = r
    n_docs = dict(
        duck.execute("SELECT source, count(*) FROM documents GROUP BY 1").fetchall()
    )
    assert set(per_src) == set(n_docs)
    for src, buckets in per_src.items():
        assert set(buckets) == {"head", "middle", "tail"}
        assert sum(b.n_docs for b in buckets.values()) == n_docs[src]
        assert buckets["head"].hi_micros <= buckets["middle"].lo_micros
        assert buckets["middle"].hi_micros <= buckets["tail"].lo_micros


def test_hamming_topk_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("sim_hamming_topk"))


def test_hamming_topk_plan_uses_window_group_limit(spark):
    """The per-query top-k must push below the rank shuffle as
    WindowGroupLimit — per-partition top-k is what keeps the exchange at
    K rows per query per partition instead of |corpus| x |queries|."""
    from qpmodel_spark.ddl import explain_string

    plan = explain_string(
        registry.get("sim_hamming_topk").spark_fn(spark, SF_DIR), "formatted"
    )
    assert "WindowGroupLimit" in plan


def test_weighted_multinomial_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_weighted_multinomial"))


def test_weighted_multinomial_is_exact_inversion(spark, duck):
    """Every one of the 32 draws lands on exactly one document, and the
    selected doc's cumulative interval contains the position (checked
    against an independently computed integer CDF)."""
    rows = registry.get("pipeline_weighted_multinomial").spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 32
    assert len({r.j for r in rows}) == 32
    cdf = dict(
        duck.execute(
            """SELECT doc_id, sum(n_chars) OVER (ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) FROM documents"""
        ).fetchall()
    )
    w = dict(duck.execute("SELECT doc_id, n_chars FROM documents").fetchall())
    for r in rows:
        hi = cdf[r.doc_id]
        assert hi - w[r.doc_id] <= r.pos < hi, r


def test_continuous_aggregate_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_continuous_aggregate"))


def test_continuous_aggregate_route_equals_direct(spark):
    """The MV route must be bit-identical to aggregating raw events directly
    in Spark itself — integer micro sums are associative across the
    hour→day regrouping."""
    from pyspark.sql import functions as F

    from qpmodel_spark.queries._util import t

    routed = {
        (r.event_type, r.day): (r.n_events, r.sum_value)
        for r in registry.get("op_continuous_aggregate").spark_fn(spark, SF_DIR).collect()
    }
    direct = (
        t(spark, SF_DIR, "events")
        .groupBy("event_type", F.col("ts").cast("date").cast("string").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.expr(
                "floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)"
                " / CAST(1000000 AS DOUBLE) * CAST(100 AS DOUBLE) + 0.5)"
                " / CAST(100 AS DOUBLE)"
            ).alias("s"),
        )
        .collect()
    )
    assert len(direct) == len(routed)
    for r in direct:
        n, s = routed[(r.event_type, r.day)]
        assert (n, s) == (r.n, r.s), (r.event_type, r.day)


def test_mutual_nn_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("sim_mutual_nn"))


def test_mutual_nn_pairs_are_disjoint_top1_edges(spark):
    """Top-1 is unique per node, so mutual pairs are vertex-disjoint; and
    every pair must appear in the knn top-1 edge set in both directions."""
    top1 = {
        (r.qid, r.vec_id)
        for r in registry.get("sim_knn_join").spark_fn(spark, SF_DIR).collect()
        if r.rnk == 1
    }
    pairs = registry.get("sim_mutual_nn").spark_fn(spark, SF_DIR).collect()
    assert pairs
    seen = set()
    for p in pairs:
        assert p.va < p.vb
        assert (p.va, p.vb) in top1 and (p.vb, p.va) in top1
        assert p.va not in seen and p.vb not in seen
        seen.update((p.va, p.vb))


def test_lateness_audit_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_lateness_audit"))


def test_lateness_audit_thresholds_are_monotone(spark):
    rows = registry.get("op_lateness_audit").spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # tighter watermark drops at least as much; jitter bound caps lateness
        assert r.n_events >= r.late_any >= r.dropped_15m >= r.dropped_1h
        assert r.late_any > 0  # jitter makes the witness non-trivial
        assert r.max_late_us < 7200 * 1_000_000


def test_twostage_rerank_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("sim_twostage_rerank"))


def test_twostage_rerank_funnel_shape(spark):
    """Each query yields exactly K=5 ranked rows drawn from its stage-1
    Hamming candidates, and stage-2 order is by quantized cosine."""
    rows = registry.get("sim_twostage_rerank").spark_fn(spark, SF_DIR).collect()
    ham = {
        (r.qid, r.vec_id)
        for r in registry.get("sim_hamming_topk").spark_fn(spark, SF_DIR).collect()
    }
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == 10
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == [1, 2, 3, 4, 5]
        cos = [r.cos_u for r in rs]
        assert cos == sorted(cos, reverse=True)
    # the hamming entry's top-5 is a subset of the stage-1 top-20, so any
    # (qid, vec) pair in BOTH outputs witnesses the shared stage-1 ranking
    assert ham & {(r.qid, r.vec_id) for r in rows}


def test_window_funnel_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_window_funnel"))


def test_window_funnel_dominates_first_anchor_funnel(spark):
    """Depths partition all users and every depth 1..3 is populated — the
    6h window was chosen so the depth-3 carry path is exercised at every
    SF (a 1h window yields zero full chains in this corpus)."""
    rows = registry.get("op_window_funnel").spark_fn(spark, SF_DIR).collect()
    by_depth = {r.depth: r.n_users for r in rows}
    assert set(by_depth) >= {1, 2, 3}  # non-vacuous at every depth
    assert all(v > 0 for v in by_depth.values())


# ---------------------------------------------------------------- wave 3
def test_gini_concentration_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_gini_concentration"))


def test_gini_concentration_lorenz_invariants(spark, duck):
    """Lorenz-curve mathematics the oracle match alone doesn't witness:
    0 <= gini < 1, top-decile share >= its population share (10%), the
    bottom half holds <= 50%, and shares nest (top1 <= top10)."""
    (r,) = registry.get("op_gini_concentration").spark_fn(spark, SF_DIR).collect()
    assert r.n_customers > 0 and r.total_cents > 0
    assert 0 <= r.gini_micros < 1_000_000
    assert r.top1_share_micros <= r.top10_share_micros <= 1_000_000
    assert r.top10_share_micros >= 100_000  # top decile >= uniform share
    assert r.bottom50_share_micros <= 500_000
    # exact total: per-customer cents regrouped from orders
    tot = duck.execute(
        "SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) FROM orders"
    ).fetchone()[0]
    assert r.total_cents == tot


def test_cuped_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_cuped"))


def test_cuped_preserves_pooled_mean_and_reduces_variance(spark):
    """CUPED with the GLOBAL covariate mean is mean-preserving: the
    user-weighted adjusted mean equals the user-weighted raw mean (the
    theta corrections cancel, Sigma_arm theta(Sx_a - n_a*xbar) = 0).  On the
    floor(+0.5)-millicent outputs the cancellation holds to 1 millicent
    per arm.  Pooled variance cannot increase (theta is the OLS argmin);
    per-arm reduction is allowed to be slightly negative, bounded below."""
    rows = registry.get("op_cuped").spark_fn(spark, SF_DIR).collect()
    assert {r.arm for r in rows} == {0, 1}
    n = sum(r.n_users for r in rows)
    raw = sum(r.y_mean_millicents * r.n_users for r in rows) / n
    adj = sum(r.y_adj_mean_millicents * r.n_users for r in rows) / n
    assert abs(raw - adj) <= 1.0  # millicents
    for r in rows:
        assert -200_000 <= r.var_reduction_micros <= 1_000_000


def test_cross_correlation_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_cross_correlation"))


def test_cross_correlation_pair_counts_shrink_by_lag(spark):
    rows = registry.get("op_cross_correlation").spark_fn(spark, SF_DIR).collect()
    by_lag = {r.lag_hours: r for r in rows}
    assert sorted(by_lag) == list(range(13))
    n0 = by_lag[0].n_pairs
    for lag, r in by_lag.items():
        assert r.n_pairs == n0 - lag  # dense grid: exactly H-L aligned pairs
        assert -1_000_000 <= r.corr_micros <= 1_000_000


def test_attribution_linear_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_attribution_linear"))


def test_attribution_linear_conserves_purchase_value(spark, duck):
    """Largest-remainder allocation is EXACT: total credit across clicks
    equals the micro-value total of every purchase that has >=1 click in
    its 7-day lookback — to the micro, no rounding leak."""
    rows = registry.get("op_attribution_linear").spark_fn(spark, SF_DIR).collect()
    assert rows and all(r.n_purchases >= 1 for r in rows)
    credited = sum(r.credit_micros for r in rows)
    expect = duck.execute(
        """
        SELECT CAST(sum(vmic) AS BIGINT) FROM (
          SELECT DISTINCT p.event_id,
                 CAST(floor(p.value * 1000000 + 0.5) AS BIGINT) AS vmic
          FROM events p JOIN events c
            ON c.user_id = p.user_id AND c.event_type = 'click'
           AND p.event_type = 'purchase'
           AND epoch_us(c.ts) >= epoch_us(p.ts) - 604800000000
           AND epoch_us(c.ts) < epoch_us(p.ts))
        """
    ).fetchone()[0]
    assert credited == expect


def test_gopher_rules_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("text_gopher_rules"))


def test_gopher_rules_census_is_consistent(spark):
    """Census arithmetic: every pass count <= n_docs, keep <= min(rule
    passes), and the corpus-wide totals cover every document exactly once."""
    rows = registry.get("text_gopher_rules").spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        passes = [r.pass_wordcount, r.pass_wordlen, r.pass_stopwords,
                  r.pass_repetition, r.pass_lang]
        assert all(0 <= p <= r.n_docs for p in passes)
        assert r.n_keep <= min(passes)
        assert 0 <= r.keep_rate_micros <= 1_000_000


def test_q88_timeslot_counts_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("ds_q88_timeslot_counts"))


def test_q88_is_one_row_of_slot_counts(spark):
    (r,) = registry.get("ds_q88_timeslot_counts").spark_fn(spark, SF_DIR).collect()
    vals = [r.h8, r.h9, r.h10, r.h11, r.h12, r.h13, r.h14, r.h15]
    assert all(v >= 0 for v in vals) and sum(vals) > 0


def test_time_travel_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("rel_time_travel"))


def test_time_travel_versions_tell_the_mutation_story(spark):
    """v-initial strictly contains v-after-delete; the update only
    increases the total (+10% on a subset of positive cents); row count is
    unchanged by the update."""
    rows = {r.state: r for r in
            registry.get("rel_time_travel").spark_fn(spark, SF_DIR).collect()}
    ini, dele, live = rows["initial"], rows["after_delete"], rows["live_updated"]
    assert ini.n_rows > dele.n_rows > 0          # the delete removed rows
    assert ini.total_cents > dele.total_cents
    assert live.n_rows == dele.n_rows            # update rewrites in place
    assert live.total_cents > dele.total_cents   # +10% on the even keys


def test_rake_keywords_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("text_rake_keywords"))


def test_rake_scores_and_phrase_accounting(spark, duck):
    """RAKE identities the oracle match doesn't witness directly: degree >=
    freq for every word (each occurrence contributes a phrase length >= 1),
    rank order == the declared (score DESC, word) total order, and the
    frequency column equals the plain non-stopword term frequency."""
    rows = registry.get("text_rake_keywords").spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 15
    keys = [(-r.score_micros, r.word) for r in sorted(rows, key=lambda r: r.rnk)]
    assert keys == sorted(keys)
    tf = dict(
        duck.execute(
            "SELECT w, count(*) FROM (SELECT unnest(string_split(text,' ')) w "
            "FROM documents) WHERE w NOT IN ('the','a','fast','slow') GROUP BY w"
        ).fetchall()
    )
    for r in rows:
        assert r.degree >= r.freq >= 1
        assert r.freq == tf[r.word]


def test_schema_evolution_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("rel_schema_evolution"))


def test_schema_evolution_tiers_partition_the_slices(spark, duck):
    rows = {r.tier: r for r in
            registry.get("rel_schema_evolution").spark_fn(spark, SF_DIR).collect()}
    n2, n3 = (duck.execute(
        f"SELECT count(*) FROM orders WHERE o_orderkey % 7 = {m}"
    ).fetchone()[0] for m in (2, 3))
    assert rows[1].n_rows == n2 and rows[2].n_rows == n3  # overlay vs real col


def test_spatial_knn_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_spatial_knn"))


def test_spatial_knn_geometry_certificate(spark):
    """The grid pruning's exactness certificate: every returned neighbor
    sits within the KC cell bound (so the 3x3 neighborhood provably holds
    the global top-5), each query has exactly ranks 1..5, distances
    non-decreasing with the (dist2, pid) tiebreak."""
    rows = registry.get("op_spatial_knn").spark_fn(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        assert r.in_bound  # certificate: candidate 5th-NN <= KC
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == 10
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == [1, 2, 3, 4, 5]
        d = [r.dist2 for r in rs]
        assert d == sorted(d)


def test_fd_profile_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_fd_profile"))


def test_fd_profile_witnesses_both_outcomes(spark):
    rows = {r.fd: r for r in
            registry.get("pipeline_fd_profile").spark_fn(spark, SF_DIR).collect()}
    assert len(rows) == 5
    # key FDs hold with zero violations
    for fd in ("o_orderkey->o_custkey", "c_custkey->c_nationkey"):
        assert rows[fd].holds and rows[fd].n_violating == 0
    # genuinely violated at every SF -- including the composite that IS a
    # key in real TPC-H but is not enforced by this synthetic generator
    # (the key-assumption finding the profiler exists to surface)
    assert not rows["l_partkey->l_suppkey"].holds
    assert not rows["l_orderkey,l_linenumber->l_partkey"].holds
    for r in rows.values():
        assert 0 <= r.n_violating <= r.n_lhs


def test_att_matching_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_att_matching"))


def test_att_matching_strata_partition_users(spark, duck):
    """Common-support accounting: arm counts across strata sum to the
    corpus user population, matched strata carry a non-null difference,
    unmatched ones a null."""
    rows = registry.get("op_att_matching").spark_fn(spark, SF_DIR).collect()
    n_users = duck.execute(
        "SELECT count(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    assert sum(r.n_t + r.n_c for r in rows) == n_users
    assert any(r.matched for r in rows)  # non-vacuous common support
    for r in rows:
        assert (r.diff_millicents is not None) == r.matched


def test_growth_accounting_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_growth_accounting"))


def test_growth_accounting_identity_holds(spark):
    """The growth identity every dashboard relies on:
    DAU(d) - DAU(d-1) == new(d) + resurrected(d) - churned(d) for every
    consecutive day pair, and DAU == new + retained + resurrected."""
    rows = sorted(
        registry.get("op_growth_accounting").spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    assert rows
    for r in rows:
        assert r.dau == r.n_new + r.n_retained + r.n_resurrected
    for prev, cur in zip(rows, rows[1:]):
        if cur.day == prev.day + 1:
            assert cur.dau - prev.dau == (
                cur.n_new + cur.n_resurrected - cur.n_churned
            ), (prev, cur)


def test_burstiness_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("text_burstiness"))


def test_burstiness_is_population_vmr(spark, duck):
    """Recompute one word's VMR from raw counts (zero-count docs included)
    and check the fixed-tree quantization; ranking follows the declared
    (vmr DESC, word) order."""
    import math

    rows = registry.get("text_burstiness").spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 15
    keys = [(-r.vmr_micros, r.word) for r in sorted(rows, key=lambda r: r.rnk)]
    assert keys == sorted(keys)
    w = rows[0].word
    nd = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    counts = [
        c
        for (c,) in duck.execute(
            "SELECT count(*) FROM (SELECT doc_id, unnest(string_split(text,' ')) w "
            f"FROM documents) WHERE w = '{w}' GROUP BY doc_id"
        ).fetchall()
    ]
    counts += [0] * (nd - len(counts))
    mean = sum(counts) / nd
    vmr = (sum(c * c for c in counts) / nd - mean * mean) / mean
    # +-1 micro: this reassembly associates differently than the entry's
    # fixed tree, so the last double ulp may floor across the boundary
    assert abs(rows[0].vmr_micros - math.floor(vmr * 1_000_000)) <= 1


def test_q90_ampm_ratio_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("ds_q90_ampm_ratio"))


def test_oov_rate_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("text_oov_rate"))


def test_oov_rate_census_covers_every_token(spark, duck):
    rows = registry.get("text_oov_rate").spark_fn(spark, SF_DIR).collect()
    total = duck.execute(
        "SELECT count(*) FROM (SELECT unnest(string_split(text,' ')) FROM documents)"
    ).fetchone()[0]
    assert sum(r.n_tokens for r in rows) == total
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0 <= r.oov_rate_micros <= 1_000_000


def test_conversion_lag_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_conversion_lag"))


def test_conversion_lag_order_statistics_nest(spark):
    (r,) = registry.get("op_conversion_lag").spark_fn(spark, SF_DIR).collect()
    assert r.n_converted > 0
    assert 0 <= r.p50_s <= r.p90_s <= r.max_s
    assert 0 <= r.mean_s <= r.max_s


def test_prf_expansion_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("text_prf_expansion"))


def test_prf_expansion_keeps_seed_relevance(spark):
    """Feedback-loop sanity: the expanded ranking still surfaces feedback
    docs (PRF reinforces, not replaces), ranks are a clean 1..20 in the
    declared order, and at least one NON-feedback doc enters the top-20
    (the expansion actually changed the candidate pool)."""
    rows = sorted(
        registry.get("text_prf_expansion").spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.rnk for r in rows] == list(range(1, 21))
    scores = [r.score_micros for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert any(r.in_feedback_set for r in rows)
    assert any(not r.in_feedback_set for r in rows)


def test_ri_audit_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_ri_audit"))


def test_ri_audit_covers_the_star_and_holds(spark):
    rows = {r.edge: r for r in
            registry.get("pipeline_ri_audit").spark_fn(spark, SF_DIR).collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert r.ri_holds and r.n_orphan == 0  # generator emits a clean star
        assert 0 <= r.n_childless  # cardinality drift is informational
        assert r.n_child_keys > 0


def test_stickiness_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_stickiness"))


def test_stickiness_bounds_and_window_cover(spark, duck):
    """DAU <= WAU (a day's actives are inside its trailing week) hence
    ratio <= 1; WAU >= max DAU inside the window; first reported day is
    min_day + 6 (only full-width windows)."""
    rows = sorted(
        registry.get("op_stickiness").spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    assert rows
    mnd = duck.execute(
        "SELECT CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) FROM events"
    ).fetchone()[0]
    assert rows[0].day == mnd + 6
    for r in rows:
        assert 0 < r.dau <= r.wau
        assert 0 < r.stickiness_micros <= 1_000_000


def test_winnowing_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("text_winnowing"))


def test_winnowing_matches_independent_python_implementation(spark):
    """Third-engine witness: winnowing re-derived in pure Python (hashlib
    md5, dict/set arithmetic) over sf0.01 — where the corpus HAS near-dup
    pairs (sf0.001 has none, which would make the witness vacuous) — must
    reproduce the entry's pair table cell-for-cell.  Independent of both
    SQL engines, so a shared dialect quirk can't hide."""
    import hashlib
    from collections import Counter

    import duckdb as _duck

    sf = "/root/testdata/sf0.01"
    docs = (
        _duck.connect()
        .execute(f"SELECT doc_id, text FROM '{sf}/documents.parquet'")
        .fetchall()
    )
    K, W, CAP, MIN = 3, 4, 50, 2
    fps = {}
    for did, text in docs:
        ws = text.split(" ")
        if len(ws) < K:
            continue
        hs = [
            int(hashlib.md5(" ".join(ws[i : i + K]).encode()).hexdigest()[:15], 16)
            for i in range(len(ws) - K + 1)
        ]
        n = len(hs)
        fps[did] = {min(hs[p : p + W]) for p in range(max(n - W, 0) + 1)}
    dfc = Counter(f for s in fps.values() for f in s)
    fps = {d: {f for f in s if dfc[f] <= CAP} for d, s in fps.items()}
    inv = {}
    for d, s in fps.items():
        for f in s:
            inv.setdefault(f, []).append(d)
    pairc = Counter()
    for ds in inv.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairc[(ds[i], ds[j])] += 1
    expect = {
        (a, b): (n, len(fps[a]), len(fps[b]), n / (len(fps[a]) + len(fps[b]) - n))
        for (a, b), n in pairc.items()
        if n >= MIN
    }
    rows = registry.get("text_winnowing").spark_fn(spark, sf).collect()
    got = {(r.doc_a, r.doc_b): (r.n_shared, r.n_fp_a, r.n_fp_b, r.jaccard) for r in rows}
    assert set(got) == set(expect) and len(got) > 50
    for p, (ns, na, nb, jac) in expect.items():
        gs, ga, gb, gj = got[p]
        assert (gs, ga, gb) == (ns, na, nb), p
        # round(x, 4) moves a value by at most 5e-5, and EXACTLY 5e-5 when
        # the true ratio sits on a half boundary (pair (35,133) is exactly
        # 1/32 = 0.03125 -> 0.0313 under both engines' half-up round); the
        # epsilon absorbs the float representation of that boundary.
        assert abs(gj - jac) <= 5e-5 + 1e-9, p
