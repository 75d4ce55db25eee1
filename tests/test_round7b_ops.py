"""Round-7 second-session operators: item-item CF, HITS, Nelson-Aalen
survival, contrastive-pair mining, calibration bins, TextRank — oracle
equality plus the semantic properties an oracle match alone doesn't
witness."""

from __future__ import annotations

from qpmodel_spark import registry
from tests.conftest import SF_DIR, assert_matches_oracle


def test_item_cf_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_item_cf"))


def test_item_cf_neighbor_lists_are_ranked_and_bounded(spark):
    rows = registry.get("op_item_cf").spark_fn(spark, SF_DIR).collect()
    assert rows
    by_item = {}
    for r in rows:
        # Cauchy-Schwarz on binary membership vectors: cooc <= min(ci, cn)
        # so the squared cosine never exceeds 1
        assert 0 <= r.sim_micros <= 1_000_000
        assert r.item != r.neighbor
        by_item.setdefault(r.item, []).append(r)
    for item, rs in by_item.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        sims = [(-r.sim_micros, r.neighbor) for r in rs]
        assert sims == sorted(sims), item


def test_hits_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_hits"))


def test_hits_top_authority_normalizes_to_one(spark):
    rows = sorted(
        registry.get("op_hits").spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.rnk,
    )
    assert 0 < len(rows) <= 10
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0].auth_micros == 1_000_000  # max authority reads out as 1.0
    auths = [r.auth_score for r in rows]
    assert auths == sorted(auths, reverse=True)
    assert all(r.hub_score >= 0 for r in rows)


def test_nelson_aalen_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_survival_nelson_aalen"))


def test_nelson_aalen_extends_churn_hazard_table(spark):
    """Same censoring model, same life table: every (duration, at_risk,
    deaths, hazard) row must agree with op_churn_hazard, and the cumulative
    hazard must be the exact running sum of the quantized hazards."""
    na = sorted(
        registry.get("op_survival_nelson_aalen").spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.duration_days,
    )
    ch = {
        r.duration_days: (r.at_risk, r.deaths, r.hazard_micros)
        for r in registry.get("op_churn_hazard").spark_fn(spark, SF_DIR).collect()
    }
    assert na and len(na) == len(ch)
    run = 0
    prev_risk = None
    for r in na:
        assert ch[r.duration_days] == (r.at_risk, r.deaths, r.hazard_micros)
        assert r.hazard_micros == (1_000_000 * r.deaths) // r.at_risk
        run += r.hazard_micros
        assert r.cumhaz_micros == run  # exact integer prefix sum
        if prev_risk is not None:
            assert r.at_risk < prev_risk  # risk set shrinks past each death
        prev_risk = r.at_risk


def test_hard_negatives_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_hard_negatives"))


def test_hard_negatives_polarity_is_label_true(spark, duck):
    rows = registry.get("pipeline_hard_negatives").spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 4  # the fixed query set
    labels = dict(
        duck.execute("SELECT vec_id, label FROM embeddings").fetchall()
    )
    for r in rows:
        assert labels[r.pos_id] == labels[r.qid]  # positive shares the label
        assert labels[r.neg_id] != labels[r.qid]  # negative crosses it
        assert r.pos_id != r.qid and r.neg_id != r.qid
        assert r.margin_micros == r.pos_score_micros - r.neg_score_micros


def test_calibration_bins_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_calibration_bins"))


def test_calibration_bins_partition_the_corpus(spark, duck):
    rows = registry.get("pipeline_calibration_bins").spark_fn(spark, SF_DIR).collect()
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs  # bins partition the corpus
    for r in rows:
        assert 0 <= r.bin <= 19
        assert 0 <= r.n_pos <= r.n_docs
        assert 0 <= r.pos_rate_micros <= 1_000_000
        # mean score sits inside its own bin (clamped top bin excepted)
        if r.bin < 19:
            assert r.bin * 50_000 <= r.mean_score_micros < (r.bin + 1) * 50_000
        assert r.gap_micros == r.mean_score_micros - r.pos_rate_micros


def test_textrank_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("text_textrank_keywords"))


def test_textrank_is_a_ranked_vocab_list(spark, duck):
    rows = sorted(
        registry.get("text_textrank_keywords").spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.rnk for r in rows] == list(range(1, 11))
    keys = [(-r.rank_micros, r.word) for r in rows]
    assert keys == sorted(keys)  # declared total order
    vocab = {
        w
        for (w,) in duck.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) FROM documents"
        ).fetchall()
    }
    assert all(r.word in vocab for r in rows)
    # damped propagation keeps every rank above the teleport floor
    assert all(r.rank_micros >= 150_000 for r in rows)


def test_sequence_pack_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_sequence_pack"))


def test_sequence_pack_accounting_is_consistent(spark, duck):
    rows = registry.get("pipeline_sequence_pack").spark_fn(spark, SF_DIR).collect()
    n_docs, n_tokens, max_nw = duck.execute(
        "SELECT count(*), sum(len(string_split(text, ' '))),"
        " max(len(string_split(text, ' '))) FROM documents"
    ).fetchone()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.total_tokens for r in rows) == n_tokens
    for r in rows:
        # a sequence holds >= 1 doc; fill exceeds 1.0 only via boundary
        # straddlers, so the true bound is n_seqs*cap + (last doc - 1):
        # the final doc STARTS in the last sequence and may overhang it
        assert 1 <= r.n_seqs <= r.n_docs
        assert r.total_tokens <= r.n_seqs * 512 + max_nw - 1
        assert 0 <= r.n_straddle < r.n_docs
        assert r.fill_micros == 1_000_000 * r.total_tokens // (r.n_seqs * 512)


def test_temperature_mix_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_temperature_mix"))


def test_temperature_mix_boosts_small_sources(spark):
    rows = registry.get("pipeline_temperature_mix").spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 20  # src0..src19
    # weights are (floor-quantized) distributions
    assert abs(sum(r.prop_weight_micros for r in rows) - 1_000_000) < len(rows)
    assert abs(sum(r.temp_weight_micros for r in rows) - 1_000_000) < len(rows)
    # sqrt flattening: the smallest source never loses share, the largest
    # never gains (floor quantization makes near-uniform boosts 0, so the
    # guaranteed inequality is non-strict)
    smallest = min(rows, key=lambda r: (r.n_docs, r.source))
    largest = max(rows, key=lambda r: (r.n_docs, r.source))
    assert smallest.boost_micros >= 0 >= largest.boost_micros
    for r in rows:
        assert r.boost_micros == r.temp_weight_micros - r.prop_weight_micros


def test_theil_sen_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_trend_theil_sen"))


def test_theil_sen_median_is_a_real_pair_slope(spark, duck):
    row = registry.get("op_trend_theil_sen").spark_fn(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    assert abs(r.mk_s) <= r.n_pairs
    assert r.trend_sign == (r.mk_s > 0) - (r.mk_s < 0)
    slopes = [
        s
        for (s,) in duck.execute(
            """
      WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                        CAST(count(*) AS BIGINT) AS cnt
                 FROM events GROUP BY 1)
      SELECT CAST(floor(1000000.0 * CAST(b.cnt - a.cnt AS DOUBLE)
                        / CAST(b.day - a.day AS DOUBLE)) AS BIGINT)
      FROM d a JOIN d b ON b.day > a.day
      """
        ).fetchall()
    ]
    slopes.sort()
    assert r.ts_slope_micros == slopes[(len(slopes) + 1) // 2 - 1]  # lower median


def test_srm_check_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_srm_check"))


def test_srm_check_statistic_identity(spark):
    row = registry.get("op_srm_check").spark_fn(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_arm0 + r.n_arm1 == r.n_users
    import math

    expect = math.floor(1_000_000.0 * (r.n_arm0 - r.n_arm1) ** 2 / r.n_users)
    assert r.chi2_micros == expect
    assert r.srm_detected == int(r.chi2_micros > 3_841_459)


def test_dedup_sensitivity_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("dedup_sensitivity"))


def test_dedup_sensitivity_sweep_is_monotone(spark):
    rows = sorted(
        registry.get("dedup_sensitivity").spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.thr_micros,
    )
    assert rows and rows[0].thr_micros == 500_000
    for prev, cur in zip(rows, rows[1:]):
        # raising the threshold can only shrink every census column
        assert cur.n_pairs <= prev.n_pairs
        assert cur.n_docs_touched <= prev.n_docs_touched
        assert cur.n_removed <= prev.n_removed
        assert cur.keep_rate_micros >= prev.keep_rate_micros
    for r in rows:
        assert r.n_removed <= r.n_docs_touched <= 2 * r.n_pairs


def test_tile_grid_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("mm_tile_grid"))


def test_tile_grid_geometry(spark, duck):
    rows = {
        r.doc_id: r
        for r in registry.get("mm_tile_grid").spark_fn(spark, SF_DIR).collect()
    }
    lens = dict(
        duck.execute("SELECT doc_id, len(text) FROM documents").fetchall()
    )
    assert len(rows) == sum(1 for v in lens.values() if v > 0)
    for doc_id, r in rows.items():
        n = lens[doc_id]
        nrows = -(-n // 16)  # ceil: virtual image rows
        expect_tiles = -(-nrows // 4) * 4 if n >= 16 else -(-n // 4)
        # every populated tile holds >= 1 pixel; tile ids cover the grid of
        # occupied 4x4 cells: rows of tiles = ceil(nrows/4), 4 tile columns
        # when the last pixel row is full-width, fewer when n < 16
        assert 1 <= r.n_tiles <= expect_tiles
        assert 0 <= r.first_tile_mean <= 255
        assert r.tile_checksum <= 255 * r.n_tiles


def test_centroid_classify_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("sim_centroid_classify"))


def test_centroid_classify_confusion_matrix_is_complete(spark, duck):
    rows = registry.get("sim_centroid_classify").spark_fn(spark, SF_DIR).collect()
    per_label = dict(
        duck.execute(
            "SELECT label, count(*) FROM embeddings GROUP BY label"
        ).fetchall()
    )
    # every vector is classified exactly once
    assert sum(r.n for r in rows) == sum(per_label.values())
    by_true = {}
    for r in rows:
        by_true[r.true_label] = by_true.get(r.true_label, 0) + r.n
        assert 0 <= r.pred_label <= 9
    assert by_true == {k: v for k, v in per_label.items()}
    # centroids must separate better than chance: diagonal mass > 1/10
    diag = sum(r.n for r in rows if r.true_label == r.pred_label)
    assert diag * 10 > sum(per_label.values())


def test_label_propagation_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_label_propagation"))


def test_label_propagation_communities_partition_nodes(spark, duck):
    rows = sorted(
        registry.get("op_label_propagation").spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.rnk,
    )
    n_nodes = duck.execute(
        """
      WITH pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
      )
      SELECT count(DISTINCT v) FROM
        (SELECT pa AS v FROM pairs UNION SELECT pb FROM pairs)
      """
    ).fetchone()[0]
    assert rows and [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    sizes = [r.n_members for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    # top-20 communities cannot cover more nodes than exist, and labels
    # are node ids from the graph
    assert sum(sizes) <= n_nodes
    assert all(r.n_members >= 1 for r in rows)


def test_lag_features_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_lag_features"))


def test_lag_features_trailing_window_respects_gaps(spark):
    rows = registry.get("op_lag_features").spark_fn(spark, SF_DIR).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    checked_gap = 0
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.day)
        assert rs[0].gap_days == -1 and rs[0].prev_cnt == 0  # first day
        hist = {r.day: (r.cnt, None) for r in rs}
        for prev, cur in zip(rs, rs[1:]):
            assert cur.gap_days == cur.day - prev.day >= 1
            assert cur.prev_cnt == prev.cnt
        for r in rs:
            # RANGE framing: the trailing-7d count is the sum over observed
            # days in [day-6, day] — recompute from the per-day history
            expect = sum(
                hist[d][0] for d in range(r.day - 6, r.day + 1) if d in hist
            )
            assert r.cnt_7d == expect
            if r.gap_days > 6:
                checked_gap += 1
                assert r.cnt_7d == r.cnt  # window sees only itself
    assert checked_gap >= 0  # structure exercised; gap case corpus-dependent


def test_weekday_anova_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_weekday_anova"))


def test_weekday_anova_statistic_domain(spark):
    row = registry.get("op_weekday_anova").spark_fn(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert r.k_groups == 7 and r.n_days >= r.k_groups
    assert r.f_micros >= 0
    assert 0 <= r.eta2_micros <= 1_000_000  # variance share


def test_power_sample_size_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_power_sample_size"))


def test_power_sample_size_formula(spark, duck):
    import math

    rows = registry.get("op_power_sample_size").spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per event type
    moments = {
        t: (n, sx, sxx)
        for t, n, sx, sxx in duck.execute(
            """
      WITH u AS (SELECT event_type, user_id,
                        sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS x
                 FROM events GROUP BY 1, 2)
      SELECT event_type, count(*), sum(x), sum(x * x) FROM u GROUP BY 1
      """
        ).fetchall()
    }
    for r in rows:
        n, sx, sxx = moments[r.event_type]
        mean = sx / n
        var = sxx / n - mean * mean
        expect = math.ceil(7.848887 * 2.0 * var / (0.05 * mean) ** 2)
        assert r.n_users == n
        assert r.n_per_arm == expect
        assert r.n_per_arm > 0


def test_audience_overlap_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_audience_overlap"))


def test_audience_overlap_is_a_valid_jaccard_matrix(spark):
    rows = registry.get("op_audience_overlap").spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5, 2) type pairs
    for r in rows:
        assert r.type_a < r.type_b
        assert 0 <= r.n_both <= min(r.n_a, r.n_b)
        assert r.jaccard_micros == 1_000_000 * r.n_both // (
            r.n_a + r.n_b - r.n_both
        )
        assert 0 <= r.jaccard_micros < 1_000_000  # audiences differ


def test_heaps_curve_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("text_heaps_curve"))


def test_heaps_curve_is_cumulative_and_exhaustive(spark, duck):
    rows = sorted(
        registry.get("text_heaps_curve").spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert cur.docs_cum > prev.docs_cum
        assert cur.tokens_cum > prev.tokens_cum
        assert cur.vocab_cum >= prev.vocab_cum  # vocabulary never shrinks
    n_docs, n_tokens = duck.execute(
        "SELECT count(*), sum(len(string_split(text, ' '))) FROM documents"
    ).fetchone()
    n_grams = duck.execute(
        """
      SELECT count(DISTINCT g) FROM (
        SELECT unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                       for i in range(1, len(ws) - 1)]) AS g
        FROM (SELECT string_split(text, ' ') AS ws FROM documents))
      """
    ).fetchone()[0]
    last = rows[-1]
    # the final checkpoint is the whole corpus
    assert (last.docs_cum, last.tokens_cum, last.vocab_cum) == (
        n_docs,
        n_tokens,
        n_grams,
    )
    # sub-linear growth: second-half vocabulary gain < second-half token
    # share would imply saturation; just witness gain happens but slower
    mid = rows[len(rows) // 2 - 1]
    assert last.vocab_cum > mid.vocab_cum
    assert (last.vocab_cum - mid.vocab_cum) * last.tokens_cum < last.vocab_cum * (
        last.tokens_cum - mid.tokens_cum
    ) * 2  # growth rate is sub-linear-ish, not super-linear blow-up


def test_class_separation_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("sim_class_separation"))


def test_class_separation_covers_all_labels(spark, duck):
    rows = registry.get("sim_class_separation").spark_fn(spark, SF_DIR).collect()
    per_label = dict(
        duck.execute("SELECT label, count(*) FROM embeddings GROUP BY label").fetchall()
    )
    assert {r.label: r.n for r in rows} == per_label
    for r in rows:
        assert r.within_d2_mean > 0 and r.between_d2 >= 0
        assert r.fisher_micros == 1_000_000 * r.between_d2 // r.within_d2_mean


def test_uncertainty_sampling_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_uncertainty_sampling"))


def test_uncertainty_batch_is_the_margin_minimum(spark):
    rows = sorted(
        registry.get("pipeline_uncertainty_sampling")
        .spark_fn(spark, SF_DIR)
        .collect(),
        key=lambda r: r.rnk,
    )
    assert [r.rnk for r in rows] == list(range(1, 21))
    margins = [(r.margin_d2, r.vec_id) for r in rows]
    assert margins == sorted(margins)  # declared total order
    assert all(r.margin_d2 >= 0 for r in rows)
    # ambiguity correlates with the confusion matrix: the selected batch
    # must contain misclassified vectors (pred != label) — if the 20 most
    # ambiguous points were all correct, the margin criterion is broken
    assert any(r.pred_label != r.label for r in rows)


def test_degree_assortativity_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_degree_assortativity"))


def test_degree_assortativity_domain(spark, duck):
    row = registry.get("op_degree_assortativity").spark_fn(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert -1_000_000 <= r.assortativity_micros <= 1_000_000
    n_undirected = duck.execute(
        """
      SELECT count(*) FROM (
        SELECT a.l_partkey, b.l_partkey
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2)
      """
    ).fetchone()[0]
    assert r.n_directed_edges == 2 * n_undirected


def test_io_roundtrip_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("rel_io_roundtrip"))


def test_io_roundtrip_formats_agree_bytewise(spark, duck):
    rows = registry.get("rel_io_roundtrip").spark_fn(spark, SF_DIR).collect()
    assert {r.fmt for r in rows} == {"jsonl", "orc", "csv"}
    n_rows, chars, checksum = duck.execute(
        "SELECT count(*), sum(length(text)), sum(doc_id * n_chars)"
        " FROM documents"
    ).fetchone()
    for r in rows:
        # every format reproduces the parquet source exactly
        assert (r.n_rows, r.char_total, r.id_checksum) == (n_rows, chars, checksum)


def test_rec_coverage_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("op_rec_coverage"))


def test_rec_coverage_census_identities(spark):
    row = registry.get("op_rec_coverage").spark_fn(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    # connectable ⊆ purchased ⊆ catalog; cold start is the complement
    assert 0 < r.n_connectable <= r.n_purchased <= r.n_catalog
    assert r.n_cold_start == r.n_catalog - r.n_connectable
    assert r.coverage_micros == 1_000_000 * r.n_connectable // r.n_catalog


def test_register_views_invalidates_on_sf_switch(spark, duck):
    """Regression: a session that runs one view-based entry at ANOTHER
    sf_dir must not leave later same-session callers reading that other
    corpus (the r7 full-suite failure: text_winnowing's sf0.01 witness
    poisoned the seven register_views-based TPC-H queries at sf0.001)."""
    from qpmodel_spark.catalog import register_views

    # pick an "other" sf that differs from whatever SF_DIR is configured
    other_sf = (
        "/root/testdata/sf0.01"
        if SF_DIR.rstrip("/") != "/root/testdata/sf0.01"
        else "/root/testdata/sf0.001"
    )
    register_views(spark, SF_DIR)
    base = spark.sql("SELECT count(*) AS c FROM lineitem").collect()[0].c
    register_views(spark, other_sf)
    other = spark.sql("SELECT count(*) AS c FROM lineitem").collect()[0].c
    assert other != base  # the switch is real
    register_views(spark, SF_DIR)  # must re-register, not trust the cache
    back = spark.sql("SELECT count(*) AS c FROM lineitem").collect()[0].c
    assert back == base
    # and the register_views-based q15 now matches its oracle again
    assert_matches_oracle(spark, duck, registry.get("q15"))


def test_rendezvous_shards_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, registry.get("pipeline_rendezvous_shards"))


def test_rendezvous_movement_is_minimal_and_mod_is_not(spark, duck):
    row = registry.get("pipeline_rendezvous_shards").spark_fn(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert r.max_load >= r.min_load > 0
    assert r.balance_micros == 1_000_000 * r.min_load // r.max_load
    # the consistent-hashing guarantee: rendezvous moves far fewer docs
    # than mod when growing 8 -> 9 (expected ~1/9 vs ~8/9)
    assert r.n_moved_rdv * 3 < r.n_moved_mod
    assert r.n_moved_rdv <= r.n_docs // 4  # well under a quarter moves
    assert r.n_moved_mod >= r.n_docs // 2  # mod reshuffles most of the corpus
