"""Round-11 second-wave operator contracts: the four frontier queries
added after the driver-window rotation (z-order zone maps, encoding
statistics, embedding uniformity, token-budget epoch plan).

Each test pins the INVARIANT the query's report claims, not just
non-emptiness — e.g. the z-order layout must actually out-skip the
linear layout on the pinned probe, and the uniformity statistic must
sit in its analytic range.
"""

import math

import pytest

from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir).collect()


def test_zorder_out_skips_linear(spark, sf_dir):
    rows = _rows(spark, sf_dir, "zorder_clustering_report")
    by_layout = {}
    for r in rows:
        by_layout.setdefault(r.layout, []).append(r)
    assert set(by_layout) == {"zorder", "linear"}
    # every row's zone map is internally consistent
    for r in rows:
        assert 0 <= r.k1_min <= r.k1_max <= 15
        assert 0 <= r.k2_min <= r.k2_max <= 11
        assert r.n_rows > 0
    # the whole point: for a probe on the SECOND dimension (k2 = 7),
    # the linear layout's zone maps bound nothing (every file spans
    # the full k2 domain -> zero skips) while the z-ordered layout
    # skips the files whose interleaved k2 window excludes the probe.
    zo_skipped = sum(1 for r in by_layout["zorder"] if r.skip_probe_k2)
    lin_skipped = sum(1 for r in by_layout["linear"] if r.skip_probe_k2)
    assert lin_skipped == 0
    assert zo_skipped > len(by_layout["zorder"]) // 2
    full_k2 = [
        r for r in by_layout["linear"] if r.k2_min == 0 and r.k2_max == 11
    ]
    assert len(full_k2) == len(by_layout["linear"])


def test_zorder_row_conservation(spark, sf_dir):
    rows = _rows(spark, sf_dir, "zorder_clustering_report")
    per_layout = {}
    for r in rows:
        per_layout[r.layout] = per_layout.get(r.layout, 0) + r.n_rows
    # both layouts partition the SAME table: identical row totals
    assert per_layout["zorder"] == per_layout["linear"]


def test_encoding_report_invariants(spark, sf_dir):
    rows = {r.col: r for r in _rows(spark, sf_dir, "encoding_efficiency_report")}
    assert set(rows) == {"event_type", "ts"}
    t = rows["event_type"]
    # runs can never exceed rows, and a dict index needs exactly
    # ceil(log2(ndv)) bits for ndv > 1 (binary-length recipe)
    assert 1 <= t.n_runs <= t.n
    assert t.dict_index_bits == len(bin(t.ndv - 1)) - 2
    assert t.delta_bits is None
    ts = rows["ts"]
    assert ts.ndv <= ts.n
    assert ts.delta_bits is not None and ts.delta_bits > 0
    # timestamps within a user are near-unique -> runs_ratio ~ 1
    assert ts.runs_ratio > 0.9


def test_uniformity_in_analytic_range(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "embedding_uniformity_report")
    # uniformity = ln E[exp(4(cos-1))] with cos in [-1, 1] is bounded
    # by [-8, 0]; mean_sq_cos in [0, 1]; pair count is ~N*(N/B - 1)/2
    assert -8.0 <= r.uniformity <= 0.0
    assert -1.0 <= r.mean_cos <= 1.0
    assert 0.0 <= r.mean_sq_cos <= 1.0
    assert r.n_pairs > 0 and r.n_buckets >= 1
    # E[cos^2] >= E[cos]^2 (Jensen) — catches a broken fixed-point sum
    assert r.mean_sq_cos + 1e-9 >= r.mean_cos * r.mean_cos


def test_uniformity_pair_sample_is_linear(spark, sf_dir):
    """The md5-bucket pair sample must stay ~64·N, not N²/2."""
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog

    n = Catalog(spark, sf_dir).embeddings.count()
    (r,) = _rows(spark, sf_dir, "embedding_uniformity_report")
    b = max(1, n // 64)
    if b == 1:
        assert r.n_pairs == n * (n - 1) // 2
    else:
        # expected pairs ~ B * (N/B choose 2) = N(N/B - 1)/2; allow 3x
        # slack for bucket-size variance at small N
        assert r.n_pairs <= 3 * n * (n // b) // 2


def test_epoch_plan_budget_accounting(spark, sf_dir):
    rows = _rows(spark, sf_dir, "epoch_plan_token_budget")
    assert len(rows) >= 2  # documents span multiple sources
    total_tokens = sum(r.n_tokens for r in rows)
    # weights sum to 1 (within round(6) dust)
    assert math.isclose(sum(r.weight for r in rows), 1.0, abs_tol=1e-4)
    # floor(target) sums to <= budget and within |sources| of it
    budget = 2.0 * total_tokens
    tgt = sum(r.target_tokens for r in rows)
    assert tgt <= budget
    assert budget - tgt < len(rows) + 1
    for r in rows:
        # epochs = (unfloored) target / available: bracket it with the
        # floored target_tokens on both sides
        assert (
            r.target_tokens / r.n_tokens
            <= r.epochs + 1e-6
            <= (r.target_tokens + 1) / r.n_tokens + 2e-6
        )
        assert r.repeat_risk == (r.epochs > 4.0)


def test_epoch_plan_temperature_favors_small_sources(spark, sf_dir):
    """alpha = 0.5 upweights small sources: epochs must be
    monotonically non-increasing in source size."""
    rows = sorted(
        _rows(spark, sf_dir, "epoch_plan_token_budget"),
        key=lambda r: r.n_tokens,
    )
    eps = [r.epochs for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(eps, eps[1:]))


def test_conformal_coverage_guarantee(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "conformal_interval_coverage")
    # split-conformal guarantees E[coverage] >= 1 - alpha; on a real
    # (exchangeable md5) split the empirical value should sit near 0.9
    # and never collapse
    assert 0.85 <= r.coverage <= 1.0
    assert r.q_hat > 0
    assert r.n_train > r.n_cal > 0 and r.n_test > 0
    # the splits partition lineitem
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog

    n = Catalog(spark, sf_dir).lineitem.count()
    assert r.n_train + r.n_cal + r.n_test == n


def test_silhouette_in_range(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "ivf_silhouette_quality")
    # argmax assignment makes a <= b, so s in [0, 1]
    assert 0.0 <= r.mean_silhouette <= 1.0
    assert 0.0 <= r.frac_boundary <= 1.0
    assert r.n_points > 0 and r.n_cells >= 4


def test_threshold_sweep_monotone(spark, sf_dir):
    rows = sorted(
        _rows(spark, sf_dir, "dedup_threshold_sweep"),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [0.3, 0.5, 0.7, 0.8, 0.9]
    # raising the threshold can only REMOVE pairs and dup docs
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_dup_docs >= b.n_dup_docs
    # the injected last-word mutants must survive at 0.8 (same
    # guarantee ngram_jaccard_pairs pins)
    assert rows[3].n_pairs > 0


def test_threshold_sweep_agrees_with_ngram_pairs(spark, sf_dir):
    """The 0.8 row must count exactly the ngram_jaccard_pairs result."""
    base = _rows(spark, sf_dir, "ngram_jaccard_pairs")
    rows = {r.threshold: r for r in _rows(spark, sf_dir, "dedup_threshold_sweep")}
    assert rows[0.8].n_pairs == len(base)
    assert rows[0.8].n_dup_docs == len({r.id2 for r in base})


def test_semantic_leakage_detects_planted_twins(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "cross_split_semantic_leakage")
    # every duplicated vector pairs with its source; splits are
    # independent hashes, so ~36% of twin pairs cross train<->eval
    assert r.n_pairs > 0
    assert 0 < r.n_cross_split_pairs <= r.n_pairs
    assert 0 <= r.n_eval_leaked <= r.n_eval_vectors
    assert abs(r.leak_frac - r.n_eval_leaked / r.n_eval_vectors) < 1e-5
    # the audit must see SOME leakage on this corpus (twins exist and
    # the split is independent of twin identity)
    assert r.n_eval_leaked > 0


def test_ensemble_votes_subset_of_detectors(spark, sf_dir):
    rows = _rows(spark, sf_dir, "anomaly_ensemble_votes")
    assert rows, "the heavy-tailed events corpus must surface ensemble hits"
    for r in rows:
        assert r.votes >= 2
        assert r.votes == int(r.z_flag) + int(r.iqr_flag) + int(r.mad_flag)
    # Rebuild the z detector at the ensemble's OWN grouping (type-only,
    # |z| >= 2.5 on the rounded score) and assert every surfaced row's
    # z_flag agrees with the independently-computed set — the subset
    # relationship this test's name promises (ADVICE r11: the old
    # z_ids check compared against the (user, type)-grouped flagship
    # and had decayed to a dead assertion).
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
    from climate_anomaly_bigdata_pipeline_spark.operators import anomaly as A

    ev = Catalog(spark, sf_dir).events.select(
        "event_id", "event_type", "value"
    )
    z_ids = {
        r.event_id
        for r in A.zscore_exact(
            ev, "value", ["event_type"], z_name="z"
        ).collect()
        if abs(r.z) >= 2.5
    }
    for r in rows:
        assert r.z_flag == (r.event_id in z_ids)
    assert any(r.z_flag for r in rows)


def test_backtest_shapes_and_bounds(spark, sf_dir):
    rows = {r.method: r for r in _rows(spark, sf_dir, "seasonal_naive_backtest")}
    assert set(rows) == {"naive", "seasonal_naive"}
    n, s = rows["naive"], rows["seasonal_naive"]
    # the 7-lag forecast is defined on 6 fewer days than the 1-lag
    assert n.n_days == s.n_days + 6
    for r in rows.values():
        assert r.mae > 0 and r.mape > 0


def test_edge_support_consistent_with_triangles(spark, sf_dir):
    """Sum of per-edge support = 3x the triangle count (each triangle
    has exactly 3 edges); the cumulative column telescopes."""
    rows = sorted(
        _rows(spark, sf_dir, "edge_support_profile"), key=lambda r: r.support
    )
    assert rows and rows[0].support >= 0
    total_support = sum(r.support * r.n_edges for r in rows)
    tri = QUERIES["triangle_parts_copurchase"](spark, sf_dir).collect()
    n_triangles = sum(r.n_triangles for r in tri) // 3  # node-sum = 3x tris
    assert total_support == 3 * n_triangles
    # cumulative column: at the smallest support it covers ALL edges
    assert rows[0].n_edges_at_least == sum(r.n_edges for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a.n_edges_at_least == b.n_edges_at_least + a.n_edges


def test_dirichlet_vs_bm25_rankings_correlate(spark, sf_dir):
    """Both scorers answer the same 3-term query; their top-20 sets
    should overlap substantially but need not match (the LM background
    mass reorders docs BM25 ties)."""
    ql = [r.doc_id for r in _rows(spark, sf_dir, "dirichlet_lm_topk_docs")]
    bm = [r.doc_id for r in QUERIES["bm25_topk_docs"](spark, sf_dir).collect()]
    assert len(ql) == len(bm) == 20
    assert len(set(ql) & set(bm)) >= 5
    # query-likelihoods are log-probabilities: strictly negative
    scores = [r.ql_score for r in _rows(spark, sf_dir, "dirichlet_lm_topk_docs")]
    assert all(s < 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_hll_sweep_certificates(spark, sf_dir):
    rows = _rows(spark, sf_dir, "hll_rsd_sweep")
    assert [r.rsd for r in rows] == [0.01, 0.02, 0.05]
    exact = {r.exact_users for r in rows}
    assert len(exact) == 1 and exact.pop() > 0
    assert all(r.within_5rsd for r in rows)
