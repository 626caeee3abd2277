"""Pin the driver verification window.

External correctness harnesses verify the FIRST 50 ``queries()`` entries
in registry insertion order per round; COVERAGE.md's ledger plans which
never-verified entries each round's window covers.  From round 5 the
window is the EXPLICIT name list ``registry.__init__._WINDOW_HEAD``,
promoted to the front of the merged registry — so adding entries to any
family module can no longer shift the window.  This test pins the
current round's window to the documented plan so any accidental edit of
``_WINDOW_HEAD`` (or a build() regression) fails CI with an explanation.

When the rotation is INTENTIONALLY changed at a round boundary,
regenerate this pinned list and update COVERAGE.md's ledger in the same
commit as ``_WINDOW_HEAD``.
"""

from __future__ import annotations

from projetos_etl_spark.registry import _WINDOW_HEAD, all_queries

# The r6 window: the next 47 never-driver-green entries in registry
# order + the 3 late-r5-snapshot entries (COVERAGE.md ledger).
R6_WINDOW = [
    "stream_sliding_topk",
    "stream_session_close_stateful",
    "sim_search_ivf",
    "sim_search_lsh_bucketed",
    "sim_search_pq_adc",
    "sim_search_ivf_pq",
    "emb_pca_top_component",
    "eval_ndcg_at_k",
    "sim_hard_negative_mining",
    "ml_kmeans_lloyd",
    "emb_norm_outlier_audit",
    "text_langid",
    "text_bigram_pmi",
    "text_bpe_merge_step",
    "eval_precision_recall_f1",
    "corpus_temperature_mix",
    "pipeline_span_dedup",
    "graph_bipartite_projection",
    "dedup_exact_keep_best",
    "feat_hashing_trick",
    "quality_expectation_suite",
    "incremental_var_merge",
    "join_interval_overlap",
    "quality_benford_audit",
    "ts_autocorr_lag",
    "ts_ohlc_bars",
    "quality_entropy_profile",
    "ts_week_over_week",
    "corpus_domain_cap",
    "pipeline_quality_gate_fused",
    "quality_outlier_mad",
    "sample_weighted_reservoir",
    "quality_table_checksum",
    "multimodal_dedup_phash",
    "privacy_k_anonymity_audit",
    "quality_freshness_sla",
    "quality_join_cardinality_forecast",
    "quality_table_reconcile",
    "quality_pk_uniqueness_audit",
    "emb_matryoshka_overlap",
    "quality_ks_two_sample",
    "ts_business_days_to_ship",
    "sample_poisson_bootstrap",
    "privacy_l_diversity_audit",
    "feat_woe_encoding",
    "ts_changepoint_cusum",
    "feat_impute_missing",
    "ml_decision_stump",
    "privacy_t_closeness_audit",
    "quality_js_divergence",
]


def test_driver_window_matches_coverage_plan():
    assert len(R6_WINDOW) == 50
    got = list(all_queries())[: len(R6_WINDOW)]
    assert got == R6_WINDOW, (
        "The first-50 verification window shifted. The window is the "
        "explicit registry.__init__._WINDOW_HEAD list; if you changed it, "
        "update this pin AND COVERAGE.md's ledger deliberately."
    )


def test_window_head_is_the_pin():
    # _WINDOW_HEAD and this pin must be the same list; divergence means a
    # half-finished rotation commit.
    assert _WINDOW_HEAD == R6_WINDOW


def test_no_window_name_collisions():
    names = list(all_queries())
    assert len(names) == len(set(names))
