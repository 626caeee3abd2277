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

# The r7 window: the 19 never-driver-green agg_* entries promoted to the
# front, then 29 more never-driver-green entries in registry order, then
# the two r7-session scale twins (win_ntile_scale /
# win_max_concurrency_scale) so their first official driver rows land
# the round they were built (COVERAGE.md ledger); the remaining 45
# backlog entries fit exactly one r8 window.
R7_WINDOW = [
    "agg_markov_transitions",
    "agg_count_distinct_approx",
    "agg_percentile_approx",
    "agg_approx_top_k",
    "agg_filter_clause",
    "agg_listagg_sorted",
    "agg_mean_family",
    "agg_bitwise",
    "agg_weighted_median",
    "agg_grouping_id",
    "agg_moments_family",
    "agg_pareto_concentration",
    "agg_trimmed_mean",
    "agg_gini_coefficient",
    "agg_histogram_2d",
    "agg_corr_matrix",
    "agg_count_min_sketch",
    "agg_linear_regression",
    "agg_percentile_cont_multi",
    "agg_boolean_family",
    "stream_upsert_tablelog",
    "ml_knn_classify",
    "ml_naive_bayes_train",
    "text_readability_score",
    "tokenizer_vocab_coverage",
    "corpus_kneser_ney_bigram",
    "text_keyness_g2",
    "eval_heldout_perplexity",
    "corpus_span_corruption",
    "multimodal_webdataset_manifest",
    "graph_label_propagation",
    "graph_jaccard_link_prediction",
    "graph_kcore_decomposition",
    "dedup_url_canonical",
    "ts_seasonal_naive_error",
    "text_zipf_fit",
    "quality_parquet_stats_audit",
    "ml_logreg_gd",
    "quality_chisq_categorical_drift",
    "ts_run_length_encode",
    "privacy_noisy_count_laplace",
    "eval_auc_roc",
    "ts_ewma_anomaly",
    "privacy_generalize_to_k",
    "ml_ridge_regression_normal_eq",
    "eval_calibration_bins",
    "ts_stl_decompose",
    "quality_join_skew_audit",
    "win_ntile_scale",
    "win_max_concurrency_scale",
]

def test_driver_window_matches_coverage_plan():
    assert len(R7_WINDOW) == 50
    got = list(all_queries())[: len(R7_WINDOW)]
    assert got == R7_WINDOW, (
        "The first-50 verification window shifted. The window is the "
        "explicit registry.__init__._WINDOW_HEAD list; if you changed it, "
        "update this pin AND COVERAGE.md's ledger deliberately."
    )


def test_window_head_is_the_pin():
    # _WINDOW_HEAD and this pin must be the same list; divergence means a
    # half-finished rotation commit.
    assert _WINDOW_HEAD == R7_WINDOW


def test_no_window_name_collisions():
    names = list(all_queries())
    assert len(names) == len(set(names))
