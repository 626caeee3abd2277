"""Pin the driver verification window.

External correctness harnesses verify the FIRST 50 ``queries()`` entries
in registry insertion order per round; COVERAGE.md's ledger plans which
entries each round's window covers.  From round 5 the window is the
EXPLICIT name list ``registry.__init__._WINDOW_HEAD``, promoted to the
front of the merged registry — so adding entries to any family module
can no longer shift the window.  This test pins the current round's
window to the documented plan so any accidental edit of ``_WINDOW_HEAD``
(or a build() regression) fails CI with an explanation.

From round 9 the plan itself is DERIVED from the committed
CORRECTNESS_r*.json artifacts (tools/freshness.py) — see
tests/test_freshness.py, which asserts this pinned list equals the
policy derivation.  When the rotation is INTENTIONALLY changed at a
round boundary, regenerate this pinned list, the touched list in
test_freshness.py, and COVERAGE.md's ledger in the same commit as
``_WINDOW_HEAD``.
"""

from __future__ import annotations

from projetos_etl_spark.registry import _WINDOW_HEAD, all_queries

# The r10 window: the seven hostile-family closures touched 69 entries
# — more than the window holds — so this is the OVERFLOW form: the 50
# stalest touched entries by artifact-derived order (plan_window's r10
# overflow rule); the 19 deferred lead r11's touched list
# (plan_overflow, pinned in test_freshness.py).
R10_WINDOW = [
    "medallion_silver_conform",
    "medallion_gold_profit_mart",
    "win_rank_topk_per_group",
    "stream_tumbling_count",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_custom_stateful_profile",
    "stream_stream_left_outer_join",
    "text_quality_score",
    "text_tokens_bpe_regex",
    "dedup_embedding_cosine",
    "agg_collect_sorted",
    "win_lag_delta",
    "win_moving_avg_frame",
    "sessionize_events",
    "win_rolling_distinct",
    "win_rolling_distinct_unbounded",
    "fn_json_extract",
    "udaf_grouped",
    "graph_pagerank",
    "graph_degree_stats",
    "ts_resample_ffill",
    "ts_interpolate_linear",
    "quality_referential_integrity",
    "maintenance_zorder_stats",
    "sim_range_search",
    "stream_sliding_topk",
    "stream_session_close_stateful",
    "eval_ndcg_at_k",
    "sim_hard_negative_mining",
    "emb_norm_outlier_audit",
    "eval_precision_recall_f1",
    "graph_bipartite_projection",
    "incremental_var_merge",
    "ts_autocorr_lag",
    "ts_week_over_week",
    "pipeline_quality_gate_fused",
    "quality_table_checksum",
    "emb_matryoshka_overlap",
    "ts_changepoint_cusum",
    "feat_impute_missing",
    "agg_markov_transitions",
    "ml_knn_classify",
    "graph_label_propagation",
    "graph_jaccard_link_prediction",
    "graph_kcore_decomposition",
    "ts_ewma_anomaly",
    "ts_stl_decompose",
    "maintenance_retention_sweep",
    "scan_csv_multiline_quoted",
]

def test_driver_window_matches_coverage_plan():
    assert len(R10_WINDOW) == 50
    got = list(all_queries())[: len(R10_WINDOW)]
    assert got == R10_WINDOW, (
        "The first-50 verification window shifted. The window is the "
        "explicit registry.__init__._WINDOW_HEAD list; if you changed it, "
        "update this pin AND COVERAGE.md's ledger deliberately."
    )


def test_window_head_is_the_pin():
    # _WINDOW_HEAD and this pin must be the same list; divergence means a
    # half-finished rotation commit.
    assert _WINDOW_HEAD == R10_WINDOW


def test_no_window_name_collisions():
    names = list(all_queries())
    assert len(names) == len(set(names))
