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

# The r10 window: 40 entries touched by the r10 hostile-family
# closures (ragged embeddings, non-finite numerics, hostile text,
# hostile events, hostile relational — the last adding the two
# medallion entries via the sign-correct _brl renderer and the Z-order
# maintenance audit via its oracle's bitwise-precedence fix), then the
# 10 stalest entries by artifact-derived age (r2-vintage rows).
R10_WINDOW = [
    "anomaly_zscore_rolling",
    "dedup_embedding_cosine",
    "emb_matryoshka_overlap",
    "emb_norm_outlier_audit",
    "emb_pca_top_component",
    "emb_quantize_int8",
    "eval_ndcg_at_k",
    "feat_impute_missing",
    "fn_json_extract",
    "fn_variant_extract",
    "incremental_var_merge",
    "join_bucketed_no_shuffle",
    "maintenance_zorder_stats",
    "medallion_gold_profit_mart",
    "medallion_silver_conform",
    "ml_kmeans_lloyd",
    "ml_knn_classify",
    "pipeline_quality_gate_fused",
    "scan_csv_multiline_quoted",
    "sim_hard_negative_mining",
    "sim_range_search",
    "sim_search_ivf",
    "sim_search_ivf_pq",
    "sim_search_lsh_bucketed",
    "sim_search_pq_adc",
    "sim_search_topk",
    "stream_custom_stateful_profile",
    "stream_tumbling_count",
    "stream_upsert_tablelog",
    "text_quality_score",
    "text_tokens_bpe_regex",
    "ts_autocorr_lag",
    "ts_interpolate_linear",
    "ts_ohlc_bars",
    "ts_resample_ffill",
    "ts_stl_decompose",
    "udaf_grouped",
    "udf_scalar",
    "win_rank_topk_per_group",
    "win_rolling_median",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_pivot",
    "q14_promo_revenue",
    "q16_supplier_count",
    "q19_disjunctive_join",
    "q22_idle_balance",
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
