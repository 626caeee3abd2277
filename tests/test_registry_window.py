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

# The r11 window: the 33 touched entries first — the 19 the r10
# overflow rule deferred (their code changed in r10 but their official
# rows predate it; plan_overflow, VERDICT r10 item 1 of "What's
# missing"), the two r11 ADVICE fixes (agg_collect_sorted's
# positionless-user NULL digest, win_rolling_distinct_unbounded's
# NULL-type gate), and the five entries the strengthened sf_nullkeys
# axis caught (untyped-group tier joins in both distinct rollups,
# eval_auc_roc's unlabeled negatives, stream_sliding_topk's tie-break,
# text_keyness_g2's unattributed-document subcorpus), and the seven
# family-eight entries the new sf_nullcats axis caught (SCALE.md
# round 11) — then the 17 stalest remaining entries by
# artifact-derived age
# (all r2-vintage TPC-H / source entries).
R11_WINDOW = [
    "agg_collect_sorted",
    "agg_hll_sketch_rollup",
    "agg_percentile_approx",
    "anomaly_zscore_rolling",
    "bitmap_distinct_rollup",
    "emb_pca_top_component",
    "emb_quantize_int8",
    "eval_auc_roc",
    "feat_hashing_trick",
    "fn_surrogate_key",
    "fn_variant_extract",
    "join_asof_events",
    "join_asof_forward",
    "join_asof_nearest",
    "join_asof_tolerance",
    "join_bucketed_no_shuffle",
    "ml_kmeans_lloyd",
    "ml_knn_classify",
    "q12_priority_pivot",
    "scd2_dimension_upsert",
    "sim_search_ivf",
    "sim_search_ivf_pq",
    "sim_search_lsh_bucketed",
    "sim_search_pq_adc",
    "sim_search_topk",
    "stream_sliding_topk",
    "stream_upsert_tablelog",
    "text_keyness_g2",
    "ts_ohlc_bars",
    "udf_scalar",
    "unpivot_melt",
    "win_rolling_distinct_unbounded",
    "win_rolling_median",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q14_promo_revenue",
    "q16_supplier_count",
    "q19_disjunctive_join",
    "q22_idle_balance",
    "q2_min_price_supplier",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q21_sole_supplier",
    "q17_small_quantity_revenue",
    "q20_concentrated_suppliers",
    "cdc_apply_changes",
]

def test_driver_window_matches_coverage_plan():
    assert len(R11_WINDOW) == 50
    got = list(all_queries())[: len(R11_WINDOW)]
    assert got == R11_WINDOW, (
        "The first-50 verification window shifted. The window is the "
        "explicit registry.__init__._WINDOW_HEAD list; if you changed it, "
        "update this pin AND COVERAGE.md's ledger deliberately."
    )


def test_window_head_is_the_pin():
    # _WINDOW_HEAD and this pin must be the same list; divergence means a
    # half-finished rotation commit.
    assert _WINDOW_HEAD == R11_WINDOW


def test_no_window_name_collisions():
    names = list(all_queries())
    assert len(names) == len(set(names))
