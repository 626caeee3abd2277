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

# The r10 window: 15 entries touched by the r10 ragged-embedding
# hardening (well_formed gained the NULL-element class, the exact-tier
# consumer oracles moved to the fold-NULL-mirroring sql_cosine,
# emb_quantize_int8 adopted the well-formed corpus contract,
# emb_norm_outlier_audit grew n_malformed), then the 35 stalest entries
# by artifact-derived age (all 28 remaining r2-vintage rows + the 7
# oldest r3-vintage rows).
R10_WINDOW = [
    "sim_search_ivf",
    "sim_search_pq_adc",
    "sim_search_ivf_pq",
    "emb_pca_top_component",
    "sim_search_topk",
    "sim_search_lsh_bucketed",
    "eval_ndcg_at_k",
    "ml_knn_classify",
    "sim_hard_negative_mining",
    "emb_norm_outlier_audit",
    "emb_quantize_int8",
    "ml_kmeans_lloyd",
    "dedup_embedding_cosine",
    "sim_range_search",
    "emb_matryoshka_overlap",
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
    "q2_min_price_supplier",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q21_sole_supplier",
    "q17_small_quantity_revenue",
    "q20_concentrated_suppliers",
    "medallion_silver_conform",
    "medallion_gold_profit_mart",
    "scd2_dimension_upsert",
    "cdc_apply_changes",
    "scan_parquet",
    "scan_csv_schema",
    "source_http",
    "source_http_datasource",
    "scan_excel",
    "scan_json_lines",
    "scan_orc_roundtrip",
    "agg_distinct",
    "agg_stats",
    "agg_pivot",
    "agg_percentiles",
    "agg_histogram",
    "agg_mode_deterministic",
    "agg_argmax",
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
