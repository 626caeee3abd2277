"""Master query registry: merges every family module.

``__spark_entry__.py`` (the driver contract) delegates here. Family
modules are imported lazily inside :func:`all_queries` so an optional
dependency failing in one family can't take down the whole registry.
"""

from __future__ import annotations

from projetos_etl_spark.registry._core import QueryFn, Registry

# Family order drives registry insertion order, which in turn is the order
# external verification harnesses iterate ``queries()``.  Rounds 1-2 verified
# the relational/tpch/medallion/sources prefix; round 3 covered
# aggregates/windows/setops/scalars (+dedup_near_minhash); round 4 covered
# streams/similarity/text/corpus/multimodal/dedup[:7].  A per-entry ledger
# lives in COVERAGE.md ("Driver-coverage ledger").
_FAMILIES = [
    "streams",
    "similarity",
    "text",
    "corpus",
    "multimodal",
    "dedup",
    "prep",
    "sources",
    "aggregates",
    "windows",
    "scalars",
    "setops",
    "relational",
    "tpch_breadth",
    "medallion",
]

# The driver verifies the FIRST 50 ``queries()`` entries per round.  From
# round 5 on, the window is this EXPLICIT 50-name list, promoted to the
# front of the merged registry by :func:`build` — so adding entries to any
# family module can never silently shift the planned window (the r3/r4
# failure mode that family reordering alone couldn't fully prevent).
# Rotate this list (plus the pin in tests/test_registry_window.py and
# COVERAGE.md's ledger) in ONE commit at each round boundary.
#
# Round-10 window — derived by tools/freshness.py::plan_window(
# TOUCHED_R10, through=9) per the COVERAGE.md freshness policy and
# asserted by tests/test_freshness.py. The r10 hostile-family closures
# (ragged embeddings, non-finite numerics, hostile text, hostile
# events, hostile relational values, NULL keys — seven probe families)
# touched 69 entries, MORE than the 50-slot window: plan_window's
# overflow rule (r10) seats the 50 STALEST touched entries by the
# artifact-derived order and defers the 19 freshest-rowed
# (plan_overflow — they lead r11's touched list, documented in
# COVERAGE.md's r11 row). Rotated FOUR times this round: the
# hostile-family hardening kept touching entries after each rotation,
# and freshness beats window stability.
_WINDOW_HEAD = [
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

def build() -> Registry:
    import importlib

    master = Registry()
    for mod_name in _FAMILIES:
        mod = importlib.import_module(f"projetos_etl_spark.registry.{mod_name}")
        master.merge(mod.REG)
    # Promote the planned verification window to the front of iteration
    # order (dict order is the driver's window order).  Unknown names fail
    # loudly — a typo here would silently shrink the planned window.
    missing = [n for n in _WINDOW_HEAD if n not in master.queries]
    if missing:
        raise KeyError(f"_WINDOW_HEAD names not in registry: {missing}")
    head = {n: master.queries[n] for n in _WINDOW_HEAD}
    tail = {n: fn for n, fn in master.queries.items() if n not in head}
    master.queries = {**head, **tail}
    return master


def all_queries() -> dict[str, QueryFn]:
    return build().queries


def all_oracle_sql() -> dict[str, str]:
    return build().oracle
