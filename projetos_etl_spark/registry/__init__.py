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
# asserted by tests/test_freshness.py: (1) the 15 entries the r10
# ragged-family closure touched — every exact-tier embedding consumer
# gained the fold-NULL-mirroring sql_cosine oracle (registry/_sqlvec.py)
# or a well_formed exclusion gate, emb_norm_outlier_audit additionally
# grew an n_malformed column, and the trained tiers/PCA got the
# NULL-element class added to well_formed (r9 ADVICE) — then (2) the
# stalest entries by artifact-derived age: all 28 remaining r2-vintage
# rows and the 7 oldest r3-vintage rows.
_WINDOW_HEAD = [
    # (1) touched by the r10 ragged-embedding hardening (15)
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
    # (2) stalest by artifact-derived age (35: 28 r2-vintage + 7 r3)
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
