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
# asserted by tests/test_freshness.py: (1) the 40 entries the r10
# hostile-family closures touched — the ragged-embedding family
# (well_formed gained the NULL-element class, exact-tier oracles moved
# to the fold-mirroring sql_cosine), the non-finite-numerics family
# (functions/finite.py gates on 13 value consumers), the hostile-text
# family (try_divide ratio metrics, exact CSV round-trip), the
# hostile-events family (json_valid oracle gates, the (ts, event_id)
# OHLC anchor, spine span guards), and the hostile-relational family
# (sign-correct _brl currency rendering -> both medallion entries;
# the Z-order oracle's DuckDB bitwise-precedence fix) — then (2) the
# stalest entries by artifact-derived age: the 10 oldest r2-vintage
# rows. Rotated THREE times this round: the hostile-family hardening
# kept touching entries after each rotation, and freshness beats
# window stability (the suggester in tools/freshness.py
# --suggest-touched derived this list; two entries ride along from
# module-level import attribution, which over-verifies, never under-).
_WINDOW_HEAD = [
    # (1) touched by the r10 hostile-family closures (40)
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
    # (2) stalest by artifact-derived age (10 r2-vintage rows)
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
