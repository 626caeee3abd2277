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
