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
# Round-6 window: the first 47 never-driver-green entries in registry
# order (the r5-session additions: remaining similarity/ML tier incl.
# the 3 ANN tiers newly retired from rows-only, text/corpus tail, the
# graph/dedup survivors, and the prep quality/time-series/feature
# tiers), plus the 3 entries the r5 snapshot commit added after the
# closing battery (ml_decision_stump, privacy_t_closeness_audit,
# quality_js_divergence) so each gets an official driver row.
_WINDOW_HEAD = [
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
