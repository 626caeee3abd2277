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
# Round-7 window: the 19-entry never-driver-green agg_* block promoted
# to the front (per the r6 verdict: official driver rows retire the
# family the r6 truncation incident touched), followed by the next 31
# never-driver-green entries in registry order (ML/text/eval/graph/
# time-series/privacy tiers from the r5/r6 sessions).  The remaining 43
# backlog entries (scan/sink/maintenance + win_*/fn_*/set_*/join/sql
# families) are reserved for the r8 window, closing the ledger 324/324.
_WINDOW_HEAD = [
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
