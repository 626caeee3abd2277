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
# Round-5 window: the 13 entries whose last driver row is the r3
# events-ts fixture error (all verified MATCH locally after the r4 fix —
# this clears the stale ``err`` rows from the driver ledger), then the
# first 37 never-driver-windowed entries in registry order (dedup tail,
# graph ops, time-series/quality/feature tiers from ``prep``).
_WINDOW_HEAD = [
    # -- r3 casualties awaiting driver re-green (13)
    "agg_collect_sorted",
    "agg_hll_sketch_rollup",
    "win_lag_delta",
    "win_moving_avg_frame",
    "sessionize_events",
    "win_rolling_distinct",
    "funnel_conversion",
    "cohort_retention",
    "win_rolling_distinct_unbounded",
    "fn_json_extract",
    "udf_pandas_vec",
    "udf_scalar",
    "udaf_grouped",
    # -- first-ever driver rows (37)
    "dedup_minhash_incremental",
    "dedup_lsh_bucket_stats",
    "er_blocking_join",
    "graph_pagerank",
    "dedup_ngram_containment",
    "dedup_minhash_verified",
    "er_blocking_multipass",
    "dedup_lsh_recall_eval",
    "graph_degree_stats",
    "dedup_simhash_hamming",
    "graph_triangle_count",
    "er_golden_record",
    "ts_resample_ffill",
    "quality_schema_profile",
    "ts_interpolate_linear",
    "quality_referential_integrity",
    "bitmap_distinct_rollup",
    "unpivot_melt",
    "split_train_test_hash",
    "join_spatial_grid_radius",
    "quality_outlier_iqr",
    "ts_gap_detect",
    "incremental_agg_merge",
    "agg_heavy_hitters",
    "corpus_resample_to_mix",
    "text_perplexity_bigram",
    "agg_time_decayed_sum",
    "quality_psi_drift",
    "text_normalize_dedup",
    "feat_quantile_bucketize",
    "feat_scale_normalize",
    "feat_target_encode_loo",
    "anomaly_zscore_rolling",
    "maintenance_zorder_stats",
    "corpus_shuffle_shards",
    "sim_range_search",
    "feat_onehot_topn",
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
