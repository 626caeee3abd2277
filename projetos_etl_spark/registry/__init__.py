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
# Round-9 window — the ledger closed at 326/326 in r8, so from r9 on
# every window is a RE-verification window under the policy codified in
# COVERAGE.md's header and DERIVED (not hand-listed) by
# tools/freshness.py::plan_window from the committed CORRECTNESS_r*.json
# artifacts: (1) entries whose code or oracle changed since their last
# green driver row, first — here the 27 entries touched by the r8
# degenerate-input hardening whose official rows predate those fixes,
# plus maintenance_compact_small_files (its oracle stopped pinning the
# empty-table file count in r9, per the r8 ADVICE) — then (2) the
# stalest remaining entries by artifact-derived age: the 2 r1-vintage
# rows and the 20 oldest r2-vintage rows.  tests/test_freshness.py
# asserts this list equals the derivation, so a drifted rotation fails
# CI instead of relying on hand-maintained prose.
_WINDOW_HEAD = [
    # (1) touched since their last green row (28)
    "agg_cube",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_grouping_id",
    "agg_corr_matrix",
    "emb_pca_top_component",
    "eval_auc_roc",
    "eval_calibration_bins",
    "incremental_agg_merge",
    "ml_kmeans_lloyd",
    "ml_logreg_gd",
    "multimodal_decode_features",
    "multimodal_transcode_roundtrip",
    "quality_chisq_categorical_drift",
    "quality_entropy_profile",
    "quality_parquet_stats_audit",
    "sample_poisson_bootstrap",
    "scan_jdbc_roundtrip",
    "sim_search_ivf",
    "sim_search_ivf_pq",
    "sim_search_lsh_bucketed",
    "sim_search_pq_adc",
    "sink_partitioned_prune",
    "stream_upsert_tablelog",
    "ts_ohlc_bars",
    "udf_scalar",
    "udtf_chunk_lateral",
    "maintenance_compact_small_files",
    # (2) stalest by artifact-derived age (22: r1 vintage then r2)
    "catalog_ddl_roundtrip",
    "scan_csv_badrecords",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "filter_pred",
    "project_rename",
    "join_inner_hash",
    "join_left",
    "join_semi",
    "join_anti",
    "join_broadcast",
    "join_theta_range",
    "join_asof_events",
    "q10_returned_items",
    "q18_large_orders",
    "subquery_scalar",
    "subquery_correlated",
    "join_salted_skew",
    "gold_sales_mart",
    "sql_gateway_report",
    "join_full_outer",
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
