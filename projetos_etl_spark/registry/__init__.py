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
# Round-8 window: the FINAL 45 never-driver-green backlog entries
# (scan/sink/maintenance + win_*/fn_*/set_*/join/sql families, in
# registry order — the exact list COVERAGE.md's "r8 remaining backlog"
# row planned and the r7 judge independently re-derived), closing the
# cumulative official driver ledger at 326/326.  The window holds 50;
# the 5 spare slots re-verify guard-touched entries whose official
# driver rows predate the r7 ANSI degenerate-input hardening
# (feat_target_encode_loo — the entry that actually crashed —
# feat_scale_normalize, emb_quantize_int8, anomaly_zscore_rolling, and
# sim_search_topk for the zero-vector cosine convention).
_WINDOW_HEAD = [
    "scan_xml",
    "scan_parquet_merge_schema",
    "sink_csv_roundtrip",
    "sink_pyds_jsonl",
    "maintenance_retention_sweep",
    "gen_date_dim",
    "obs_inline_metrics",
    "sink_dynamic_partition_overwrite",
    "scan_csv_multiline_quoted",
    "scan_time_travel",
    "table_log_merge_upsert",
    "maintenance_tablelog_vacuum",
    "win_gap_islands",
    "win_rolling_median",
    "win_time_range_frame",
    "win_skyline_frontier",
    "win_topk_with_ties",
    "win_percent_rank_cume_dist",
    "win_max_concurrency",
    "fn_try_arith",
    "fn_surrogate_key",
    "fn_variant_extract",
    "fn_regex_extract_all",
    "fn_collation_groupby",
    "fn_map_functions",
    "set_intersect_all",
    "set_except_all",
    "join_asof_tolerance",
    "join_null_safe",
    "join_scd2_point_in_time",
    "subquery_not_exists_vs_not_in",
    "join_bloom_prune",
    "sql_recursive_cte",
    "sql_pipe_syntax",
    "sql_declared_udf",
    "join_lateral_topk",
    "join_bucketed_no_shuffle",
    "join_asof_forward",
    "sql_star_except",
    "sql_group_by_all",
    "sql_lateral_column_alias",
    "sql_unpivot_syntax",
    "join_asof_nearest",
    "eval_adversarial_validation",
    "maintenance_compact_small_files",
    # 5 spare slots: guard-touched re-verifications (see comment above).
    "feat_target_encode_loo",
    "feat_scale_normalize",
    "emb_quantize_int8",
    "anomaly_zscore_rolling",
    "sim_search_topk",
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
