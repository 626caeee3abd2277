"""Pin the driver verification window.

External correctness harnesses verify the FIRST 50 ``queries()`` entries
in registry insertion order per round; COVERAGE.md's ledger plans which
never-verified entries each round's window covers.  From round 5 the
window is the EXPLICIT name list ``registry.__init__._WINDOW_HEAD``,
promoted to the front of the merged registry — so adding entries to any
family module can no longer shift the window.  This test pins the
current round's window to the documented plan so any accidental edit of
``_WINDOW_HEAD`` (or a build() regression) fails CI with an explanation.

When the rotation is INTENTIONALLY changed at a round boundary,
regenerate this pinned list and update COVERAGE.md's ledger in the same
commit as ``_WINDOW_HEAD``.
"""

from __future__ import annotations

from projetos_etl_spark.registry import _WINDOW_HEAD, all_queries

# The r8 window: the final 45 never-driver-green backlog entries in
# registry order (COVERAGE.md "r8 remaining backlog" row — closing the
# cumulative official driver ledger at 326/326), then 5 re-verifications
# of guard-touched entries whose official driver rows predate the r7
# ANSI degenerate-input hardening.
R8_WINDOW = [
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
    "feat_target_encode_loo",
    "feat_scale_normalize",
    "emb_quantize_int8",
    "anomaly_zscore_rolling",
    "sim_search_topk",
]

def test_driver_window_matches_coverage_plan():
    assert len(R8_WINDOW) == 50
    got = list(all_queries())[: len(R8_WINDOW)]
    assert got == R8_WINDOW, (
        "The first-50 verification window shifted. The window is the "
        "explicit registry.__init__._WINDOW_HEAD list; if you changed it, "
        "update this pin AND COVERAGE.md's ledger deliberately."
    )


def test_window_head_is_the_pin():
    # _WINDOW_HEAD and this pin must be the same list; divergence means a
    # half-finished rotation commit.
    assert _WINDOW_HEAD == R8_WINDOW


def test_no_window_name_collisions():
    names = list(all_queries())
    assert len(names) == len(set(names))
