"""Pin the driver verification window.

External correctness harnesses verify the FIRST 50 ``queries()`` entries
in registry insertion order per round; COVERAGE.md's ledger plans which
entries each round's window covers.  From round 5 the window is the
EXPLICIT name list ``registry.__init__._WINDOW_HEAD``, promoted to the
front of the merged registry — so adding entries to any family module
can no longer shift the window.  This test pins the current round's
window to the documented plan so any accidental edit of ``_WINDOW_HEAD``
(or a build() regression) fails CI with an explanation.

From round 9 the plan itself is DERIVED from the committed
CORRECTNESS_r*.json artifacts (tools/freshness.py) — see
tests/test_freshness.py, which asserts this pinned list equals the
policy derivation.  When the rotation is INTENTIONALLY changed at a
round boundary, regenerate this pinned list, the touched list in
test_freshness.py, and COVERAGE.md's ledger in the same commit as
``_WINDOW_HEAD``.
"""

from __future__ import annotations

from projetos_etl_spark.registry import _WINDOW_HEAD, all_queries

# The r9 window: the ledger closed 326/326 in r8, so this is the first
# pure RE-verification window — 28 entries whose code/oracle changed
# since their last green driver row (the r8 degenerate-input hardening
# set + maintenance_compact_small_files, whose oracle changed in r9),
# then the 22 stalest entries by artifact-derived age (r1/r2 vintage).
R9_WINDOW = [
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

def test_driver_window_matches_coverage_plan():
    assert len(R9_WINDOW) == 50
    got = list(all_queries())[: len(R9_WINDOW)]
    assert got == R9_WINDOW, (
        "The first-50 verification window shifted. The window is the "
        "explicit registry.__init__._WINDOW_HEAD list; if you changed it, "
        "update this pin AND COVERAGE.md's ledger deliberately."
    )


def test_window_head_is_the_pin():
    # _WINDOW_HEAD and this pin must be the same list; divergence means a
    # half-finished rotation commit.
    assert _WINDOW_HEAD == R9_WINDOW


def test_no_window_name_collisions():
    names = list(all_queries())
    assert len(names) == len(set(names))
