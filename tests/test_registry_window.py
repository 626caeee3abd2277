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

# The r5 window: the 13 r3 events-ts casualties (driver re-green), then
# the first 37 never-driver-windowed entries (COVERAGE.md ledger).
R5_WINDOW = [
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


def test_driver_window_matches_coverage_plan():
    assert len(R5_WINDOW) == 50
    got = list(all_queries())[: len(R5_WINDOW)]
    assert got == R5_WINDOW, (
        "The first-50 verification window shifted. The window is the "
        "explicit registry.__init__._WINDOW_HEAD list; if you changed it, "
        "update this pin AND COVERAGE.md's ledger deliberately."
    )


def test_window_head_is_the_pin():
    # _WINDOW_HEAD and this pin must be the same list; divergence means a
    # half-finished rotation commit.
    assert _WINDOW_HEAD == R5_WINDOW


def test_no_window_name_collisions():
    names = list(all_queries())
    assert len(names) == len(set(names))
