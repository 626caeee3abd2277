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

# The r12 window: the 27 touched entries first — the r11 ADVICE
# closure and q12's citation, the four sf_nulls (NULL o_totalprice)
# catches, the three sf_ties (family nine) catches, and the sixteen
# finite-gate consumers family ten (sf_extremes) touched via
# functions/finite.py's MAG_CAP extension (eight diverged and were
# fixed directly; the rest changed semantics with the shared gate;
# the density-scaled rerun added scan_csv_badrecords) —
# then the 24 stalest remaining entries by artifact-derived age (the
# r2-vintage scan family and the r3-vintage agg/window tails).
R12_WINDOW = [
    "agg_argmax",
    "agg_percentile_approx",
    "agg_time_decayed_sum",
    "anomaly_zscore_rolling",
    "feat_impute_missing",
    "incremental_agg_merge",
    "incremental_var_merge",
    "ml_decision_stump",
    "q12_priority_pivot",
    "quality_ks_two_sample",
    "sample_poisson_bootstrap",
    "scan_csv_badrecords",
    "scan_parquet",
    "stream_custom_stateful_profile",
    "stream_session_window",
    "stream_static_join_enrich",
    "stream_upsert_tablelog",
    "ts_autocorr_lag",
    "ts_ewma_anomaly",
    "ts_interpolate_linear",
    "ts_resample_ffill",
    "ts_stl_decompose",
    "ts_week_over_week",
    "udaf_grouped",
    "win_ntile",
    "win_ntile_scale",
    "win_rolling_median",
    "scan_csv_schema",
    "source_http",
    "source_http_datasource",
    "scan_excel",
    "scan_json_lines",
    "scan_orc_roundtrip",
    "agg_distinct",
    "agg_stats",
    "agg_pivot",
    "agg_percentiles",
    "agg_histogram",
    "agg_mode_deterministic",
    "agg_corr_regression",
    "win_running_sum",
    "win_range_frame",
    "limit_topk",
    "sort_multi",
    "win_percent_dist",
    "win_first_last",
    "sort_paginate",
    "win_percentiles_rank",
    "set_union_all",
    "set_intersect",
]

def test_driver_window_matches_coverage_plan():
    assert len(R12_WINDOW) == 50
    got = list(all_queries())[: len(R12_WINDOW)]
    assert got == R12_WINDOW, (
        "The first-50 verification window shifted. The window is the "
        "explicit registry.__init__._WINDOW_HEAD list; if you changed it, "
        "update this pin AND COVERAGE.md's ledger deliberately."
    )


def test_window_head_is_the_pin():
    # _WINDOW_HEAD and this pin must be the same list; divergence means a
    # half-finished rotation commit.
    assert _WINDOW_HEAD == R12_WINDOW


def test_no_window_name_collisions():
    names = list(all_queries())
    assert len(names) == len(set(names))
