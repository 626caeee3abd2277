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

# The r12 window: the 9 touched entries first — the r11 ADVICE closure
# (agg_percentile_approx's rank window over the non-NULL price
# population), q12_priority_pivot's TPC-H NULL-free-assumption citation
# (a docstring block touch), the four entries the r12 sf_nulls
# extension (NULL o_totalprice holes) caught (win_ntile and
# win_ntile_scale parking unpriced orders at opposite decile ends,
# ml_decision_stump's grid and quality_ks_two_sample's ECDF shifting
# around the NULL group), and the three entries the NEW sf_ties axis
# (family nine) caught (agg_argmax's untied max_by,
# stream_session_window's exact-gap boundary,
# sample_poisson_bootstrap's noise-grain rounding) — then the 41
# stalest remaining entries by artifact-derived age (the r2-vintage
# scan family and the r3-vintage agg/window/setops/fn/stream tails).
R12_WINDOW = [
    "agg_argmax",
    "agg_percentile_approx",
    "ml_decision_stump",
    "q12_priority_pivot",
    "quality_ks_two_sample",
    "sample_poisson_bootstrap",
    "stream_session_window",
    "win_ntile",
    "win_ntile_scale",
    "scan_parquet",
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
    "set_except",
    "set_distinct",
    "dedup_exact",
    "fn_string",
    "fn_date",
    "fn_math",
    "fn_array_map",
    "clean_currency",
    "fn_fuzzy_match",
    "fn_url_parse",
    "stream_dedup_keys",
    "stream_late_data",
    "stream_dedup_within_watermark",
    "stream_foreach_batch_sink",
    "stream_static_join_enrich",
    "stream_stream_interval_join",
    "stream_append_finalized_windows",
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
