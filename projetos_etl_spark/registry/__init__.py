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
# Round-12 window — derived by tools/freshness.py::plan_window(
# TOUCHED_R12, through=11) per the COVERAGE.md freshness policy and
# asserted by tests/test_freshness.py. Touched this round (25): the
# r11 ADVICE closure (agg_percentile_approx) and q12's docstring
# citation; the seven entries the round's first two fixture probes
# caught (four from extending sf_nulls with NULL o_totalprice holes,
# three from the NEW sf_ties axis, family nine); and the SIXTEEN
# finite-gate consumers — family ten (sf_extremes) extended the gate
# (functions/finite.py MAG_CAP), eight of them diverged and were fixed
# directly, and every other entry whose oracle embeds sql_finite()
# changed semantics with the gate, so freshness counts them all.
# Rotated three times this round (sf_extremes, then its density-
# scaled rerun catching scan_csv_badrecords, each landed after a
# rotation — freshness beats window stability; scan_parquet rides as
# a conservative suggester-attribution touch). 27 <= 50, so the
# remaining 23 slots take the stalest rows by artifact-derived age:
# the r2-vintage scan family and the r3-vintage agg/window/setops
# tails.
_WINDOW_HEAD = [
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
