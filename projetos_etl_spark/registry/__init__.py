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
# Round-13 window — derived by tools/freshness.py::plan_window(
# TOUCHED_R13, through=12) per the COVERAGE.md freshness policy and
# asserted by tests/test_freshness.py. Touched this round (4): the r12
# ADVICE MAG_CAP-interpolation closure edited the hand-written oracle
# WHERE clauses of ts_autocorr_lag and udaf_grouped (now built from
# functions/finite.py::sql_finite_pred; the generated SQL is
# byte-identical — MAG_CAP_SQL normalizes 1e+75 back to 1e75 — so the
# OTHER sql_finite consumers are NOT semantics-touched this time,
# unlike r12 when the gate itself changed), and fn_string /
# ts_resample_ffill ride as conservative suggester-attribution touches
# (the new module-top sql_finite_pred imports land in each file's
# first entry block — the scan_parquet precedent). 4 <= 50, so the
# remaining 46 slots take the stalest rows by artifact-derived age:
# exactly the r3-vintage setops/fn/stream tails and r4-vintage
# text/corpus/dedup families the r12 VERDICT prescribed (its suggested
# 50 minus the four rows the touched entries displace).
_WINDOW_HEAD = [
    "fn_string",
    "ts_autocorr_lag",
    "ts_resample_ffill",
    "udaf_grouped",
    "set_except",
    "set_distinct",
    "dedup_exact",
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
    "stream_stream_interval_join",
    "stream_append_finalized_windows",
    "emb_centroid_per_label",
    "text_tokens_stats",
    "text_lang_filter",
    "text_fingerprint",
    "text_rolling_hash",
    "sample_stratified_hash",
    "text_tfidf_topk",
    "text_chunk_overlap",
    "text_pii_redact",
    "text_contamination_ngram",
    "text_repetition_ngram",
    "corpus_mix_weights",
    "text_unigram_logprob",
    "text_vocab_topk",
    "sample_topk_per_stratum",
    "corpus_pack_bins",
    "multimodal_bundle",
    "multimodal_frame_sample",
    "multimodal_arrow_batches",
    "scan_binary_files",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "pipeline_training_corpus",
    "dedup_connected_components",
    "pipeline_dedup_clustered",
    "funnel_conversion",
    "cohort_retention",
    "udf_pandas_vec",
    "dedup_minhash_incremental",
    "dedup_lsh_bucket_stats",
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
