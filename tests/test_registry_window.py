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

# The r13 window: the 4 touched entries first — the r12 ADVICE
# MAG_CAP-interpolation closure (ts_autocorr_lag and udaf_grouped's
# hand-written oracle WHERE clauses now interpolate
# functions/finite.py::sql_finite_pred; generated SQL byte-identical)
# plus fn_string / ts_resample_ffill as conservative
# suggester-attribution touches (module-top imports land in each
# file's first entry block) — then the 46 stalest remaining entries by
# artifact-derived age: the r3-vintage setops/fn/stream tails and the
# r4-vintage text/corpus/dedup families (last re-verified rounds 3-4).
R13_WINDOW = [
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

def test_driver_window_matches_coverage_plan():
    assert len(R13_WINDOW) == 50
    got = list(all_queries())[: len(R13_WINDOW)]
    assert got == R13_WINDOW, (
        "The first-50 verification window shifted. The window is the "
        "explicit registry.__init__._WINDOW_HEAD list; if you changed it, "
        "update this pin AND COVERAGE.md's ledger deliberately."
    )


def test_window_head_is_the_pin():
    # _WINDOW_HEAD and this pin must be the same list; divergence means a
    # half-finished rotation commit.
    assert _WINDOW_HEAD == R13_WINDOW


def test_no_window_name_collisions():
    names = list(all_queries())
    assert len(names) == len(set(names))
