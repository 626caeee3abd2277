"""Pin the driver verification window.

External correctness harnesses verify the FIRST 50 ``queries()`` entries
in registry insertion order per round; COVERAGE.md's ledger plans which
never-verified entries each round's window covers. Adding an entry to a
family that sits inside the current window silently shifts every later
entry out of it — the planned coverage quietly doesn't happen and nobody
is told. This test pins the current round's window to the documented
list so any accidental shift fails CI with an explanation instead.

When the rotation is INTENTIONALLY changed at a round boundary
(``registry/__init__._FAMILIES``), regenerate the pinned list and update
COVERAGE.md's ledger in the same commit.
"""

from __future__ import annotations

from projetos_etl_spark.registry import all_queries

# The r4 window: streams(12) + similarity(7) + text(9) + corpus(9) +
# multimodal(6) + dedup[:7] (COVERAGE.md "Driver-coverage ledger").
R4_WINDOW = [
    "stream_tumbling_count",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup_keys",
    "stream_late_data",
    "stream_dedup_within_watermark",
    "stream_custom_stateful_profile",
    "stream_foreach_batch_sink",
    "stream_static_join_enrich",
    "stream_stream_interval_join",
    "stream_append_finalized_windows",
    "stream_stream_left_outer_join",
    "sim_search_topk",
    "sim_search_ivf",
    "sim_search_lsh_bucketed",
    "sim_search_pq_adc",
    "sim_search_ivf_pq",
    "emb_centroid_per_label",
    "emb_quantize_int8",
    "text_tokens_stats",
    "text_quality_score",
    "text_lang_filter",
    "text_fingerprint",
    "text_tokens_bpe_regex",
    "text_rolling_hash",
    "text_langid",
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
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_transcode_roundtrip",
    "multimodal_arrow_batches",
    "scan_binary_files",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "pipeline_training_corpus",
    "dedup_connected_components",
    "pipeline_dedup_clustered",
]


def test_driver_window_matches_coverage_plan():
    got = list(all_queries())[: len(R4_WINDOW)]
    assert got == R4_WINDOW, (
        "The first-50 verification window shifted. If you added an entry "
        "to a family inside the window (streams/similarity/text/corpus/"
        "multimodal/dedup-head), move it to a later family OR update this "
        "pin AND COVERAGE.md's ledger deliberately."
    )
