"""The driver's CORRECTNESS harness checks only the FIRST 50 registry
entries (VERDICT.md round 1), so registry ordering is part of the
verification contract. These tests pin it."""

from __future__ import annotations

from mapreduce__spark.plans import DRIVER_WINDOW, REGISTRY, get_oracle_sql, get_queries

# Round-3 VERDICT item 1: the window must carry (a) every oracle-bearing
# query that has NEVER held a driver CORRECTNESS row in a prior round —
# converting pytest-only claims into the external signal is the whole
# point of rotation — and (b) the engine flagships that anchor each
# operator family.
NORTH_STAR = {
    # never driver-attested before round 4 — all 16 must be in-window
    "funnel_analysis",
    "retention_cohort",
    "value_histogram",
    "embedding_outliers",
    "join_bloom_pruned",
    "image_resize_roundtrip",
    "audio_frame_sample",
    "events_rollup_gapfill",
    "percentiles",
    "profile_table",
    "stratified_sample",
    "token_positions",
    "collect_set_sorted",
    "repetition_ratio",
    "array_functions",
    "map_functions",
    # round-4 additions: stream-stream interval-join batch twin, the
    # WebP/FLAC header parsers, int8 embedding quantization, and Markov
    # path transitions
    "stream_interval_join_batch",
    "webp_flac_header_metadata",
    "tiff_ogg_header_metadata",
    "embedding_quantize_int8",
    "user_path_transitions",
    "merge_upsert",
    "scd2_intervals",
    "graph_mass_propagation",
    "udtf_token_positions",
    # family-anchor flagships that stay in-window every round
    "search_count",
    "kernel_search_count",
    "dedup_lsh_minhash",
    "dedup_incremental",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "ann_topk_bruteforce",
    "embedding_correlation",
    "events_tumbling_window",
    "sessionization",
    "stateful_dedup_first_event",
    "rolling_user_features",
    "sequence_packing",
    "unigram_lm_score",
    "bpe_pair_counts",
    "pii_scrub",
    "decontaminate_eval_overlap",
    "training_data_pipeline",
    "training_data_pipeline_full",
    "image_header_metadata",
    "media_header_metadata",
    "join_skew_salted",
}


def test_window_is_first_50():
    names = list(get_queries())
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == list(DRIVER_WINDOW)


def test_window_has_no_duplicates_and_all_registered():
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW)
    assert set(DRIVER_WINDOW) <= set(REGISTRY)


def test_every_window_entry_has_oracle():
    """No ambiguous rows-only entries inside the driver-checked prefix —
    every checked query gets the full rows+schema+hash comparison."""
    oracles = get_oracle_sql()
    missing = [n for n in DRIVER_WINDOW if n not in oracles]
    assert not missing, f"window entries without oracle SQL: {missing}"


def test_north_star_queries_inside_window():
    missing = NORTH_STAR - set(DRIVER_WINDOW)
    assert not missing, f"north-star queries outside driver window: {missing}"


# Round-2 ADVICE (registry.py rotation note): these core basics were
# rotated OUT of the 50-entry driver window to make room for the tier-2
# flagships; their external verification rests on their green
# CORRECTNESS_r01 rows plus the full-registry parametrization in
# tests/test_oracle.py, which runs EVERY oracle-carrying registry entry
# (window or not) against DuckDB. This test pins that arrangement: each
# rotated-out basic must stay registered WITH an oracle so the pytest
# differential remains a bit-exact gate for it.
ROTATED_OUT_CORE = {
    "scan_project",
    "filter_predicates",
    "groupby_count",
    "agg_multi",
    "join_outer",
    "distinct_dedup",
    "json_extraction",
    "doc_quality_score",
    # rotated out in round 3 (each green in CORRECTNESS_r01 AND r02) to
    # attest the new round-3 operators; an in-window sibling still covers
    # each one's operator family (scalar_functions, rollup_cube,
    # topk_per_key, join_broadcast_star/join_skew_salted).
    "datetime_functions",
    "pivot_agg",
    "topk_global",
    "join_inner",
    "null_semantics",
    "set_ops",
    # rotated out in round 4 (each green in CORRECTNESS_r03, most in
    # r1/r2 too) to attest the 16 never-checked queries plus the round-4
    # additions; in-window family siblings: search_count/word_count
    # (tier-0 scan/sort/sink shapes), join_broadcast_star/join_range
    # (join family), rolling_user_features/funnel_analysis (windows),
    # percentiles/profile_table (aggregation), dedup_exact/dedup_lsh_minhash
    # (dedup family), image_header_metadata (multimodal),
    # events_tumbling_window (streaming), sequence_packing/
    # token_budget_mixture (pipeline stages).
    "grouped_collect_sorted",
    "global_sort",
    "formatted_sink",
    "join_full_outer",
    "join_semi_anti",
    "topk_per_key",
    "window_analytic",
    "global_row_number",
    "rollup_cube",
    "scalar_functions",
    "dedup_jaccard_exact",
    "minhash_signatures",
    "dedup_keep_best",
    "multimodal_metadata",
    "events_sliding_window",
    "train_test_split",
    "vocab_encode",
    "sequence_packing_chunked",
    # displaced mid-round-4 by the embedding_quantize_int8 /
    # user_path_transitions / merge_upsert / scd2_intervals additions
    # (each displaced entry green in at least two prior rounds)
    "dedup_exact",
    "token_budget_mixture",
    "shipmode_priority",
    "asof_join_events",
    "word_count",
    # displaced late in round 4 by the udtf_token_positions addition
    # (green r2 and r3; text family keeps five in-window anchors)
    "tfidf_top_terms",
    # displaced late in round 4 by the tiff_ogg_header_metadata addition
    # (green r2 and r3; quality family keeps pii_scrub + unigram_lm_score)
    "gopher_quality_rules",
}


def test_rotated_out_core_stays_oracle_gated():
    for name in ROTATED_OUT_CORE:
        assert name in REGISTRY, f"rotated-out basic {name} was dropped"
        assert REGISTRY[name].oracle is not None, (
            f"rotated-out basic {name} lost its oracle — test_oracle.py "
            "would silently downgrade it to a rows-only check"
        )


def test_oracle_order_matches_query_order():
    """oracle_sql() iteration order must follow queries() order so the
    driver's 50-entry cut lands on the same prefix for both."""
    q_names = [n for n in get_queries() if n in get_oracle_sql()]
    assert list(get_oracle_sql()) == q_names
