"""Degenerate-input robustness: every flagship operator must return an
empty result (not crash) on a 0-row corpus — the first day of a new
pipeline, a fully-filtered partition, or a dry-run all look like this."""

from __future__ import annotations

import pytest

from mapreduce__spark.plans import REGISTRY

PROBE = [
    "dedup_lsh_minhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "ann_topk_bruteforce",
    "sessionization",
    "sequence_packing",
    "training_data_pipeline_full",
    "stratified_sample",
    "decontaminate_eval_overlap",
    "media_header_metadata",
    "events_rollup_gapfill",
    "image_resize_roundtrip",
    "audio_frame_sample",
    "embedding_correlation",
    "vocab_encode",
    "token_budget_mixture",
    "unigram_lm_score",
    "bpe_pair_counts",
    "dedup_incremental",
    "join_skew_salted",
    "dedup_keep_best",
    "sequence_packing_chunked",
    "funnel_analysis",
    "retention_cohort",
    "embedding_outliers",
    "distinct_users_hll_mergeable",
    # round-7 additions
    "substring_dedup_windows",
    "domain_mixture_weights",
    "boilerplate_removal",
    "multimodal_decode",
    "dedup_containment",
    "events_ewma",
    "collocation_lift",
    "per_source_zscore",
    "snapshot_diff_cdc",
    "incremental_agg_cdc",
    "source_drift_chi2",
    # round-8 additions
    "graph_triangles",
    "skyline_pareto",
    "inverted_index",
    "phrase_search",
    "zorder_layout",
    "kmeans_embeddings",
    "semantic_dedup",
    "dedup_jaccard_prefix",
    "bm25_rank",
    "entity_resolution_parts",
    "robust_outliers_mad",
    "equidepth_deciles",
    "bigram_lm_score",
    "png_pixel_decode",
    "gif_pixel_decode",
    "incremental_percentiles",
    "pandas_udf_grouped_median",
    "quantile_rank_normalize",
    # round-9 additions
    "jpeg_pixel_decode",
    "isotonic_calibration",
    "cusum_drift",
    "content_defined_chunking",
    "random_projection_sketch",
    "k_core_peel",
    "heavy_hitters_exact",
    "welch_z_test",
    "simhash_charfold",
    "vocab_growth",
    "rrf_fusion",
    # round-10 additions
    "quantile_sketch_values",
    "quantile_sketch_dyadic",
    "ann_topk_buckets",
    "jpeg_pixel_decode_ac",
    "stream_cusum_fold",
    "countmin_freq_estimate",
    "hll_distinct_charfold",
    # (hll_set_overlap is a GLOBAL summary — like welch_z_test it emits
    # its one summary row even on an empty corpus, which is the correct
    # sketch of an empty cohort: v_empty=256, raw_est near zero — so it
    # does not belong in this zero-rows probe)
    # round-11 additions
    "jpeg_pixel_decode_420",
    "warc_ingest",
    "zip_member_extract",
    "embedding_pq_codes",
    "mmr_diverse_select",
    "ann_topk_pq_adc",
    "wordpiece_pair_scores",
    "bpe_learn_merges",
    "asof_nearest_events",
    "jpeg_pixel_decode_progressive",
    # round-13 additions
    "stream_mg_fold",
    "stream_countmin_fold",
    "stream_quantile_fold",
    "kn_lm_score",
    "dedup_edit_distance",
    "theil_sen_slope",
    "token_entropy",
    "gini_doc_length",
    "hapax_legomena",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("empty_sf"))
    spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")
    spark.createDataFrame(
        [],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    spark.createDataFrame(
        [],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [],
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.parquet(f"{d}/part.parquet")
    return d


@pytest.mark.parametrize("name", PROBE)
def test_operator_empty_corpus(spark, empty_sf, name):
    df = REGISTRY[name].fn(spark, empty_sf)
    assert df.count() == 0
    assert df.columns  # schema survives even with no rows
