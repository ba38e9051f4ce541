#!/usr/bin/env python3
"""Regenerate docs/PLANS.md — structural physical-plan skeletons of the
headline queries at sf0.1 (AQE final plans), the evidence artifact behind
SCALE.md's plan-shape claims."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mapreduce__spark.plans import REGISTRY  # noqa: E402
from mapreduce__spark.session import get_spark  # noqa: E402

NAMES = [
    "search_count",
    "pricing_summary",
    "shipping_priority",
    "dedup_lsh_minhash",
    "ann_topk_bruteforce",
    "merge_upsert",
    "graph_mass_propagation",
    "embedding_quantize_int8",
    # round 7: the decontamination join's strategy is now AQE's runtime
    # call (no hint) and boilerplate_removal is a headline bench query —
    # both plan skeletons are evidence for SCALE.md's round-7 claims
    "decontaminate_eval_overlap",
    "boilerplate_removal",
    "substring_dedup_windows",
    "events_ewma",
    # round-7 late additions: the broadcast-not-window standardization,
    # the broadcast-only collocation plan, and the CDC diff/IVM pair —
    # plan skeletons back SCALE.md entries 16-19
    "per_source_zscore",
    "collocation_lift",
    "snapshot_diff_cdc",
    "incremental_agg_cdc",
    # round 8: the linear containment path — plan skeleton backs
    # SCALE.md entry 21 (span equi-join, no gram self-join)
    "dedup_containment_chunks",
    # round 8: deterministic k-means — the skeleton shows broadcast-
    # literal centroid assignment inside codegen, no UDF, no corpus
    # materialization beyond the quantized checkpoint
    "kmeans_embeddings",
    # round 8: the fuzzy join's skeleton is evidence for the
    # distinct-domain + gram-filter claim (no corpus cross join)
    "fuzzy_join_parts",
    # round 8 late additions: skeletons back SCALE.md entries 25-31 —
    # the two equi-joins of the oriented triangle count, the bucketed
    # local skyline + sliver-sized global window, the scan-side postings
    # build, the single-scan quality audit, the postings-probe phrase
    # intersection, the zone-map aggregate, and the cluster-scoped
    # SemDeDup pair join
    "graph_triangles",
    "skyline_pareto",
    "inverted_index",
    "data_quality_audit",
    "phrase_search",
    "zorder_layout",
    "semantic_dedup",
    # round 8 final pair: the prefix-filter candidate join (SCALE.md 32)
    # and the broadcast-sized BM25 scoring join (SCALE.md 33)
    "dedup_jaccard_prefix",
    "bm25_rank",
    # round 8: the composed golden-record pipeline (SCALE.md 34)
    "entity_resolution_parts",
    # round 8 closers: the value-histogram compaction pair (SCALE.md
    # 35-36 — one scan, order statistics off the tiny histogram) and
    # the bigram LM's vocab-sized scoring join (SCALE.md 37)
    "robust_outliers_mad",
    "equidepth_deciles",
    "bigram_lm_score",
    # round 8: the histogram-sized rank map broadcast back onto the
    # unshuffled corpus (SCALE.md 44)
    "quantile_rank_normalize",
    # round 10: skeletons back SCALE.md entries 53-58 — the bounded
    # bucket aggregate + key-partitioned window of the DD sketch, its
    # integer-exact dyadic twin, the parity-bucket multiprobe equi-join
    # with exact rerank, the bounded cell table + broadcast probe read
    # of the count-min sketch, and the guarded heavy-hitter recount
    "quantile_sketch_values",
    "quantile_sketch_dyadic",
    "ann_topk_buckets",
    "countmin_freq_estimate",
    "heavy_hitters_exact",
    # round 11: skeletons back SCALE.md entries 62-66 — the adjacency-
    # array triangle intersection (one groupBy, no wedge stream), the
    # single-scan mapInPandas archive parsers, the subsampled JPEG
    # decode, the PQ encode joins over broadcast-centroid assignments,
    # and the ADC search's code-table scan + rank window
    "jpeg_pixel_decode_420",
    "warc_ingest",
    "zip_member_extract",
    "embedding_pq_codes",
    "ann_topk_pq_adc",
    # round 11 closers: the progressive multi-scan decode (same
    # single-scan mapInPandas shape), the WordPiece scoring join, and
    # the nearest-mode as-of two-pass window
    "jpeg_pixel_decode_progressive",
    "wordpiece_pair_scores",
    "asof_nearest_events",
    # round-11 second session: skeletons back the new SCALE.md entries —
    # the all-codegen URL canonicalization project (no UDF node), the
    # four-band Hamming equi-join with the lineage-cut hash table (no
    # cartesian), the bounded-spine seasonal windows behind broadcast
    # joins, the Viterbi prep's explode + hash agg + 1-row broadcast,
    # and the single-scan archive/codec mapInPandas representative
    "url_canonicalize",
    "image_dhash_neardup",
    "seasonal_decompose",
    "unigram_lm_tokenize",
    "targz_member_extract",
    # round 12: the trained-NB scoring join (broadcast gram model +
    # conditional-sum argmin, no UDF) and the rank-offset broadcast of
    # the Mann-Whitney U (distributed_cumsum, no corpus sort); the
    # codec/container additions share the single-scan mapInPandas
    # skeleton already shown by their round-11 siblings
    "lang_id_nb",
    "kn_lm_score",
    "dedup_edit_distance",
    "mann_whitney_u",
    # round-12 closers: the zero-shuffle winnowing scan (one stage, no
    # Exchange below the final aggregate), the shrinking funnel join
    # chain, and the cells^2 histogram self-join of the tau-b counts
    "winnowing_fingerprints",
    "funnel_conversion",
    "kendall_concordance",
    # round 14: skeletons back the new SCALE.md entries — the CCNet
    # tercile rank-map join-back over the (source, nll) histogram, the
    # shuffle-free indexed-array scrub, the shard-merge bigram rollup,
    # the two cells-squared pair matrices (KS over length ECDFs, JSD
    # over token histograms), the gram-keyed min-aggregate novelty
    # join-back, and the vocab-sized Hill rank windows
    "perplexity_buckets",
    "repetition_scrub",
    "incremental_kn_stats",
    "ks_test_lengths",
    "jsd_source_divergence",
    "doc_ngram_novelty",
    "zipf_tail_index",
    "knn_graph_mutual",
    "dsir_importance_weights",
    "readability_fk",
    "session_window_agg",
    "keyness_llr",
    "temporal_split_events",
    "temperature_resample",
    "passage_chunk_overlap",
    "matryoshka_overlap",
    "lang_id_confusion",
]
KEEP = (
    "Scan parquet", "Exchange", "HashAggregate", "Join", "Sort", "Window",
    "TakeOrdered", "Generate", "Project [", "Filter", "AdaptiveSparkPlan",
    "WindowGroupLimit", "BroadcastExchange",
)


def main() -> None:
    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = [
        "# Physical plans (sf0.1, local[32], AQE final plans)",
        "",
        "Auto-generated evidence for the plan-shape claims in SCALE.md: pushed filters,",
        "pruned read schemas, broadcast dims, partial aggregation, rank pushdown.",
        "Regenerate: `python3 docs/gen_plans.py`.",
        "",
    ]
    for n in NAMES:
        df = REGISTRY[n].fn(spark, sf)
        df.collect()  # finalize the adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        keep = [l.rstrip() for l in plan.splitlines() if any(k in l for k in KEEP)]
        out += [f"## {n}", "", "```", *[l[:160] for l in keep[:40]], "```", ""]
    path = os.path.join(os.path.dirname(__file__), "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
