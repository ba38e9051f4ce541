"""Named-query registry.

Every engine operator from SURVEY.md §2b is declared here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus, when the semantics are
SQL-expressible, an equivalent ANSI-ish SQL string the DuckDB oracle runs
on the same parquet files. ``__spark_entry__.queries()`` / ``oracle_sql()``
are thin views over this registry.

Contract notes (driver compare):
* the driver sorts columns by NAME before value-hashing — so every
  computed column is aliased identically in the DataFrame code and the SQL;
* the hash is order-insensitive over rows — ORDER BY is kept in both
  sides only where ordering is part of the operator's semantics;
* float columns are rounded in BOTH sides (same digits) so summation-order
  drift between Spark and DuckDB cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering an engine query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return wrap


# The driver's CORRECTNESS harness checks the FIRST 50 registry entries, so
# ordering is part of the verification contract. Rotation policy (round-3
# VERDICT item 1): the goal is that EVERY oracle-bearing query holds a green
# driver CORRECTNESS row in SOME round, so each round swaps multiply-attested
# stalwarts out for entries the external signal has never seen. Every window
# entry has a DuckDB oracle (full rows+schema+hash check); queries outside
# the window stay bit-exact-gated by the repo's own pytest oracle harness
# (tests/test_oracle.py, all SQL-expressible queries differentially at
# sf0.001 every run), and
# tests/test_registry_window.py::test_rotated_out_core_stays_oracle_gated
# pins that rotated-out entries keep their oracles.
#
# Round-4 rotation: IN — the 16 oracle-bearing queries never attested in
# r1-r3 (funnel_analysis, retention_cohort, value_histogram,
# embedding_outliers, join_bloom_pruned, image_resize_roundtrip,
# audio_frame_sample, events_rollup_gapfill, percentiles, profile_table,
# stratified_sample, token_positions, collect_set_sorted, repetition_ratio,
# array_functions, map_functions) plus the six round-4 additions
# (stream_interval_join_batch, webp_flac_header_metadata,
# embedding_quantize_int8, user_path_transitions, merge_upsert,
# scd2_intervals). OUT — 22 stalwarts, each green in CORRECTNESS_r03.json
# (most also r1/r2), each still covered by an in-window family sibling.
# The intentionally-approximate (rows-only) queries sit past the window so
# the driver report has no ambiguous "no oracle" rows (see README
# §correctness).
DRIVER_WINDOW: tuple[str, ...] = (
    # tier-0 reference core + the generic kernel (O-1, O-2, O-27)
    "search_count",
    "kernel_search_count",
    # aggregation surface (O-11)
    "pricing_summary",
    "percentiles",
    "value_histogram",
    "profile_table",
    # joins (O-13..O-16) + CDC shapes (round 4)
    "join_broadcast_star",
    "join_range",
    "join_bloom_pruned",
    "join_skew_salted",
    "merge_upsert",
    "scd2_intervals",
    "graph_mass_propagation",
    # window functions / analytics (O-17, O-18, O-20)
    "rolling_user_features",
    "funnel_analysis",
    "retention_cohort",
    "events_rollup_gapfill",
    "stratified_sample",
    "user_path_transitions",
    # scalar function surface (O-21) — array/map/string breadth
    "array_functions",
    "map_functions",
    # text analysis (O-24) incl. the LM-based quality filter, the
    # BPE-training pair counter, and the UDTF API twin
    "udtf_token_positions",
    "unigram_lm_score",
    "bpe_pair_counts",
    "token_positions",
    "collect_set_sorted",
    "repetition_ratio",
    # near-dup detection (O-22)
    "dedup_lsh_minhash",
    "dedup_incremental",
    "dedup_embedding_cosine",
    "dedup_clusters",
    # similarity search + embedding statistics (O-23)
    "ann_topk_bruteforce",
    "embedding_correlation",
    "embedding_outliers",
    "embedding_quantize_int8",
    # multimodal (O-25) — real byte-level header decodes + header resize
    # and frame sampling, incl. the round-4 WebP/FLAC parsers
    "image_header_metadata",
    "media_header_metadata",
    "webp_flac_header_metadata",
    "tiff_ogg_header_metadata",
    "image_resize_roundtrip",
    "audio_frame_sample",
    # streaming batch-twins (O-26), incl. the stream-stream interval join
    "events_tumbling_window",
    "sessionization",
    "stateful_dedup_first_event",
    "stream_interval_join_batch",
    # LLM training-data pipeline (O-12/O-18/O-24 composites + flagships)
    "pii_scrub",
    "decontaminate_eval_overlap",
    "sequence_packing",
    "training_data_pipeline",
    "training_data_pipeline_full",
)


def ordered_names() -> list[str]:
    """Registry names with the driver-checked window first (in DRIVER_WINDOW
    order), then all remaining queries in registration order."""
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise KeyError(f"DRIVER_WINDOW names not registered: {missing}")
    tail = [n for n in REGISTRY if n not in set(DRIVER_WINDOW)]
    return list(DRIVER_WINDOW) + tail


def get_queries() -> dict[str, QueryFn]:
    return {n: REGISTRY[n].fn for n in ordered_names()}


def get_oracle_sql() -> dict[str, str]:
    return {
        n: REGISTRY[n].oracle for n in ordered_names() if REGISTRY[n].oracle is not None
    }
