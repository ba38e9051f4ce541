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
  drift between Spark and DuckDB cannot flip the hash;
* round(double, d) itself is a dialect boundary: at exact decimal ties the
  engines disagree (Spark 4 rounds the shortest decimal representation —
  round(1.005, 2) = 1.01 — while DuckDB multiplies-then-rounds to 1.0).
  The fixtures' money/value columns are exactly 2-decimal, so every
  round(x, 2) of a raw column is tie-free by construction; queries that
  round DERIVED values round either at the value's true decimal precision
  (where rounding is a no-op both engines agree on — the decimal-sum
  idiom) or at 4-6 digits of quantities whose low bits were already made
  bit-identical. New queries must preserve one of those three shapes.
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
# VERDICT item 1, extended round 5): first make EVERY oracle-bearing query
# hold a green driver CORRECTNESS row in SOME round (achieved by r4 — the
# r1∪r2∪r3∪r4 union covers all 107), then rotate so single-attestation
# queries accumulate a SECOND driver round. Every window entry has a DuckDB
# oracle (full rows+schema+hash check); queries outside the window stay
# bit-exact-gated by the repo's own pytest oracle harness
# (tests/test_oracle.py, all SQL-expressible queries differentially at
# sf0.001 every run), and
# tests/test_registry_window.py::test_rotated_out_core_stays_oracle_gated
# pins that rotated-out entries keep their oracles.
#
# Round-5 rotation is DERIVED FROM DATA, not hand-listed (round-4 ADVICE:
# the r4 rotation comments drifted from the code): the audit-trail test
# tests/test_registry_window.py::test_window_prioritizes_low_attestation
# recomputes green-attestation counts from the checked-in
# CORRECTNESS_r0*.json files and asserts the policy below, so the comment
# cannot silently disagree with the window again.
#   IN  — the 4 round-5 additions, never driver-attested
#         (bmp_pixel_decode, wav_pcm_decode, paragraph_dedup,
#         graph_mass_propagation_k4), plus 46 of the 54 single-attestation
#         queries: all 29 whose one green row is from r1/r2/r3 (oldest
#         evidence first) and 17 of the 25 r4 first-timers, prioritizing
#         the ones whose code changed after the r4 run (the CDC pair:
#         bucketed snapshot rewrite; the multimodal set: DIB header-size
#         gate) and the structurally complex ones.
#   OUT — every query already green in ≥2 rounds (53 of them), plus 8 r4
#         first-timers deferred to round 6 whose code is untouched since
#         their green r4 row and whose shape is comparatively simple
#         (array_functions, map_functions, collect_set_sorted,
#         token_positions, repetition_ratio, value_histogram,
#         stratified_sample, percentiles).
# The intentionally-approximate (rows-only) queries sit past the window so
# the driver report has no ambiguous "no oracle" rows (see README
# §correctness).
DRIVER_WINDOW: tuple[str, ...] = (
    # round-5 additions — never driver-attested (O-25 real pixel/sample
    # decodes, O-22 paragraph-level dedup, O-1/O-16 k-step Pregel loop
    # with mid-run lineage truncation)
    "bmp_pixel_decode",
    "wav_pcm_decode",
    "paragraph_dedup",
    "graph_mass_propagation_k4",
    # tier-0 scan/filter/project/group core (O-3..O-6) — single r1 row
    "scan_project",
    "filter_predicates",
    "groupby_count",
    "distinct_dedup",
    # aggregation surface (O-11) — single r1 row each
    "agg_multi",
    "stats_moments",
    "correlation",
    "cube_agg",
    "unpivot_metrics",
    # single-attestation joins + TPC-H-shaped composites (O-13, O-2)
    "join_outer",
    "large_volume_customers",
    "local_supplier_volume",
    "shipping_priority",
    "revenue_forecast",
    "sql_cte_exists",
    # window functions (O-18) — single r1 row each
    "window_frames",
    "window_distribution",
    # scalar function surface (O-21) — single r1/r2 row each
    "date_arithmetic",
    "json_extraction",
    "json_typed_struct",
    "text_normalize",
    "string_agg_per_group",
    "null_semantics",
    # text analysis / doc pipeline primitives (O-24) — single r1 row each
    "lang_id",
    "doc_quality_score",
    "doc_token_stats",
    "doc_fingerprint",
    # r3 first-timers needing a second row (O-22, O-24)
    "dedup_keep_best",
    "sequence_packing_chunked",
    # r4 first-timers whose code CHANGED since their green row: the CDC
    # pair now runs on the bucketed snapshot store (operators/cdc.py),
    # the multimodal set on the DIB-size-gated BMP parser
    "merge_upsert",
    "scd2_intervals",
    "image_resize_roundtrip",
    "audio_frame_sample",
    "tiff_ogg_header_metadata",
    "webp_flac_header_metadata",
    # r4 first-timers, complex shapes, second attestation (O-11, O-14,
    # O-16..O-18, O-23, O-26, O-27)
    "profile_table",
    "join_bloom_pruned",
    "graph_mass_propagation",
    "funnel_analysis",
    "retention_cohort",
    "events_rollup_gapfill",
    "user_path_transitions",
    "stream_interval_join_batch",
    "embedding_outliers",
    "embedding_quantize_int8",
    "udtf_token_positions",
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
