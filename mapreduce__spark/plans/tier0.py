"""Tier 0 — reference-core operators (SURVEY.md §2b, O-2..O-9).

These are the queries the reference engine itself can express: the Search
flagship (filter → count → ordered duplicate-expansion, Search.cpp:203-303)
and the individual dataflow operators it composes (scan, filter, project,
group-count, sorted collect_list grouping, global sort, sinks).

All of it is pure DataFrame API — no UDFs — so every query runs entirely
inside whole-stage codegen with predicate pushdown and column pruning at
the parquet scan. At 100 TB the only shuffles below are the groupBy keys
(high-cardinality, well-distributed) and the final range-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce__spark.plans.registry import query
from mapreduce__spark.sources import load_table

# The flagship "search word" — plays the role of Search.cpp's CLI substring
# argument; 'src1' matches src1, src10..src19 so counts are non-trivial.
SEARCH_WORD = "src1"


@query(
    "search_count",
    oracle=f"""
    SELECT t.file
    FROM (
        SELECT source AS file, count(*) AS cnt
        FROM documents
        WHERE contains(source, '{SEARCH_WORD}')
        GROUP BY source
    ) t CROSS JOIN UNNEST(range(t.cnt)) AS r(i)
    ORDER BY file
    """,
    tags=("tier0", "flagship"),
)
def search_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship O-2: the reference's one shipped query, Spark-first.

    Reference semantics (Search.cpp:203-241,290-303): for every "directory
    entry" whose name contains the search word, count occurrences per name,
    then print each name `count` times in sorted order. Here the listings
    relation is the `documents` table with `source` as the entry name.

    Plan shape: parquet scan with the contains() predicate PUSHED to the
    scan → partial (map-side) count → shuffle on `file` → final count →
    `array_repeat`+`explode` reproduces the duplicate-print → global sort.
    One shuffle for the agg + one for the sort; both unavoidable and both
    key-balanced.
    """
    docs = load_table(spark, sf_dir, "documents")
    counted = (
        docs.where(F.col("source").contains(SEARCH_WORD))
        .groupBy(F.col("source").alias("file"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.select(
            F.explode(F.array_repeat(F.col("file"), F.col("cnt").cast("int"))).alias("file")
        )
        .orderBy("file")
    )


@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           'lineitem' AS src
    FROM lineitem
    WHERE l_quantity > 45.0
    """,
    tags=("tier0",),
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-3/O-4/O-5: scan + comparison filter + projection with expression
    and literal columns (generalizes Search.cpp:220-224's filter+emit).

    `.explain` check: ReadSchema carries only the 5 referenced columns and
    PushedFilters contains GreaterThan(l_quantity,45.0) — the scan never
    reads the other 6 lineitem columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_quantity") > 45.0).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.lit("lineitem").alias("src"),
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_orderpriority NOT IN ('5-LOW')
      AND o_totalprice BETWEEN 1000.0 AND 5000.0
      AND contains(o_orderpriority, '-')
    """,
    tags=("tier0",),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-4: the full predicate surface — IN / NOT IN / BETWEEN / substring
    containment (Search.cpp:213-220's two filters, generalized)."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderstatus").isin("O", "F")
        & ~F.col("o_orderpriority").isin("5-LOW")
        & F.col("o_totalprice").between(1000.0, 5000.0)
        & F.col("o_orderpriority").contains("-")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "groupby_count",
    oracle="""
    SELECT event_type, count(*) AS cnt
    FROM events
    GROUP BY event_type
    """,
    tags=("tier0",),
)
def groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-6: COUNT per key — the reference Reduce (Search.cpp:236-241).

    Partial aggregation (map-side combine) means the shuffle moves one row
    per (partition, event_type), not one per event — at 100 TB with ~5
    event types this shuffle is bytes, not terabytes.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


def grouped_collect_sorted_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-7 (array form, pytest-gated): group-by-key with collected value
    lists — the exact shape of the reference shuffle output (k2 -> V2_VEC,
    MapReduceFramework.cpp:94).

    The reference's V2_VEC order is nondeterministic (thread interleaving,
    MapReduceFramework.cpp:425-428) and so is Spark's collect_list; the
    engine contract is `sort_array` for determinism (SURVEY §4.3.2).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("event_id")).alias("event_ids"))
    )


@query(
    "grouped_collect_sorted",
    oracle="""
    SELECT user_id,
           array_to_string(list(event_id ORDER BY event_id), ',') AS event_ids
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
    tags=("tier0",),
)
def grouped_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-7 in a driver-canonicalizable form: the same sorted per-key value
    list as `grouped_collect_sorted_array`, serialized to one scalar CSV
    column so a pandas-based canonicalizer can sort/hash it (arrays are
    unhashable there). Same plan shape — the serialization is a free
    projection on top of the agg."""
    return grouped_collect_sorted_array(spark, sf_dir).select(
        "user_id",
        F.concat_ws(
            ",", F.transform(F.col("event_ids"), lambda x: x.cast("string"))
        ).alias("event_ids"),
    )


@query(
    "global_sort",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
    """,
    tags=("tier0",),
)
def global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-8: global multi-key sort — the reference's final std::sort over
    all reduce output (MapReduceFramework.cpp:488-507), distributed.

    Spark samples key ranges and range-partitions, so the sort scales out
    instead of funneling through one thread like produceFinalOutput.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment").orderBy(
        F.col("c_mktsegment").asc(), F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    tags=("tier0",),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-17 (global form): ORDER BY ... LIMIT k.

    Spark plans this as TakeOrderedAndProject — per-partition top-k then a
    driver-side merge of k*partitions rows; no global sort materializes.
    o_orderkey tiebreak keeps the row set deterministic at the boundary.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "formatted_sink",
    oracle="""
    SELECT concat_ws('|', n_name, CAST(n_nationkey AS VARCHAR)) AS line
    FROM nation
    ORDER BY line
    """,
    tags=("tier0",),
)
def formatted_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-9: formatted-line sink — the reference's print loop
    (Search.cpp:290-303) as a one-column DataFrame ready for text output."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        F.concat_ws("|", F.col("n_name"), F.col("n_nationkey").cast("string")).alias("line")
    ).orderBy("line")


@query(
    "scan_provenance",
    oracle="""
    WITH p AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (ORDER BY doc_id) - 1 AS row_idx
      FROM documents
    )
    SELECT doc_id, source,
           'documents.parquet' AS file_name,
           CAST(row_idx AS BIGINT) AS row_idx
    FROM p WHERE n_chars >= 100
    """,
    tags=("tier0", "source"),
)
def scan_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-3 extension: row-level provenance via the hidden `_metadata`
    columns — which file and which physical row each record came from,
    the audit trail a training-data pipeline needs ("which shard produced
    this document"). The metadata columns are scan-time constants stitched
    in by the reader (no shuffle, no UDF), and they report the PHYSICAL
    position: the filter below does not renumber rows, which is exactly
    what makes the ids stable across re-reads with different predicates.

    The oracle recomputes the physical position independently from the
    fixture's layout (testdata parquet is written in contiguous doc_id
    order — asserted by tests/test_plans.py::test_testdata_is_doc_id
    _ordered so fixture drift fails loudly, not as a cryptic hash
    mismatch) and applies the same post-numbering filter."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(F.col("n_chars") >= 100).select(
        "doc_id",
        "source",
        F.col("_metadata.file_name").alias("file_name"),
        F.col("_metadata.row_index").alias("row_idx"),
    )
