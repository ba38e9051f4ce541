"""Layout robustness: the engine must behave identically when a table is
a DIRECTORY of many parquet part-files (the real 100 TB layout) instead of
the driver's single file — and the scan must then parallelize naturally
(ensure_parallelism becoming the documented no-op)."""

from __future__ import annotations

import pytest

from mapreduce__spark.plans.registry import REGISTRY
from mapreduce__spark.sources import load_table
from mapreduce__spark.sources.tables import _TABLE_CACHE


@pytest.fixture(scope="module")
def sharded_dir(spark, sf_small, tmp_path_factory):
    """Re-shard every table of sf0.001 into an 8-file directory layout."""
    out = str(tmp_path_factory.mktemp("sharded"))
    for t in ("documents", "events", "orders", "lineitem", "customer",
              "nation", "region", "supplier", "part", "embeddings"):
        df = load_table(spark, sf_small, t)
        df.repartition(8).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


@pytest.mark.parametrize("name", ["search_count", "events_tumbling_window",
                                  "pricing_summary", "dedup_lsh_minhash",
                                  "sessionization", "shipping_priority",
                                  "local_supplier_volume", "revenue_forecast",
                                  "word_count", "ann_topk_bruteforce"])
def test_queries_agree_on_sharded_layout(spark, sf_small, sharded_dir, name):
    q = REGISTRY[name]
    single = sorted(map(tuple, q.fn(spark, sf_small).collect()))
    sharded = sorted(map(tuple, q.fn(spark, sharded_dir).collect()))
    assert single == sharded


def test_sharded_scan_parallelizes(spark, sharded_dir):
    """8 part-files -> >=8 scan partitions without any repartition."""
    df = load_table(spark, sharded_dir, "lineitem")
    assert df.rdd.getNumPartitions() >= 8


def test_sharded_events_ts_roundtrip(spark, sf_small, sharded_dir):
    """Re-written events carry micros timestamps (no nanos branch) and
    must still load with identical values."""
    _TABLE_CACHE.clear()
    a = sorted(r.ts for r in load_table(spark, sf_small, "events").select("ts").collect())
    b = sorted(r.ts for r in load_table(spark, sharded_dir, "events").select("ts").collect())
    assert a == b


def test_partitioned_write_prunes_at_scan(spark, sf_small, tmp_path):
    """Hive-partitioned parquet (write_parquet partition_by) must let a
    reader prune: a filter on the partition column shows up as a
    PartitionFilter in the scan (not a post-scan Filter over all files),
    and results round-trip exactly."""
    from pyspark.sql import functions as F

    from mapreduce__spark.operators.sinks import write_parquet

    ev = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    out = str(tmp_path / "events_by_type")
    # repartition on the partition column first: one file per value, not
    # one file per (task, value) — the small-files guard the sinks module
    # documents.
    write_parquet(ev.repartition("event_type"), out, partition_by=["event_type"])

    back = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan

    want = {r.event_id for r in ev.where(F.col("event_type") == "click").collect()}
    assert {r.event_id for r in back.collect()} == want and want


def test_compact_files_preserves_rows_and_hits_target(spark, sf_small, tmp_path):
    """Small-files compaction: 64 tiny input files rewrite into the
    byte-target-derived output count, every row survives (set-identical
    doc_ids AND texts, not just a count), and the clustered variant's
    per-file doc_id ranges are disjoint — the min/max pruning the
    rewrite is buying."""
    from mapreduce__spark.operators.layout import compact_files
    from mapreduce__spark.sources import load_table

    docs = load_table(spark, sf_small, "documents")
    src = str(tmp_path / "small_files")
    docs.repartition(64).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 64

    dst = str(tmp_path / "compacted")
    stats = compact_files(spark, src, dst, target_file_bytes=256 << 10)
    assert stats["n_input_files"] == 64
    assert stats["n_output_files"] < 64
    assert stats["n_output_files"] == max(
        1, -(-stats["input_bytes"] // (256 << 10))
    )
    assert stats["rows"] == docs.count()
    # the unclustered rewrite must be the shuffle-free coalesce path —
    # no Exchange anywhere in the executed plan (round-8 ADVICE: the old
    # df.repartition was a full round-robin shuffle mislabeled as
    # "coalesce-style")
    assert "Exchange" not in stats["plan"], stats["plan"]
    got = {(r.doc_id, r.text) for r in spark.read.parquet(dst).collect()}
    want = {(r.doc_id, r.text) for r in docs.collect()}
    assert got == want

    # clustered compaction: per-file doc_id spans must be disjoint
    dst2 = str(tmp_path / "compacted_clustered")
    stats2 = compact_files(
        spark, src, dst2, target_file_bytes=128 << 10, cluster_by=["doc_id"]
    )
    assert stats2["rows"] == docs.count()
    import pyarrow.parquet as pq

    spans = []
    for f in spark.read.parquet(dst2).inputFiles():
        md = pq.ParquetFile(f.replace("file:", "")).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "doc_id"
            )
            los.append(col.statistics.min)
            his.append(col.statistics.max)
        if los:
            spans.append((min(los), max(his)))
    spans.sort()
    assert len(spans) > 1
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file spans {(lo1, hi1)} {(lo2, hi2)}"

    # the clustered rewrite legitimately shuffles (range exchange) —
    # exactly once
    assert stats2["plan"].count("Exchange rangepartitioning") == 1, stats2["plan"]


def test_compact_files_refuses_in_place_overwrite(spark, sf_small, tmp_path):
    """dst == src must fail EARLY: mode('overwrite') onto the directory
    being lazily read destroys the source before the rewrite completes
    (round-8 ADVICE). Both the literal same string and a trailing-slash
    alias of it must be caught."""
    from mapreduce__spark.operators.layout import compact_files

    src = str(tmp_path / "inplace")
    load_table(spark, sf_small, "region").write.parquet(src)
    with pytest.raises(ValueError, match="same location"):
        compact_files(spark, src, src)
    with pytest.raises(ValueError, match="same location"):
        compact_files(spark, src, src + "/")
    # and the guard must not have clobbered the source
    assert spark.read.parquet(src).count() > 0


def test_zorder_value_plan_has_no_window_or_shuffle(spark, sf_small):
    """Round-8 verdict item 4: cell assignment must not funnel the corpus
    through a partition-less window. The _z computation's plan contains
    no Window and no Exchange — the equi-depth cuts ride in as array
    literals probed scan-side."""
    from mapreduce__spark.operators.layout import zorder_value

    o = load_table(spark, sf_small, "orders").select("o_custkey", "o_totalprice")
    z = zorder_value(o, ["o_custkey", "o_totalprice"], bits=6)
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Exchange" not in plan, plan
    # cells are balanced enough to spread the curve: >= half the possible
    # cell values are occupied on both axes at sf0.001
    from pyspark.sql import functions as F

    n_z = z.select(F.countDistinct("_z")).first()[0]
    assert n_z >= (1 << 6), n_z
