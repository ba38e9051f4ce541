"""Skew (salted join) and bucketing (co-located join) — the two explicit
shuffle-shaping tools the 100 TB design notes name."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from mapreduce__spark.operators.skew import salted_join
from mapreduce__spark.sources import load_table


def test_salted_join_equals_plain_join(spark, sf_small):
    """Salting must not change join semantics (inner and left)."""
    o = load_table(spark, sf_small, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_small, "customer").select("c_custkey", "c_mktsegment")
    c = c.withColumnRenamed("c_custkey", "o_custkey")
    for how in ("inner", "left"):
        plain = o.join(c, ["o_custkey"], how)
        salted = salted_join(o, c, ["o_custkey"], salt=4, how=how)
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_with_hot_key(spark):
    """A single hot key (90% of probe rows) must still join correctly."""
    probe = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, k) for k in range(2, 102)], "k int, pv int"
    )
    build = spark.createDataFrame([(1, "hot"), (2, "cold"), (999, "absent")], "k int, bv string")
    got = salted_join(probe, build, ["k"], salt=8).groupBy("k", "bv").count().collect()
    got = {(r.k, r.bv): r["count"] for r in got}
    assert got[(1, "hot")] == 900
    assert got[(2, "cold")] == 1
    assert (999, "absent") not in got  # build key absent from probe


def test_bucketed_join_avoids_shuffle(spark, sf_small, tmp_path):
    """Bucketed tables on the join key co-locate rows at WRITE time: the
    join plans with NO Exchange on either side — the bucketing story for
    repeated fact⋈fact joins at scale."""
    warehouse = str(tmp_path / "warehouse")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    # external bucketed tables (warehouse.dir is a static conf, so give
    # each table an explicit path instead)
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", f"{warehouse}/b_orders"
    ).saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", f"{warehouse}/b_lineitem"
    ).saveAsTable("b_lineitem")

    j = spark.table("b_orders").join(
        spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    # and it still computes the right thing
    assert j.count() == o.join(li, o.o_orderkey == li.l_orderkey).count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    shutil.rmtree(warehouse, ignore_errors=True)
