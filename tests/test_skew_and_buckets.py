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


def _boilerplate_corpus(spark, n_boiler=300, n_planted=5):
    """A corpus engineered to make LSH band buckets pathologically hot
    WITHOUT the docs being near-duplicates: every boilerplate doc shares
    a 40-token template (license-header style) followed by a unique
    20-token tail, so pairwise Jaccard sits far below 0.8 while a
    constant fraction of each doc's minhashes come from the shared grams.
    Planted beside them: n_planted exact-duplicate pairs with distinct,
    template-free texts — the TRUE pairs the operator must still find."""
    boiler = " ".join(f"tmpl{i}" for i in range(40))
    rows = [
        (i, boiler + " " + " ".join(f"u{i}w{j}" for j in range(20)))
        for i in range(n_boiler)
    ]
    for k in range(n_planted):
        text = " ".join(f"planted{k}tok{j}" for j in range(30))
        rows.append((10_000 + 2 * k, text))
        rows.append((10_001 + 2 * k, text))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_lsh_hot_bucket_flood_and_cap(spark):
    """Round-3 VERDICT item 7: boilerplate near-duplicate corpora must not
    drive the banded candidate join quadratic.

    (1) demonstrates the flood is real: uncapped, the shared-template
    corpus emits a large fraction of the all-pairs quadratic as
    candidates (all discarded later by exact verification — pure waste);
    (2) with max_bucket_size, the candidate count collapses to
    sub-quadratic: the general bound is bands * n * (cap-1) / 2 (per
    band, surviving buckets have size <= cap and sum to <= n — linear in
    n for fixed cap), and on THIS fixture, where nearly everything sits
    in the dropped hot bucket, it collapses much further;
    (3) the capped operator still returns EXACTLY the planted true
    pairs — their buckets are small, so the cap costs no recall here —
    and the uncapped operator agrees."""
    from mapreduce__spark.operators.dedup import (
        _band_buckets,
        _cap_hot_buckets,
        lsh_near_duplicate_pairs,
        minhash_signature,
    )

    docs = _boilerplate_corpus(spark)
    n = docs.count()
    quadratic = n * (n - 1) // 2

    def candidate_count(banded):
        ba, bb = banded.alias("ba"), banded.alias("bb")
        return (
            ba.join(
                bb,
                (F.col("ba.band_idx") == F.col("bb.band_idx"))
                & (F.col("ba.band_hash") == F.col("bb.band_hash"))
                & (F.col("ba.doc_id") < F.col("bb.doc_id")),
            )
            .select("ba.doc_id", "bb.doc_id")
            .distinct()
            .count()
        )

    banded = _band_buckets(minhash_signature(docs, 16), 16, 8)
    flood = candidate_count(banded)
    assert flood > 0.3 * quadratic, (
        f"fixture no longer floods ({flood} of {quadratic}) — the stress "
        "scenario this test exists for has silently disappeared"
    )

    cap = 32
    capped = candidate_count(_cap_hot_buckets(banded, cap))
    assert capped <= 8 * n * (cap - 1) // 2, f"capped candidates {capped} exceed the general per-band bound"
    assert capped < 0.02 * quadratic, f"capped candidates {capped} not collapsed on the hot-bucket fixture"

    want = {(10_000 + 2 * k, 10_001 + 2 * k) for k in range(5)}
    got_capped = {
        (r.id1, r.id2)
        for r in lsh_near_duplicate_pairs(docs, 0.8, max_bucket_size=cap).collect()
    }
    got_exact = {
        (r.id1, r.id2) for r in lsh_near_duplicate_pairs(docs, 0.8).collect()
    }
    assert got_capped == want
    assert got_exact == want


def test_salted_join_unique_col_and_reserved_name(spark):
    """unique_col scatters byte-identical hot rows across salts (the
    all-columns hash cannot), and a pre-existing _salt column is rejected
    instead of silently clobbered."""
    import pytest
    from pyspark.sql import functions as F

    from mapreduce__spark.operators.skew import salted_join

    # 600 probe rows: 500 byte-identical duplicates of the hot key
    # (plus a row_id making them distinguishable only via unique_col).
    probe = spark.range(600).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < 500, 7).otherwise(F.col("id")).alias("k"),
    )
    build = spark.createDataFrame([(7, "hot"), (550, "cold")], "k bigint, v string")
    got = salted_join(probe, build, ["k"], salt=8, unique_col="row_id")
    assert got.count() == 501  # 500 hot matches + row 550
    # scatter check: the salt derived from row_id spreads the hot rows
    salts = (
        probe.where(F.col("k") == 7)
        .select(F.pmod(F.xxhash64("row_id"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert salts > 1

    with pytest.raises(ValueError, match="reserved"):
        salted_join(probe.withColumn("_salt", F.lit(1)), build, ["k"])
