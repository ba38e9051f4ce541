"""Bloom-filter runtime pruning: no false negatives, real selectivity,
semi-join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce__spark.operators.bloom import (
    bloom_might_contain,
    bloom_pruned_semi_join,
    build_bloom,
)
from mapreduce__spark.sources import load_table


def test_no_false_negatives(spark, sf_small):
    keys = load_table(spark, sf_small, "customer").select("c_custkey").distinct()
    words = build_bloom(keys, "c_custkey")
    surviving = keys.where(bloom_might_contain(F.col("c_custkey"), words)).count()
    assert surviving == keys.count()


def test_prunes_most_non_members(spark):
    members = spark.range(0, 1000).select(F.col("id").alias("k"))
    words = build_bloom(members, "k")
    non_members = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = non_members.where(bloom_might_contain(F.col("k"), words)).count()
    assert fp / 20_000 < 0.05, fp  # 64Kbit / 1k keys -> fpp well under 5%


def test_semi_join_equivalence(spark, sf_small):
    """Bloom-pruned semi join must return exactly the plain semi join."""
    orders = load_table(spark, sf_small, "orders")
    dim = (
        load_table(spark, sf_small, "customer")
        .where(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    plain = orders.join(dim, orders.o_custkey == dim.c_custkey, "left_semi")
    pruned = bloom_pruned_semi_join(orders, dim, "o_custkey", "c_custkey")
    assert sorted(r.o_orderkey for r in plain.collect()) == sorted(
        r.o_orderkey for r in pruned.collect()
    )


def test_unaligned_bits_round_up_no_false_negatives(spark):
    """bits not divisible by 64 must not desynchronize the build and
    probe moduli: the probe reconstructs bits as len(words)*64, so the
    build rounds UP to word alignment — otherwise keys hashing into the
    truncated tail produce false negatives (or an IndexError at build),
    breaking the operator's one hard guarantee."""
    from pyspark.sql import functions as F

    from mapreduce__spark.operators.bloom import bloom_might_contain, build_bloom

    keys = spark.range(5000).select(F.col("id").alias("k"))
    words = build_bloom(keys, "k", bits=100_000)  # not a multiple of 64
    assert len(words) * 64 >= 100_000
    misses = keys.where(~bloom_might_contain(F.col("k"), words)).count()
    assert misses == 0  # every member must test positive
