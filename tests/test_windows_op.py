"""distributed_cumsum: must equal the single-partition global window for
any partition count, including degenerate ones."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce__spark.operators.windows import (
    distributed_cumsum,
    distributed_cumsum_grouped,
    distributed_row_number,
)
from mapreduce__spark.sources import load_table


@pytest.mark.parametrize("num_partitions", [1, 3, 8])
def test_matches_global_window(spark, sf_small, num_partitions):
    t = load_table(spark, sf_small, "documents").select(
        "doc_id", F.length("text").alias("v")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = {(r.doc_id, r.cum) for r in t.withColumn("cum", F.sum("v").over(w)).collect()}
    got = {
        (r.doc_id, r.cum)
        for r in distributed_cumsum(t, "doc_id", "v", num_partitions=num_partitions).collect()
    }
    assert got == want


def test_empty_input(spark):
    df = spark.createDataFrame([], "k bigint, v bigint")
    assert distributed_cumsum(df, "k", "v").collect() == []


def test_single_row(spark):
    df = spark.createDataFrame([(5, 7)], "k bigint, v bigint")
    rows = distributed_cumsum(df, "k", "v").collect()
    assert [(r.k, r.v, r.cum) for r in rows] == [(5, 7, 7)]


@pytest.mark.parametrize("num_partitions", [1, 3, 8])
def test_row_number_matches_global_window_with_ties(spark, num_partitions):
    """Multi-column ordering where the FIRST column is heavily tied: ties
    must land in one bucket and the composite (a, b) ordering must still
    produce the exact global row numbers."""
    rows = [(i % 4, i) for i in range(57)]  # a in {0..3}, b unique
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got_df, n = distributed_row_number(df, ["a", "b"], num_partitions=num_partitions)
    assert n == 57
    got = {(r.a, r.b): r.rn for r in got_df.collect()}
    w = Window.orderBy("a", "b")
    want = {(r.a, r.b): r.rn for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    assert got == want


def test_row_number_empty_and_single(spark):
    df0 = spark.createDataFrame([], "a bigint, b bigint")
    got0, n0 = distributed_row_number(df0, ["a", "b"])
    assert n0 == 0 and got0.collect() == []
    df1 = spark.createDataFrame([(3, 9)], "a bigint, b bigint")
    got1, n1 = distributed_row_number(df1, ["a", "b"])
    assert n1 == 1 and [(r.a, r.b, r.rn) for r in got1.collect()] == [(3, 9, 1)]


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (5, 4), (57, 4), (57, 7)])
def test_ntile_expr_matches_sql_ntile(spark, n, k):
    """ntile_expr == SQL NTILE for n < k, n == k, and every remainder
    shape (the else-branch must stay well-formed when it is unreachable)."""
    from mapreduce__spark.operators.windows import ntile_expr

    df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "x bigint")
    w = Window.orderBy("x")
    rows = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("want", F.ntile(k).over(w))
        .withColumn("got", ntile_expr(F.col("rn"), n, k).cast("int"))
        .collect()
    )
    assert all(r.got == r.want for r in rows), [(r.x, r.want, r.got) for r in rows]


def test_window_distribution_matches_literal_window(spark, sf_small):
    """The distributed rank-statistics form of window_distribution must
    equal the literal single-task ntile/percent_rank/cume_dist window."""
    from mapreduce__spark.plans import REGISTRY

    fn = REGISTRY["window_distribution"].fn
    full = fn(spark, sf_small)
    c = load_table(spark, sf_small, "customer").where(F.col("c_custkey") <= 400)
    w = Window.orderBy("c_acctbal", "c_custkey")
    want = {
        (r.c_custkey, r.quartile, r.pct_rank, r.cume)
        for r in c.select(
            "c_custkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        ).collect()
    }
    got = {(r.c_custkey, r.quartile, r.pct_rank, r.cume) for r in full.collect()}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-10_000, max_value=10_000),  # order key (deduped below)
            st.sampled_from(["a", "b", "zz"]),                 # skewed group values
            st.one_of(                                         # incl. negatives AND NULLs
                st.none(), st.integers(min_value=-1_000, max_value=1_000)
            ),
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    n_parts=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_grouped_cumsum_property(spark, rows, n_parts):
    """distributed_cumsum_grouped == the per-group global window for ANY
    key gaps, group skew, negative values, and bucket count."""
    df = spark.createDataFrame(rows, "k bigint, grp string, v bigint")
    got = {
        (r.grp, r.k): r.cum
        for r in distributed_cumsum_grouped(
            df, ["grp"], "k", "v", num_partitions=n_parts
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.grp, r.k): r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_cumsum_null_at_bucket_head_keeps_prefix(spark):
    """Exact NULL parity with the global window: SUM skips NULLs, so a
    NULL value at the HEAD of a range bucket must not erase the carried
    prefix (local sum NULL + offset was NULL), and a NULL before any
    non-NULL value anywhere must stay NULL (sum over an all-NULL prefix
    is NULL, not 0). Repro that previously returned NULL for k=3."""
    rows = [(0, None), (1, 5), (2, 6), (3, None), (4, 7)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    for n_parts in (1, 2, 3, 5):
        got = {
            r.k: r.cum
            for r in distributed_cumsum(df, "k", "v", num_partitions=n_parts).collect()
        }
        assert got == {0: None, 1: 5, 2: 11, 3: 11, 4: 18}, (n_parts, got)

    gdf = spark.createDataFrame(
        [(k, "g", v) for k, v in rows] + [(10, "h", None), (11, "h", 2)],
        "k bigint, grp string, v bigint",
    )
    for n_parts in (1, 2, 3):
        got = {
            (r.grp, r.k): r.cum
            for r in distributed_cumsum_grouped(
                gdf, ["grp"], "k", "v", num_partitions=n_parts
            ).collect()
        }
        assert got == {
            ("g", 0): None, ("g", 1): 5, ("g", 2): 11, ("g", 3): 11, ("g", 4): 18,
            ("h", 10): None, ("h", 11): 2,
        }, (n_parts, got)


def test_distributed_cummin_matches_single_task_window(spark):
    """distributed_cummin (range buckets + driver prefix mins) must equal
    the one-task global window on data with NULLs, duplicates-in-value,
    and a leading all-NULL prefix — including the NULL-iff-no-prior-value
    semantics."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mapreduce__spark.operators.windows import distributed_cummin

    rng = random.Random(909)
    rows = [(i, None if i < 5 or rng.random() < 0.2 else rng.randint(-50, 50))
            for i in range(500)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    got = {
        r.k: r.m
        for r in distributed_cummin(df, "k", "v", out_col="m", num_partitions=7)
        .collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: r.m for r in df.withColumn("m", F.min("v").over(w)).collect()}
    assert got == want
