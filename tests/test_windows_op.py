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


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-10_000, max_value=10_000),  # order key (deduped below)
            st.sampled_from(["a", "b", "zz"]),                 # skewed group values
            st.integers(min_value=-1_000, max_value=1_000),    # incl. negatives
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
