"""distributed_cumsum: must equal the single-partition global window for
any partition count, including degenerate ones."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce__spark.operators.windows import distributed_cumsum
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
