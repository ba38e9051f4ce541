"""O-1 kernel property tests (hypothesis): the Spark kernel must equal a
single-threaded reference fold for arbitrary inputs and map/reduce
functions — the contract of RunMapReduceFramework
(MapReduceFramework.cpp:621-694), which the reference itself never tested
(SURVEY.md §5)."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce__spark.operators.kernel import run_map_reduce_df, run_map_reduce_rdd


def reference_fold(items, map_fn, reduce_fn):
    """Single-threaded model of the reference semantics: flatMap -> group
    by key (value order unspecified) -> reduce per key -> sort by k3."""
    groups = defaultdict(list)
    for k1, v1 in items:
        for k2, v2 in map_fn(k1, v1):
            groups[k2].append(v2)
    out = []
    for k2, vs in groups.items():
        out.extend(reduce_fn(k2, vs))
    return sorted(out)


# word-count-shaped map/reduce (the canonical kernel instance)
def wc_map(_k, text):
    return [(w, 1) for w in text.split()]


def wc_reduce(k, vs):
    return [(k, sum(vs))]


# identity-with-sorted-values (exposes grouping correctness, not just sums)
def collect_map(k, v):
    return [(v % 5, k)]


def collect_reduce(k, vs):
    return [(k, tuple(sorted(vs)))]


words = st.text(alphabet="abc ", min_size=0, max_size=30)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 100), words), min_size=0, max_size=40))
def test_kernel_rdd_wordcount_matches_reference_fold(spark, items):
    got = run_map_reduce_rdd(spark, items, wc_map, wc_reduce, num_partitions=4)
    assert got == reference_fold(items, wc_map, wc_reduce)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.text("xy", max_size=3), st.integers(-50, 50)), max_size=40))
def test_kernel_rdd_grouping_matches_reference_fold(spark, items):
    got = run_map_reduce_rdd(spark, items, collect_map, collect_reduce, num_partitions=3)
    assert got == reference_fold(items, collect_map, collect_reduce)


@pytest.mark.parametrize("num_partitions", [1, 2, 7])
def test_kernel_rdd_partition_invariance(spark, num_partitions):
    """repartitioning must not change results (the reference's DATA_CHUNK
    work-granule size is likewise output-invariant)."""
    items = [(i, f"a b {i % 3}") for i in range(25)]
    got = run_map_reduce_rdd(spark, items, wc_map, wc_reduce, num_partitions=num_partitions)
    assert got == reference_fold(items, wc_map, wc_reduce)


def test_kernel_df_matches_rdd_kernel(spark):
    """The Arrow-batched DataFrame kernel and the RDD kernel agree."""
    pdf_items = [(str(i % 4), i) for i in range(50)]
    df = spark.createDataFrame(pdf_items, "k string, v long")

    def map_fn(batches):
        for pdf in batches:
            yield pd.DataFrame({"k": pdf["k"], "v": pdf["v"] * 2})

    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "v": [int(pdf["v"].sum())]})

    got = [(r.k, r.v) for r in run_map_reduce_df(df, map_fn, reduce_fn).collect()]
    want = run_map_reduce_rdd(
        spark,
        pdf_items,
        lambda k, v: [(k, v * 2)],
        lambda k, vs: [(k, sum(vs))],
    )
    assert got == want


def test_kernel_empty_input(spark):
    """Empty input -> empty output (the reference's emptyRun heuristic
    path, MapReduceFramework.cpp:394-401, minus the race)."""
    assert run_map_reduce_rdd(spark, [], wc_map, wc_reduce, num_partitions=2) == []


def test_df_kernel_allows_renamed_reduce_key(spark):
    """The reference contract lets k3 differ from k2: a reduce_fn whose
    output key column is named differently from key_col must still sort
    by it (previously an AnalysisException on the vanished key_col)."""
    import pandas as pd

    from mapreduce__spark.operators.kernel import run_map_reduce_df

    df = spark.createDataFrame([("b", 1), ("a", 2), ("a", 3)], "k string, v long")

    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"word": [pdf["k"].iloc[0]], "n": [len(pdf)]})

    out = run_map_reduce_df(df, None, reduce_fn, reduce_schema="word string, n long")
    assert [(r.word, r.n) for r in out.collect()] == [("a", 2), ("b", 1)]
