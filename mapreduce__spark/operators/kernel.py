"""O-1: the generic map/reduce kernel — reference-API parity layer.

The reference's entire engine is one call (MapReduceFramework.cpp:621-694,
``RunMapReduceFramework(client, items, multiThreadLevel, autoDeleteV2K2)``):
user Map over (k1,v1) emitting (k2,v2) pairs, a key-grouping shuffle, user
Reduce over (k2, [v2...]) emitting (k3,v3), and a final global sort by k3.

Two Spark-native equivalents are provided:

* :func:`run_map_reduce_rdd` — the literal API shape on RDDs. Kept as the
  parity demonstration (arbitrary Python map/reduce closures, arbitrary
  orderable keys). ``groupByKey`` is deliberate: the reference contract
  hands Reduce the FULL value list (V2_VEC, MapReduceFramework.cpp:94), so
  a combiner would change the API. Users who only fold values should use
  the DataFrame aggregates instead — that is the scale path.

* :func:`run_map_reduce_df` — the same contract on DataFrames with
  Arrow-batched pandas functions (``mapInPandas`` for the map/emit side,
  ``applyInPandas`` for the grouped reduce), then ``orderBy`` for the
  reference's final sort (MapReduceFramework.cpp:498). This is what the
  engine actually recommends when Python logic is genuinely needed: the
  shuffle is Spark's (exactly-once per record — the reference's racy
  shuffle-termination heuristic, MapReduceFramework.cpp:394-406, has no
  analogue here), and data crosses the Python boundary in Arrow batches.

There is no analogue of ``multiThreadLevel`` (the cluster manager owns
parallelism) or ``autoDeleteV2K2`` (managed memory).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

MapFn = Callable[[Any, Any], Iterable[tuple[Any, Any]]]
ReduceFn = Callable[[Any, list[Any]], Iterable[tuple[Any, Any]]]


def run_map_reduce_rdd(
    spark: SparkSession,
    items: Iterable[tuple[Any, Any]],
    map_fn: MapFn,
    reduce_fn: ReduceFn,
    num_partitions: int | None = None,
) -> list[tuple[Any, Any]]:
    """Reference-shaped kernel on RDDs; returns the k3-sorted output list
    (the reference returns OUT_ITEMS_VEC sorted by k3,
    MapReduceFramework.cpp:488-507)."""
    sc = spark.sparkContext
    rdd = sc.parallelize(list(items), num_partitions) if not hasattr(items, "flatMap") else items
    out = (
        rdd.flatMap(lambda kv: map_fn(kv[0], kv[1]))
        .groupByKey(num_partitions)
        .flatMap(lambda kv: reduce_fn(kv[0], list(kv[1])))
        .sortByKey()
    )
    return out.collect()


def run_map_reduce_df(
    df: DataFrame,
    map_fn: Callable[[pd.DataFrame], Iterator[pd.DataFrame]] | None,
    reduce_fn: Callable[[pd.DataFrame], pd.DataFrame],
    map_schema: str = "k string, v long",
    reduce_schema: str = "k string, v long",
    key_col: str = "k",
) -> DataFrame:
    """Reference-shaped kernel on DataFrames with Arrow-batched UDFs.

    ``map_fn`` is a mapInPandas generator: pdf-in, pdf(k, v)-out per batch
    (0..n emits per input row = the reference's Emit2 flatMap semantics,
    MapReduceFramework.cpp:268-308). ``reduce_fn`` receives one pandas
    frame per key group (the V2_VEC) and returns the (k3, v3) frame —
    Emit3 semantics. Output is k3-sorted, where k3 is the FIRST column of
    ``reduce_schema``: the reference contract lets k3 differ from k2, so
    the sort keys on the reduce output's own leading column rather than
    assuming ``key_col`` survived the reduce.
    """
    mapped = df.mapInPandas(map_fn, schema=map_schema) if map_fn is not None else df
    reduced = mapped.groupBy(key_col).applyInPandas(reduce_fn, schema=reduce_schema)
    return reduced.orderBy(reduced.columns[0])
