"""Sinks (O-9): the reference returns a k3-sorted in-memory vector
(MapReduceFramework.cpp:488-507) and its client prints formatted lines
(Search.cpp:290-303). The engine's sinks are collect(), parquet writes,
and formatted text lines.

Scale notes: `partition_by` columns become directory partitions readers
can prune on; writer parallelism = the DataFrame's partitioning, so a
`repartition(cols)` before a partitioned write avoids the
many-small-files problem (one file per task per partition-value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def formatted_lines(df: DataFrame, *cols: str, sep: str = "|") -> DataFrame:
    """Single `line` column — the print-loop sink as a DataFrame.

    Every column keeps its field slot even when NULL (as an empty
    string): bare concat_ws SKIPS null arguments entirely, which would
    shift later fields left — silent column misalignment for any reader
    splitting on the separator."""
    parts: list[Column] = [
        F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols
    ]
    return df.select(F.concat_ws(sep, *parts).alias("line"))


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a single-string-column DataFrame as text files."""
    df.write.mode(mode).text(path)


def write_parquet_compacted(
    df: DataFrame, path: str, target_rows_per_file: int, mode: str = "overwrite"
) -> int:
    """Write parquet with a bounded file count (the small-files guard).

    A write inherits the DataFrame's partitioning — after a wide shuffle
    that is `spark.sql.shuffle.partitions` files regardless of data size,
    and a 100 TB pipeline that emits millions of KB-sized files breaks
    every downstream scan's file-listing phase. Count once, repartition
    to ceil(rows/target) partitions, write. Returns the file count used.
    Production variant: estimate from sampled row width against a target
    BYTE size.

    repartition, not coalesce: coalesce can only SHRINK a partition count
    (a larger target was a silent no-op that made the returned count a
    lie) and it fuses into the upstream stage, so compacting to 1-2
    files would serialize the whole computation; the round-robin shuffle
    keeps the upstream parallel and makes n_files the real file count in
    both directions. The input is persisted across the count + write so
    the upstream plan executes once, not twice.
    """
    if target_rows_per_file <= 0:
        raise ValueError("target_rows_per_file must be a positive row count")
    df = df.persist()
    try:
        rows = df.count()
        n_files = max(1, -(-rows // target_rows_per_file))
        df.repartition(n_files).write.mode(mode).parquet(path)
    finally:
        df.unpersist()
    return n_files
