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
    """Single `line` column — the print-loop sink as a DataFrame."""
    parts: list[Column] = [F.col(c).cast("string") for c in cols]
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
    every downstream scan's file-listing phase. Count once (cheap relative
    to the write), coalesce to ceil(rows/target) files, write. Returns
    the file count used. Production variant: estimate from sampled row
    width against a target BYTE size.
    """
    rows = df.count()
    n_files = max(1, -(-rows // target_rows_per_file))
    df.coalesce(n_files).write.mode(mode).parquet(path)
    return n_files
