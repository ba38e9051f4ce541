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
