"""Source/sink format breadth beyond parquet: CSV, JSON-lines, ORC.

The engine's canonical storage is parquet (columnar, splittable,
predicate-pushdown-capable); CSV/JSON exist for ingest and export edges of
a pipeline. Scale rules encoded here:

* ALWAYS pass an explicit schema — schema inference reads the data twice
  and infers per-file at scale (drifting types across a 100 TB directory);
* CSV/JSON are row formats: convert to parquet at the pipeline boundary,
  don't run analytics on them;
* gzip'd CSV/JSON is non-splittable (one task per file) — prefer many
  modest files or uncompressed + framework compression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True, sep: str = ","
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "FAILFAST")  # bad rows are a pipeline bug, not noise
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: columnar like parquet (pushdown + pruning apply); schema comes
    from the file footer, no inference pass needed."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
