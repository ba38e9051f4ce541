"""Vector math over ``array<double>`` columns — pure Catalyst expressions.

Embeddings live in DataFrames as ``array<float>`` (the `embeddings` table)
and are cast to ``array<double>`` before math so results match a
double-precision oracle. Everything here is built from `zip_with` /
`aggregate` higher-order functions: JVM-side, codegen'd, no Python in the
hot path — at 100 TB these run inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise product folded with a double accumulator."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe only insofar as parquet arrays are
    non-null in the testdata schema.

    Zero-norm inputs (a failed-embed all-zeros vector) score -1.0 —
    matching DuckDB's list_cosine_similarity convention so the oracle
    ranks agree, and ranking such vectors LAST is the behavior a
    similarity search wants. Without the guard the division is 0/0: an
    ERROR under Spark's default ANSI mode, NULL otherwise — either way a
    divergence from the oracle."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(-1.0)).otherwise(dot_product(a, b) / denom)


def as_double_vec(c: Column) -> Column:
    return c.cast("array<double>")
