"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in the mapreduce__spark.plans registry (one entry per
operator in SURVEY.md §2b); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce__spark.plans import get_oracle_sql, get_queries
from mapreduce__spark.plans.tier0 import search_count
from mapreduce__spark.session import tune_session

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (O-2 search_count — the reference's one shipped
    query, Search.cpp:203-303) on /root/testdata/sf0.001."""
    tune_session(spark)
    return search_count(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = get_queries()

    def tuned(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: tuned(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query;
    approximate/stub operators are intentionally omitted (rows-only)."""
    return get_oracle_sql()
