"""Named-query registry.

Every engine operator from SURVEY.md §2b is declared here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus, when the semantics are
SQL-expressible, an equivalent ANSI-ish SQL string the DuckDB oracle runs
on the same parquet files. ``__spark_entry__.queries()`` / ``oracle_sql()``
are thin views over this registry.

Contract notes (driver compare):
* the driver sorts columns by NAME before value-hashing — so every
  computed column is aliased identically in the DataFrame code and the SQL;
* the hash is order-insensitive over rows — ORDER BY is kept in both
  sides only where ordering is part of the operator's semantics;
* float columns are rounded in BOTH sides (same digits) so summation-order
  drift between Spark and DuckDB cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering an engine query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return wrap


def get_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in REGISTRY.values()}


def get_oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
