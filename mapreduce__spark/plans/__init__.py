from mapreduce__spark.plans.registry import (
    DRIVER_WINDOW,
    REGISTRY,
    Query,
    get_oracle_sql,
    get_queries,
    ordered_names,
)

# Importing the tier modules populates REGISTRY via the @query decorator.
from mapreduce__spark.plans import tier0  # noqa: F401
from mapreduce__spark.plans import tier1  # noqa: F401
from mapreduce__spark.plans import tier2  # noqa: F401

__all__ = [
    "DRIVER_WINDOW",
    "REGISTRY",
    "Query",
    "get_oracle_sql",
    "get_queries",
    "ordered_names",
]
