from mapreduce__spark.plans.registry import REGISTRY, Query, get_queries, get_oracle_sql

# Importing the tier modules populates REGISTRY via the @query decorator.
from mapreduce__spark.plans import tier0  # noqa: F401
from mapreduce__spark.plans import tier1  # noqa: F401
from mapreduce__spark.plans import tier2  # noqa: F401

__all__ = ["REGISTRY", "Query", "get_queries", "get_oracle_sql"]
