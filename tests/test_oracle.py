"""Oracle-differential tests: every SQL-expressible registry query must
match its DuckDB oracle on the same parquet (the driver's t2 gate,
run here at sf0.001 for speed — the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from mapreduce__spark.plans import REGISTRY

from tests.oracle_harness import compare_with_oracle

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_small, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_small)
    ok, msg = compare_with_oracle(df, q.oracle, sf_small)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_small, name):
    """Non-SQL-expressible queries must still run and return a stable schema."""
    q = REGISTRY[name]
    df = q.fn(spark, sf_small)
    rows = df.collect()
    assert df.columns, f"{name}: no columns"
    assert rows is not None


def test_harness_detects_mismatches(spark, sf_small):
    """Self-check: the comparison harness must FAIL on wrong row counts,
    wrong column names, and wrong values — guards against a vacuous gate."""
    from mapreduce__spark.sources import load_table

    n = load_table(spark, sf_small, "nation")
    ok, _ = compare_with_oracle(
        n.limit(5).select("n_nationkey"), "SELECT n_nationkey FROM nation", sf_small
    )
    assert not ok  # row count
    ok, _ = compare_with_oracle(
        n.select(F := n.n_nationkey.alias("wrong")), "SELECT n_nationkey FROM nation", sf_small
    )
    assert not ok  # column name
    ok, _ = compare_with_oracle(
        n.select((n.n_nationkey + 1).alias("n_nationkey")),
        "SELECT n_nationkey FROM nation",
        sf_small,
    )
    assert not ok  # values


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
