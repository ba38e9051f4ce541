"""Shared DuckDB-oracle comparison harness (mirrors the driver's check:
row count + column names + order-insensitive value comparison)."""

from __future__ import annotations

import datetime
import math

import duckdb

from mapreduce__spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        # EXACT bit comparison — the driver value-hashes, so any float the
        # engines disagree on in the last bit is a real failure. Queries
        # must round decimal-exactly (see registry module docstring).
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver contract), normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def compare_with_oracle(spark_df, oracle_query: str, sf_dir: str) -> tuple[bool, str]:
    con = duckdb_conn(sf_dir)
    try:
        oracle = con.execute(oracle_query)
        o_cols = [d[0] for d in oracle.description]
        o_rows = oracle.fetchall()
    finally:
        con.close()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
    sn = normalize_rows(s_cols, s_rows)
    on = normalize_rows(o_cols, o_rows)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, "ok"
