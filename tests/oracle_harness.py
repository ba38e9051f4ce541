"""Shared DuckDB-oracle comparison harness (mirrors the driver's check:
row count + column names + order-insensitive value comparison).

Two passes, both must agree:
1. exact pass — fetchall() tuples, bit-exact float comparison;
2. driver-mirror pass — both sides through *pandas* (``.df()`` /
   ``toPandas()``), columns sorted by name, rows sorted via
   ``DataFrame.sort_values`` and cells compared dtype-tagged. This is the
   pass that reproduces the driver's canonicalizer failure modes the
   fetchall pass can't see: DuckDB HUGEINT landing as float64 (``5.0`` vs
   Spark's int64 ``5``) and array columns being unhashable in the pandas
   sort (round-1 red rows, VERDICT.md:119-132).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
import pandas as pd

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


def _pd_cell(v):
    """Dtype-tagged canonical cell value: int64 5 and float64 5.0 must NOT
    compare equal (the driver value-hashes raw pandas values, so a DuckDB
    HUGEINT→float64 vs Spark bigint→int64 drift is a real hash mismatch)."""
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("f", "NaN" if math.isnan(f) else repr(f))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    if isinstance(v, str):
        return ("s", v)
    return ("o", str(v))


def _pd_canon(pdf: pd.DataFrame) -> list[tuple]:
    """The driver-mirror canonicalization: sort columns by name, sort rows
    with pandas (raises TypeError on unhashable cells, exactly like the
    driver's canonicalizer), then dtype-tag every cell."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    cells = pdf.astype(object).where(pdf.notna(), None)
    rows = [
        tuple(_pd_cell(v) for v in row)
        for row in cells.itertuples(index=False, name=None)
    ]
    # sort_values on multiple object columns is not a full lexicographic
    # guarantee across dtypes; finish with a stable total order.
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))


def compare_with_oracle(spark_df, oracle_query: str, sf_dir: str) -> tuple[bool, str]:
    con = duckdb_conn(sf_dir)
    try:
        # The oracle runs twice on purpose: the exact pass needs cursor
        # tuples (precise Python types), the driver-mirror pass needs the
        # pandas conversion's DTYPES (HUGEINT→float64 etc.) — one cannot be
        # derived from the other without losing what it checks.
        res = con.execute(oracle_query)
        o_cols = [d[0] for d in res.description]
        o_pdf = res.df()
        o_rows = con.execute(oracle_query).fetchall()
    finally:
        con.close()
    # Spark runs its physical plan ONCE: collect() (exact pass) and
    # toPandas() (mirror pass) both read the persisted result.
    spark_df = spark_df.persist()
    try:
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
        # driver-mirror pass (pandas on both sides)
        try:
            s_canon = _pd_canon(spark_df.toPandas())
            o_canon = _pd_canon(o_pdf)
        except TypeError as e:  # unhashable cell (e.g. array column) — driver ERR
            return False, f"driver-mirror canonicalizer error: {e}"
        if s_canon != o_canon:
            diffs = [(a, b) for a, b in zip(s_canon, o_canon) if a != b][:3]
            return False, f"driver-mirror (pandas) values differ; first diffs: {diffs}"
        return True, "ok"
    finally:
        spark_df.unpersist()
