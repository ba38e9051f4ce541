"""CSV / JSON-lines round-trips through the format helpers."""

from __future__ import annotations

import pytest

from mapreduce__spark.sources import load_table
from mapreduce__spark.sources.formats import read_csv, read_jsonl, write_csv, write_jsonl

NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"


def rows(df):
    return sorted(map(tuple, df.select("n_nationkey", "n_name", "n_regionkey").collect()))


def test_csv_roundtrip(spark, sf_small, tmp_path):
    src = load_table(spark, sf_small, "nation")
    p = str(tmp_path / "nation_csv")
    write_csv(src, p)
    back = read_csv(spark, p, NATION_SCHEMA)
    assert rows(back) == rows(src)


def test_jsonl_roundtrip(spark, sf_small, tmp_path):
    src = load_table(spark, sf_small, "nation")
    p = str(tmp_path / "nation_jsonl")
    write_jsonl(src, p)
    back = read_jsonl(spark, p, NATION_SCHEMA)
    assert rows(back) == rows(src)


def test_csv_failfast_on_malformed(spark, tmp_path):
    """FAILFAST must surface bad rows instead of silently nulling them."""
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-000.csv").write_text("n_nationkey,n_name,n_regionkey\nxx,FOO,1\n")
    bad = read_csv(spark, str(p), NATION_SCHEMA)
    with pytest.raises(Exception):
        bad.collect()
