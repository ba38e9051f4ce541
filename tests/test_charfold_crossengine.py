"""Cross-engine pin for the shared char-fold token hash.

Four oracle-checked queries (content_defined_chunking,
random_projection_sketch, countmin_freq_estimate, hll_distinct_charfold)
ride the same hash law — left-fold (a*31 + codepoint) mod 2^31-1 —
written INDEPENDENTLY in Spark expressions and DuckDB SQL. The driver
attests them on fixture text; this test fuzzes the hash itself on
random printable-ASCII tokens (plus the mixing chain HLL adds) so a
dialect drift in either recipe fails here first, with the culprit
isolated to the hash layer instead of a whole-query hash mismatch.
"""

from __future__ import annotations

import random
import string

import duckdb
from pyspark.sql import functions as F

from mapreduce__spark.operators.qsketch import CM_MOD, _charfold, hll_mixed_hash

# printable ASCII minus space (tokens come from split-on-space) and
# minus the quote characters that would need SQL escaping
_ALPHABET = "".join(
    ch for ch in string.printable[:94] if ch not in " '\"\\"
)


def _random_tokens(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    toks = []
    for _ in range(n):
        ln = rng.choice([1, 1, 2, 3, 5, 8, 16, 40, 120])
        toks.append("".join(rng.choice(_ALPHABET) for _ in range(ln)))
    # deterministic edge shapes
    toks += ["a", "z" * 200, "0", "~", "!!", "A" * 31]
    return toks


def test_charfold_and_mix_agree_with_duckdb(spark):
    toks = _random_tokens(300, seed=2026)
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r.tok: (r.h, r.hm)
        for r in df.select(
            "tok",
            _charfold(F.col("tok")).alias("h"),
            hll_mixed_hash(F.col("tok")).alias("hm"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (tok VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in toks])
    rows = con.execute(
        f"""
        WITH h0 AS (
          SELECT tok,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, length(tok)+1),
                             i -> CAST(ord(substr(tok, i, 1)) AS BIGINT))),
              (a,b) -> (a*31+b) % {CM_MOD}) AS h
          FROM t
        ),
        h1 AS (SELECT tok, h, (h * CAST(2654435761 AS BIGINT)) % {CM_MOD} AS a FROM h0),
        h2 AS (SELECT tok, h, xor(a, a >> 15) % {CM_MOD} AS b FROM h1)
        SELECT tok, h, (b * CAST(1000003 AS BIGINT)) % {CM_MOD} AS hm FROM h2
        """
    ).fetchall()
    want = {t: (h, hm) for t, h, hm in rows}

    assert set(got) == set(want)
    diffs = {t: (got[t], want[t]) for t in got if got[t] != want[t]}
    assert not diffs, dict(list(diffs.items())[:3])
