"""Regression tests for the round-12 ADVICE findings:

1. winnowing_fingerprints oracle: DuckDB list_sum over an EMPTY fp list
   yields NULL while the Spark operator's F.aggregate returns 0, so any
   corpus containing a doc shorter than k+w-1 = 8 chars turned the
   oracle row red. Fixed with coalesce(..., 0) in the oracle SQL; pinned
   here with a short-doc oracle-differential fixture (the shipped
   corpora never go below 44 chars, so sf-based gates can't see it).
2. kendall_concordance tie terms: n*(n-1)/2 via float division is exact
   only below 2^53; both engines now stay in BIGINT (sum the always-even
   products, integer-halve the total). Pinned with a heavy-ties
   differential fixture plus an exactness check above 2^53.
3. _avro_long accepted an 11th varint byte (Avro longs are <= 10 bytes)
   and _avro_map had an unreachable return.
"""

from __future__ import annotations

import pytest

import os

from mapreduce__spark.plans import REGISTRY
from mapreduce__spark.sources.archives import _avro_long, _avro_zigzag_encode
from tests.conftest import SF_SMALL
from tests.oracle_harness import compare_with_oracle


def _write_documents(d: str, rows: list[tuple]) -> None:
    """Write a single-file documents.parquet (pyarrow, not Spark — the
    DuckDB side reads a FILE path, and Spark writes directories) and
    symlink every other table from sf0.001 (duckdb_conn eagerly binds a
    view per table)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce__spark.sources.tables import TABLES

    cols = list(zip(*rows))
    table = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    pq.write_table(table, f"{d}/documents.parquet")
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_SMALL}/{t}.parquet", f"{d}/{t}.parquet")


# ---------------------------------------------------------------------------
# winnowing_fingerprints: short docs (empty fingerprint list) vs oracle
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def short_doc_sf(spark, tmp_path_factory) -> str:
    """A documents table whose texts straddle every winnowing length
    regime: empty, < k (no grams), k <= len < k+w-1 (grams but no full
    window -> empty fp, the NULL-vs-0 hazard), and >= 8 (normal)."""
    d = str(tmp_path_factory.mktemp("short_doc_sf"))
    rows = [
        (1, "", "en", "web", 0),
        (2, "abc", "en", "web", 3),       # < k=5: zero grams
        (3, "abcde", "en", "web", 5),     # exactly k: 1 gram, no window
        (4, "abcdefg", "en", "web", 7),   # k+w-2: 3 grams, no window
        (5, "abcdefgh", "en", "web", 8),  # k+w-1: first full window
        (6, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
    ]
    _write_documents(d, rows)
    return d


def test_winnowing_short_docs_match_oracle(spark, short_doc_sf):
    """ADVICE (medium): docs with fewer than w=4 grams produced
    fp_hash_sum/fp_idx_sum NULL in DuckDB (list_sum of []) but 0 in
    Spark. The registered oracle must now agree on the hostile corpus."""
    q = REGISTRY["winnowing_fingerprints"]
    ok, msg = compare_with_oracle(
        q.fn(spark, short_doc_sf), q.oracle, short_doc_sf
    )
    assert ok, msg
    # and the short rows really do exercise the empty-fp branch
    out = {
        r["doc_id"]: r.asDict()
        for r in q.fn(spark, short_doc_sf).collect()
    }
    for doc_id in (1, 2, 3, 4):
        assert out[doc_id]["n_fingerprints"] == 0
        assert out[doc_id]["fp_hash_sum"] == 0
        assert out[doc_id]["fp_idx_sum"] == 0
    assert out[5]["n_fingerprints"] >= 1


# ---------------------------------------------------------------------------
# kendall_concordance: BIGINT tie terms
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def heavy_ties_sf(spark, tmp_path_factory) -> str:
    """Many docs collapsing onto few (x, y) cells so every tie term is
    non-trivial, plus two sources to keep the per-source grouping
    honest."""
    d = str(tmp_path_factory.mktemp("heavy_ties_sf"))
    rows = []
    doc_id = 0
    for source, reps in (("web", 7), ("books", 5)):
        for x_words in (1, 2, 3):
            for y_extra in (0, 1):
                text = " ".join(["tok"] * x_words)
                n_chars = len(text) + y_extra
                for _ in range(reps):
                    doc_id += 1
                    rows.append((doc_id, text, "en", source, n_chars))
    _write_documents(d, rows)
    return d


def test_kendall_heavy_ties_match_oracle(spark, heavy_ties_sf):
    """ADVICE (low): tie terms moved from float `/ 2` to pure-BIGINT
    (sum the even products, integer-halve). The rewrite must still agree
    with the rewritten oracle on a ties-dense corpus."""
    q = REGISTRY["kendall_concordance"]
    ok, msg = compare_with_oracle(
        q.fn(spark, heavy_ties_sf), q.oracle, heavy_ties_sf
    )
    assert ok, msg
    rows = {r["source"]: r.asDict() for r in q.fn(spark, heavy_ties_sf).collect()}
    # web: 7 reps x 3 x-values x 2 y-values = 42 docs; each (x,y) cell n=7
    # -> ties_xy = 6 cells * C(7,2)=21 = 126; each x has nx=14 ->
    # ties_x = 3 * C(14,2)=91 = 273
    assert rows["web"]["n_docs"] == 42
    assert rows["web"]["ties_xy"] == 126
    assert rows["web"]["ties_x"] == 273


def test_kendall_tie_arithmetic_exact_past_2_53(spark):
    """The exactness claim itself: with a cell count n where n*(n-1)
    exceeds 2^53, float division drops low bits but the shipped
    shiftright-on-BIGINT path must not."""
    from pyspark.sql import functions as F

    n = (1 << 27) + 3  # n*(n-1) ~ 2^54, odd low bits
    expected = n * (n - 1) // 2
    got = (
        spark.range(1)
        .select(
            F.shiftright(
                F.lit(n).cast("long") * (F.lit(n).cast("long") - 1), 1
            ).alias("t")
        )
        .collect()[0]["t"]
    )
    assert got == expected
    float_path = int(float(n * (n - 1)) / 2)
    assert float_path != expected  # the hazard the fix removes


# ---------------------------------------------------------------------------
# Avro varint bounds
# ---------------------------------------------------------------------------


def test_avro_long_roundtrips_64bit_extremes():
    for n in (0, -1, 1, (1 << 63) - 1, -(1 << 63)):
        enc = _avro_zigzag_encode(n)
        assert len(enc) <= 10
        val, pos = _avro_long(enc, 0)
        assert (val, pos) == (n, len(enc))


def test_avro_long_rejects_11_byte_varint():
    """ADVICE (low): the bound fired only after consuming an 11th
    continuation byte; an Avro long is at most 10 bytes, so a
    continuation bit on the 10th byte must raise without reading on."""
    b = bytes([0x80] * 10 + [0x01])  # 10 continuation bytes then a terminator
    with pytest.raises(ValueError, match="too long"):
        _avro_long(b, 0)


def test_avro_long_accepts_exactly_10_bytes():
    # zigzag(-2^63) = 2^64 - 1: nine 0xFF bytes then 0x01 — the longest
    # legal encoding, which must still parse.
    enc = _avro_zigzag_encode(-(1 << 63))
    assert len(enc) == 10
    val, _ = _avro_long(enc, 0)
    assert val == -(1 << 63)


def test_avro_long_truncation_still_valueerror():
    with pytest.raises(ValueError, match="truncated"):
        _avro_long(bytes([0x80] * 5), 0)


# ---------------------------------------------------------------------------
# lang_id_nb: dynamic label pivot (round-12 VERDICT item 4)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def six_lang_sf(tmp_path_factory) -> str:
    """Six labels with disjoint character alphabets — one more than the
    five the old hard-coded pivot knew about. Under the dynamic pivot
    the sixth is just another model row; under the old CASE ladder it
    could never be predicted."""
    d = str(tmp_path_factory.mktemp("six_lang_sf"))
    alphabets = {
        "de": "abcde",
        "en": "fghij",
        "es": "klmno",
        "fr": "pqrst",
        "zh": "uvwxy",
        "tr": "z0123",  # the sixth, unseen by the old pivot
    }
    rows = []
    doc_id = 0
    for lang, ab in alphabets.items():
        for i in range(6):
            words = [
                "".join(ab[(i + j + k) % 5] for k in range(3 + j % 3))
                for j in range(10)
            ]
            doc_id += 1
            text = " ".join(words)
            rows.append((doc_id, text, lang, "web", len(text)))
    _write_documents(d, rows)
    return d


def test_lang_id_nb_sixth_label_predicted_and_matches_oracle(spark, six_lang_sf):
    """VERDICT item 4: the label list is derived from the corpus, so a
    sixth language must (a) appear on the confusion-matrix diagonal —
    i.e. actually be PREDICTABLE — and (b) agree with the SQL oracle,
    which pivots dynamically too."""
    q = REGISTRY["lang_id_nb"]
    ok, msg = compare_with_oracle(q.fn(spark, six_lang_sf), q.oracle, six_lang_sf)
    assert ok, msg
    got = {
        (r.labeled_lang, r.predicted_lang): r.n_docs
        for r in q.fn(spark, six_lang_sf).collect()
    }
    assert got == {
        (lg, lg): 6 for lg in ("de", "en", "es", "fr", "zh", "tr")
    }, got
