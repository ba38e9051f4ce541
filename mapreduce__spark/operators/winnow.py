"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
the MOSS local fingerprinting scheme): hash every character k-gram,
slide a window of w consecutive hashes, and select each window's
MINIMUM (rightmost on ties). The guarantee: any shared substring of
length >= k + w - 1 yields at least one shared fingerprint, while the
selected set is a ~2/(w+1) fraction of all grams — the local,
position-robust alternative to MinHash for plagiarism-style overlap.

Everything here is whole-stage-codegen column expressions over arrays —
gram hashes via the repo's shared cross-engine char fold, window minima
via slice/array_min/array_position — so the operator runs entirely in
the SCAN STAGE: no UDF, no shuffle, nothing leaves the executor but the
per-doc fingerprint aggregates. Each selected (gram index, hash) pair is
packed into one BIGINT (idx * 2^31 + hash, hash < 2^31) so distinctness
and the order-insensitive sums stay integer-exact on both engines.

Reference parity: no fingerprinting in the reference; tier-2 dedup
extension (SURVEY §2b O-22) beside MinHash/SimHash/CDC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WINNOW_K = 5  # character-gram length
WINNOW_W = 4  # window size in grams
CHARFOLD_MOD = 2147483647
_PACK = 2147483648  # 2^31: pack (idx, hash) as idx * _PACK + hash


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append winnowing-fingerprint aggregates derived ONLY from
    `text_col`: n_grams, n_windows, n_fingerprints (distinct selected
    (idx, hash) pairs), fp_hash_sum and fp_idx_sum (sums over the
    distinct pairs — the idx sum makes wrong SELECTION POSITIONS fail
    the hash even when the chosen hash values happen to match)."""
    k, w = WINNOW_K, WINNOW_W
    # sequence() counts DOWN when stop < start (the word_ngrams hazard):
    # a doc shorter than k must yield zero grams, not [1, 0]
    hashes: Column = F.when(
        F.length(text_col) >= k,
        F.expr(
            f"""
            transform(
              sequence(1, length({text_col}) - {k} + 1),
              i -> aggregate(
                transform(sequence(i, i + {k} - 1),
                          j -> cast(ascii(substring({text_col}, j, 1)) as bigint)),
                cast(0 as bigint),
                (a, c) -> (a * 31 + c) % {CHARFOLD_MOD}))
            """
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    df = df.withColumn("_hs", hashes)
    # sequence() counts DOWN when stop < start: a doc with fewer than w
    # grams must yield no windows, not garbage
    codes: Column = F.when(
        F.size("_hs") >= w,
        F.expr(
            f"""
            array_distinct(transform(
              sequence(1, size(_hs) - {w} + 1),
              j -> (j + {w}
                    - array_position(reverse(slice(_hs, j, {w})),
                                     array_min(slice(_hs, j, {w}))))
                   * {_PACK}L
                   + array_min(slice(_hs, j, {w}))))
            """
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    df = df.withColumn("_fp", codes)
    zero = F.lit(0).cast("bigint")
    return df.select(
        "doc_id",
        F.size("_hs").cast("bigint").alias("n_grams"),
        F.greatest(F.size("_hs") - (w - 1), F.lit(0))
        .cast("bigint")
        .alias("n_windows"),
        F.size("_fp").cast("bigint").alias("n_fingerprints"),
        F.aggregate(
            "_fp", zero, lambda a, c: a + c % F.lit(_PACK)
        ).alias("fp_hash_sum"),
        F.aggregate(
            "_fp", zero, lambda a, c: a + F.floor(c / F.lit(_PACK))
        ).alias("fp_idx_sum"),
    )
