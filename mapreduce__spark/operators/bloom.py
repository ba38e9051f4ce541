"""Bloom-filter runtime join pruning — from public primitives only
(Spark's own `bloom_filter_agg` expression is not registered in the
public function catalog).

Use case at 100 TB: a semi-join where the build side's KEY SET is too big
to broadcast raw but its Bloom sketch is not (say 10^8 keys → a 128 MB key
set vs a 16 MB filter at ~1% fpp). Prune the fact scan with the filter
BEFORE the shuffle, then run the real join on survivors — shuffle volume
drops by the selectivity, correctness is preserved because Bloom filters
have no false negatives.

Build is fully distributed and collects only O(words):

    key → h_i = pmod(xxhash64(key, seed_i), bits)      (expressions)
    groupBy(h div 64) → bit_or(1 << (h mod 64))        (partial-agg shuffle
                                                        of ≤ words rows)
    collect word list → literal array broadcast with the plan

Probe is a pure codegen predicate: all h_i bits set in words[h_i div 64].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 1 << 16  # 64 Kbit = 1024 longs; size for ~6k keys at 1% fpp


def _hashes(col: Column, num_hashes: int, bits: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(col, F.lit(i * 1315423911 + 1)), F.lit(bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    keys: DataFrame, key_col: str, bits: int = DEFAULT_BITS, num_hashes: int = 3
) -> list[int]:
    """Distributed Bloom build; returns the word list (len = bits/64).

    `bits` is rounded UP to a multiple of 64: the probe side has only the
    word list and reconstructs the modulus as len(words)*64, so a build
    modulus that isn't word-aligned would hash probes at different
    positions than the build — false negatives, breaking the operator's
    one hard guarantee (and a hash landing in the truncated tail word
    would IndexError the build)."""
    bits = (bits + 63) // 64 * 64
    h = F.explode(F.array(*_hashes(F.col(key_col), num_hashes, bits))).alias("h")
    # column-valued shift amounts need call_function (F.shiftleft only
    # accepts a literal int amount)
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.col("h") % 64).cast("int")
    )
    from mapreduce__spark.operators.staging import bounded_collect

    words = bounded_collect(
        keys.select(h)
        .select((F.col("h") / 64).cast("int").alias("w"), mask.alias("m"))
        .groupBy("w")
        .agg(F.bit_or("m").alias("word")),
        bits // 64,
        "bloom filter words",
    )
    out = [0] * (bits // 64)
    for r in words:
        out[r.w] = r.word
    return out


def bloom_might_contain(
    col: Column, words: list[int], num_hashes: int = 3
) -> Column:
    """Codegen predicate: every hash bit set in the broadcast word array."""
    bits = len(words) * 64
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = None
    for h in _hashes(col, num_hashes, bits):
        word = F.element_at(arr, (h / 64).cast("int") + 1)
        test = (
            F.call_function("shiftright", word, (h % 64).cast("int"))
            .bitwiseAND(F.lit(1))
            == 1
        )
        cond = test if cond is None else (cond & test)
    return cond


def bloom_pruned_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    bits: int = DEFAULT_BITS,
    num_hashes: int = 3,
) -> DataFrame:
    """left-semi join with a Bloom pre-filter on the fact side.

    Result EQUALS `fact.join(dim_keys, fact⋈dim, 'left_semi')` — the
    filter only removes rows the join would drop anyway (no false
    negatives); false positives die in the real semi join.
    """
    words = build_bloom(dim_keys, dim_key, bits, num_hashes)
    pruned = fact.where(bloom_might_contain(F.col(fact_key), words, num_hashes))
    dk = dim_keys.select(F.col(dim_key).alias("_bk")).distinct()
    return pruned.join(dk, pruned[fact_key] == F.col("_bk"), "left_semi")
