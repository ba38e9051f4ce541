"""Unigram-LM (SentencePiece-style) Viterbi tokenization, exact-integer.

Completes the tokenizer-training triad (BPE merge learning, WordPiece
merge scoring, and now unigram-LM segmentation — the three objectives
production tokenizers train with; Kudo 2018, "Subword Regularization").
The unigram model segments a word into the piece sequence maximizing
sum(log p(piece)) with p = count/total — equivalently
sum(ilog2(count_i) - ilog2(total)) — over a substring vocabulary.

Exactness discipline: real log-likelihoods are libm floats the two
engines would disagree on in the last bit, so the score is a DECLARED
fixed-point base-2 log both engines compute in pure integer
arithmetic:

    ilog2(x) = (msb << 12) + ((x << 12) >> msb) - 4096,
    msb = bit_length(x) - 1

(the msb plus a 12-bit linear-interpolated mantissa — monotone in x,
exact in int64 for x < 2^40; DuckDB mirrors it as
`(length(bin(x)) - 1)` and shifts). Ties in the total score break to
the SMALLEST cut mask (bit i-1 set = cut after character i), which the
DP can carry because all candidates at a prefix state share their
future suffix bits.

The differential is the strong kind: the Spark side runs the O(L * P)
Viterbi DP; the DuckDB oracle ENUMERATES all 2^(L-1) segmentations per
word and arg-maxes with the same tie-break — dynamic programming
proven against brute force, word for word.

Scale shape: the vocabulary (distinct words x <=4-char substrings) is
Zipf-sublinear in corpus size (the bpe_learn_merges argument); counts
are one explode + hash aggregate; each word's DP sees only its own
<=26 substrings, delivered by an equi-join and a per-word map — no
driver loop, no broadcast of the corpus. Reference parity: tier-2 O-24
text-pipeline extension (the reference tokenizes by whitespace only,
Search.cpp:214-233).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE = 4  # substring vocabulary cap (SentencePiece's max_piece_length)
ILOG2_FRAC_BITS = 12


def ilog2(x: int) -> int:
    """Fixed-point base-2 log: msb plus 12-bit linear mantissa."""
    msb = x.bit_length() - 1
    return (msb << ILOG2_FRAC_BITS) + ((x << ILOG2_FRAC_BITS) >> msb) - 4096


def viterbi_segment(
    word: str, piece_counts: dict[str, int], total: int
) -> tuple[int, int, list[str]]:
    """(score, mask, pieces): the max-score segmentation of `word` into
    vocabulary pieces of length <= MAX_PIECE, ties broken to the
    smallest cut mask."""
    st = ilog2(total)
    n = len(word)
    # best[i] = (score, mask) over segmentations of word[:i]
    best: list[tuple[int, int] | None] = [None] * (n + 1)
    best[0] = (0, 0)
    for i in range(1, n + 1):
        top: tuple[int, int] | None = None
        for j in range(max(0, i - MAX_PIECE), i):
            prev = best[j]
            if prev is None:
                continue
            c = piece_counts.get(word[j:i])
            if c is None:
                continue
            s = prev[0] + ilog2(c) - st
            mask = prev[1] | ((1 << (j - 1)) if j > 0 else 0)
            if top is None or s > top[0] or (s == top[0] and mask < top[1]):
                top = (s, mask)
        best[i] = top
    if best[n] is None:
        raise ValueError(f"word {word!r} has no vocabulary segmentation")
    score, mask = best[n]
    cuts = [0] + [p for p in range(1, n) if mask >> (p - 1) & 1] + [n]
    pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
    return score, mask, pieces


def word_substrings(words: DataFrame) -> DataFrame:
    """(w, freq, piece) for every start/length <= MAX_PIECE substring —
    one occurrence per row (overlaps counted), all JVM expressions."""
    return words.select(
        "w",
        "freq",
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(w)), i -> "
                "transform(sequence(1, least({m}, length(w) - i + 1)), "
                "l -> substring(w, i, l))))".format(m=MAX_PIECE)
            )
        ).alias("piece"),
    )


def unigram_viterbi_table(words: DataFrame) -> DataFrame:
    """Per distinct word: the Viterbi segmentation under the corpus
    substring unigram LM. `words` carries (w, freq)."""
    subs = word_substrings(words)
    counts = subs.groupBy("piece").agg(F.sum("freq").alias("c"))
    total = counts.agg(F.sum("c").cast("bigint").alias("C"))
    word_pc = (
        subs.select("w", "piece")
        .distinct()
        .join(counts, "piece")
        .groupBy("w")
        # array<struct> rather than a map column: Arrow hands structs to
        # pandas as plain dicts, so the Python side needs no map-type
        # special-casing
        .agg(F.collect_list(F.struct("piece", "c")).alias("pc"))
    )
    joined = (
        words.join(word_pc, "w")
        .crossJoin(F.broadcast(total))  # 1-row scalar, the centroid idiom
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "word": [], "freq": [], "n_pieces": [],
                "seg": [], "score": [], "mask": [],
            }
            for w, freq, pc, ctot in zip(
                pdf["w"], pdf["freq"], pdf["pc"], pdf["C"]
            ):
                score, mask, pieces = viterbi_segment(
                    str(w),
                    {e["piece"]: int(e["c"]) for e in pc},
                    int(ctot),
                )
                out["word"].append(str(w))
                out["freq"].append(int(freq))
                out["n_pieces"].append(len(pieces))
                out["seg"].append("|".join(pieces))
                out["score"].append(score)
                out["mask"].append(mask)
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        gen,
        schema=(
            "word string, freq bigint, n_pieces bigint, seg string, "
            "score bigint, mask bigint"
        ),
    )
