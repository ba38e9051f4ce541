"""Byte-pair-encoding tokenizer: Sennrich-style training over the
word-frequency dictionary and greedy rank-based encoding.

The split of labor is the production one: counting word frequencies is
the only corpus-sized step (one distributed pass); BPE training itself
iterates over the VOCABULARY (O(V) entries, driver-safe at any corpus
size — 100 TB of text still has a bounded distinct-word head), and
encoding broadcasts the learned merge ranks to an Arrow-batched per-doc
pass with per-batch word memoization (Zipf: a batch re-encodes few
distinct words).

Pure Python here is deliberate: training is inherently iterative-argmax
(not SQL-expressible — the registry query is rows-only with a pytest
reference-equivalence gate), and it runs on the driver over the compact
vocab, never inside a row loop.
"""

from __future__ import annotations

from collections import Counter

END = "</w>"


def train_bpe_merges(
    word_freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Learn `num_merges` merges from a word-frequency dict. Deterministic:
    argmax by (count, then lexicographically smallest pair) so training is
    reproducible across runs and partition layouts."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (END,): n for w, n in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_seq(sym, best): n for sym, n in vocab.items()}
    return merges


def _merge_seq(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Replace every non-overlapping occurrence of `pair` (left to right)."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode: repeatedly apply the lowest-rank merge present
    (all its occurrences) until none applies — the standard algorithm."""
    sym: tuple[str, ...] = tuple(word) + (END,)
    while len(sym) > 1:
        best_pair = None
        best_rank = None
        for p in zip(sym, sym[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        sym = _merge_seq(sym, best_pair)
    return list(sym)


def encode_tokens(
    tokens: list[str], ranks: dict[tuple[str, str], int], memo: dict[str, list[str]]
) -> list[str]:
    """Encode a token list with a shared word memo (per Arrow batch)."""
    out: list[str] = []
    for w in tokens:
        got = memo.get(w)
        if got is None:
            got = encode_word(w, ranks)
            memo[w] = got
        out.extend(got)
    return out
