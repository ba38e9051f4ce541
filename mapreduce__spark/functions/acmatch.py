"""Aho-Corasick multi-pattern matching — the blocklist/kill-word stage.

Corpus filtering matches every document against a dictionary of
patterns (blocklists, PII trigger terms, eval-benchmark titles for
decontamination). Matching P patterns one at a time costs O(P * N);
the Aho-Corasick automaton (Aho & Corasick, CACM 1975) costs O(N +
matches) regardless of dictionary size: a trie with BFS-computed
failure links, each node's output set merged from its failure chain,
so every occurrence of every pattern — including overlapping ones and
patterns nested inside other patterns — is reported in one pass.

The differential: the Spark side runs the automaton; the DuckDB oracle
counts occurrences naively (every start position probed per pattern) —
the classic algorithm proven against the obvious one, like the
Viterbi/brute-force and banded/quadratic pairs elsewhere in the repo.

Scale shape: the automaton is built once from the pattern dictionary
(a broadcast-sized object — real blocklists are thousands of terms,
KBs) and shipped in the task closure; one corpus scan, Arrow-batched
mapInPandas, only (doc_id, pattern, count) rows leave the scan stage.
Reference parity: generalizes the reference's single-substring search
(Search.cpp:214-233, one needle per run) to a dictionary in one pass —
the closest thing to a direct reference-operator upgrade in tier 2.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


class AhoCorasick:
    """Classic goto/fail/output automaton over unicode code points."""

    def __init__(self, patterns: list[str]):
        if len(set(patterns)) != len(patterns):
            raise ValueError("duplicate patterns in dictionary")
        if any(not p for p in patterns):
            raise ValueError("empty pattern in dictionary")
        self.patterns = list(patterns)
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        self.fail: list[int] = [0]
        for idx, p in enumerate(self.patterns):
            node = 0
            for ch in p:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    self.fail.append(0)
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append(idx)
        # BFS failure links; merge output sets along the fail chain
        q = deque()
        for child in self.goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0)
                self.out[child] = self.out[child] + self.out[self.fail[child]]

    def count_matches(self, text: str) -> dict[int, int]:
        """pattern_index -> occurrence count (overlaps included)."""
        counts: dict[int, int] = {}
        node = 0
        for ch in text:
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for idx in self.out[node]:
                counts[idx] = counts.get(idx, 0) + 1
        return counts


def multi_pattern_counts(
    docs: DataFrame, patterns: list[str], text_col: str = "text"
) -> DataFrame:
    """(doc_id, pattern, matches) for every pattern with >=1 occurrence
    per document — one automaton pass per doc."""
    ac = AhoCorasick(patterns)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "pattern": [], "matches": []}
            for i, text in zip(pdf["doc_id"], pdf[text_col]):
                for idx, cnt in ac.count_matches(str(text)).items():
                    out["doc_id"].append(int(i))
                    out["pattern"].append(ac.patterns[idx])
                    out["matches"].append(cnt)
            yield pd.DataFrame(out)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, schema="doc_id bigint, pattern string, matches bigint"
    )
