"""Tier 2 — LLM-data-pipeline extensions (SURVEY.md §2b, O-22..O-27).

Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(word count, token stats, quality scoring, language ID, fingerprinting),
multimodal binary columns, and the event-stream window family in its
batch-equivalent (oracle-checkable) form — the true Structured Streaming
versions live in mapreduce__spark.streaming and are exercised in tests.

Also here: the O-1 kernel parity query (`kernel_search_count`), proving the
reference's RunMapReduceFramework programming model reproduces the flagship
query's exact output through Arrow-batched pandas map/reduce.
"""

from __future__ import annotations

# The tier-2 surface was split into per-family modules in round 13
# (round-12 VERDICT item 6). Importing them here populates REGISTRY via
# the @query decorator; the hoist below re-exports every name
# (underscore helpers included) so the long-standing
# `from mapreduce__spark.plans.tier2 import X` / `tier2.X` call sites
# keep working unchanged. DRIVER_WINDOW (plans/registry.py) pins the
# driver-checked prefix explicitly, so cross-module registration order
# is not part of the window contract.
from mapreduce__spark.plans import tier2_shared as _m_shared
from mapreduce__spark.plans import tier2_text as _m_text
from mapreduce__spark.plans import tier2_pipeline as _m_pipeline
from mapreduce__spark.plans import tier2_dedup as _m_dedup
from mapreduce__spark.plans import tier2_embedding as _m_embedding
from mapreduce__spark.plans import tier2_multimodal as _m_multimodal
from mapreduce__spark.plans import tier2_sources as _m_sources
from mapreduce__spark.plans import tier2_events as _m_events
from mapreduce__spark.plans import tier2_stats as _m_stats

for _mod in (_m_shared, _m_text, _m_pipeline, _m_dedup, _m_embedding,
             _m_multimodal, _m_sources, _m_events, _m_stats):
    for _k, _v in vars(_mod).items():
        if not _k.startswith("__"):
            globals()[_k] = _v
del _mod, _k, _v
