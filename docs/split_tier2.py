#!/usr/bin/env python3
"""One-shot splitter for plans/tier2.py (round-12 VERDICT item 6): break
the 11.5k-line module into per-family modules while preserving semantics.

Mechanics:
- AST-parse tier2.py into top-level UNITS (each with its leading comment
  block and decorators). The module docstring + import header are treated
  as the canonical header every emitted file reuses.
- @query units are classified into a family by their tags (priority
  order below); non-query units (constants/helpers) follow the units
  that reference them.
- A fixpoint pass moves anything referenced across family lines into
  tier2_shared (queries included — REGISTRY is keyed by name and the
  driver window is the explicit DRIVER_WINDOW tuple, so registration
  order across modules is free to change).
- Within every emitted module, units keep their ORIGINAL relative order,
  so decoration-time name references (oracle f-strings, helper calls)
  resolve exactly as before; cross-module references resolve through
  tier2_shared, imported first.
- tier2.py becomes a facade that imports every family module and hoists
  ALL their names (underscore included) so every existing
  `from mapreduce__spark.plans.tier2 import X` and `tier2.X` keeps
  working.

Run with --write to emit files; default is a dry-run report.
"""

from __future__ import annotations

import ast
import re
import sys
from collections import defaultdict

SRC = "mapreduce__spark/plans/tier2.py"
PKG = "mapreduce__spark/plans"

# tag -> family, first match wins (checked in this order)
FAMILY_RULES = [
    ("multimodal", "multimodal"),
    ("source", "sources"),
    ("sources", "sources"),
    ("formats", "sources"),
    ("sink", "sources"),
    ("layout", "sources"),
    ("scan", "sources"),
    ("dedup", "dedup"),
    ("similarity", "embedding"),
    ("clustering", "embedding"),
    ("streaming", "events"),
    ("timeseries", "events"),
    ("events", "events"),
    ("window", "events"),
    ("changepoint", "events"),
    ("monitoring", "events"),
    ("analytics", "events"),
    ("stats", "stats"),
    ("agg", "stats"),
    ("sketch", "stats"),
    ("profiling", "stats"),
    ("calibration", "stats"),
    ("normalization", "stats"),
    ("approx", "stats"),
    ("graph", "stats"),
    ("pipeline", "pipeline"),
    ("quality", "pipeline"),
    ("sampling", "pipeline"),
    ("curation", "pipeline"),
]
DEFAULT_FAMILY = "text"  # text / pipeline / tokenizer / quality / the rest
FAMILY_ORDER = [
    "shared", "text", "pipeline", "dedup", "embedding", "multimodal",
    "sources", "events", "stats",
]

DOCSTRINGS = {
    "shared": "Shared constants, helpers and cross-family queries for the tier-2 family modules (split from tier2.py, round 13). Imported FIRST by the tier2 facade so every family module can star-import it.",
    "pipeline": "Tier-2 training-data-pipeline family: quality gates, PII scrub, decontamination, sampling, mixture weights, the composed flagships (O-24 pipeline face; split from tier2.py, round 13).",
    "text": "Tier-2 text analysis, quality and training-data-pipeline queries (O-24; split from tier2.py, round 13).",
    "dedup": "Tier-2 deduplication family: exact, MinHash-LSH, SimHash, Jaccard, containment, CDC, winnowing, semantic (O-22; split from tier2.py, round 13).",
    "embedding": "Tier-2 embedding and similarity-search family: ANN, PQ, MMR, quantization, clustering (O-23; split from tier2.py, round 13).",
    "multimodal": "Tier-2 multimodal decode family: BMP/PNG/GIF/JPEG pixels, WAV audio, video indexes (O-25; split from tier2.py, round 13).",
    "sources": "Tier-2 source/format family: archives, parquet internals, CSV/ORC/Avro, schema evolution, layout (O-3; split from tier2.py, round 13).",
    "events": "Tier-2 event-stream family: windows, sessionization, funnels, time series, stream-fold twins (O-26; split from tier2.py, round 13).",
    "stats": "Tier-2 statistics and sketch family: tests, moments, sketches, heavy hitters, graph metrics (O-11/O-12; split from tier2.py, round 13).",
}

IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def main() -> None:
    write = "--write" in sys.argv
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # ---- header: module docstring + leading imports --------------------
    body = tree.body
    i = 0
    doc = ""
    if isinstance(body[0], ast.Expr) and isinstance(body[0].value, ast.Constant):
        doc = ast.get_source_segment(src, body[0])
        i = 1
    header_end = body[i - 1].end_lineno if i else 0
    while i < len(body) and isinstance(body[i], (ast.Import, ast.ImportFrom)):
        header_end = body[i].end_lineno
        i += 1
    header_src = "".join(lines[(body[1].lineno - 1) if doc else 0:header_end])
    # future import must lead every file; strip it from the reusable part
    header_src = header_src.replace(
        "from __future__ import annotations\n", ""
    )

    # ---- units ----------------------------------------------------------
    units = []  # dict: start, end, src, names, kind, family, tags
    prev_end = header_end
    for node in body[i:]:
        start = node.lineno
        if getattr(node, "decorator_list", None):
            start = min(start, min(d.lineno for d in node.decorator_list))
        # attach the comment/blank block since the previous unit
        cstart = prev_end + 1
        seg = "".join(lines[cstart - 1:node.end_lineno])
        names = set()
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        names.add(n.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names.add(node.target.id)
        elif isinstance(node, ast.Import):
            for a in node.names:
                names.add(a.asname or a.name.split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                names.add(a.asname or a.name)
        kind = "other"
        tags: tuple[str, ...] = ()
        for d in getattr(node, "decorator_list", []):
            if isinstance(d, ast.Call) and getattr(d.func, "id", "") == "query":
                kind = "query"
                m = re.search(r"tags=\(([^)]*)\)", ast.get_source_segment(src, d) or "")
                if m:
                    tags = tuple(re.findall(r'"([a-z0-9_]+)"', m.group(1)))
        units.append(
            dict(start=cstart, end=node.end_lineno, src=seg, names=names,
                 kind=kind, tags=tags, family=None, node=node)
        )
        prev_end = node.end_lineno

    # duplicate top-level names would collide in the facade hoist
    seen: dict[str, int] = {}
    for idx, u in enumerate(units):
        for n in u["names"]:
            if n in seen:
                print(f"WARN duplicate top-level name {n} (units {seen[n]} and {idx})")
            seen[n] = idx

    # ---- initial classification ----------------------------------------
    for u in units:
        if u["kind"] == "query":
            fam = DEFAULT_FAMILY
            for tag, f in FAMILY_RULES:
                if tag in u["tags"]:
                    fam = f
                    break
            u["family"] = fam

    name_to_unit = {}
    for idx, u in enumerate(units):
        for n in u["names"]:
            name_to_unit[n] = idx

    # referenced unit-names per unit (excluding self) — AST Name loads
    # only, so docstrings and comments mentioning a query name don't
    # create phantom cross-family dependencies
    refs: list[set[int]] = []
    for idx, u in enumerate(units):
        r = set()
        for n in ast.walk(u["node"]):
            if isinstance(n, ast.Name):
                j = name_to_unit.get(n.id)
                if j is not None and j != idx:
                    r.add(j)
        refs.append(r)

    # helpers start unassigned; the fixpoint assigns/moves them. It runs
    # in two rounds: after the first converges, units referenced by
    # NOBODY (e.g. the stage_fixture_corpora entry point called only
    # from registry.py) get the default family — and the second round
    # then pulls THEIR cross-family dependencies into shared too.
    def fixpoint() -> None:
        changed = True
        while changed:
            changed = False
            ref_fams: dict[int, set] = defaultdict(set)
            for idx, u in enumerate(units):
                for j in refs[idx]:
                    ref_fams[j].add(u["family"])
            for idx, u in enumerate(units):
                rf = {f for f in ref_fams.get(idx, set()) if f is not None}
                if u["family"] is None:
                    if len(rf) == 1:
                        u["family"] = rf.pop()
                        changed = True
                    elif len(rf) > 1:
                        u["family"] = "shared"
                        changed = True
                elif u["family"] != "shared":
                    if rf - {u["family"], "shared"}:
                        u["family"] = "shared"
                        changed = True
                # shared units referencing family units pull them in too
                if u["family"] == "shared":
                    for j in refs[idx]:
                        if units[j]["family"] not in (None, "shared"):
                            units[j]["family"] = "shared"
                            changed = True

    fixpoint()
    for u in units:
        if u["family"] is None:  # referenced by nobody: keep with text
            u["family"] = DEFAULT_FAMILY
    fixpoint()

    # ---- report ----------------------------------------------------------
    fam_lines = defaultdict(int)
    fam_queries = defaultdict(int)
    for u in units:
        fam_lines[u["family"]] += u["src"].count("\n")
        if u["kind"] == "query":
            fam_queries[u["family"]] += 1
    print("family line/query counts:")
    for f in FAMILY_ORDER:
        print(f"  {f:12s} {fam_lines[f]:6d} lines  {fam_queries[f]:3d} queries")
    print(f"  header {header_src.count(chr(10))} lines")

    if not write:
        return

    star = (
        "from mapreduce__spark.plans.tier2_shared import *  # noqa: F401,F403\n"
    )
    for fam in FAMILY_ORDER:
        out = [f'"""{DOCSTRINGS[fam]}"""\n\n']
        out.append("from __future__ import annotations\n\n")
        out.append(header_src)
        if fam != "shared":
            out.append("\n" + star)
        for u in units:
            if u["family"] == fam:
                out.append(u["src"])
        if fam == "shared":
            out.append(
                "\n\n# star-export EVERYTHING (underscore helpers included:"
                " the family\n# modules and the tier2 facade re-export by"
                " name, and tests reach\n# private helpers through the"
                " facade)\n__all__ = [k for k in list(globals()) if not"
                " k.startswith('__')]\n"
            )
        path = f"{PKG}/tier2_{fam}.py"
        with open(path, "w") as fh:
            fh.write("".join(out))
        print(f"wrote {path}")

    facade = [
        doc.rstrip() + "\n",
        '''
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
''',
    ]
    with open(SRC, "w") as fh:
        fh.write("".join(facade))
    print(f"wrote {SRC} (facade)")


if __name__ == "__main__":
    main()
