#!/usr/bin/env python3
"""Regenerate docs/QUERIES.md — the registry listing (name, check kind,
tags, one-line description) from mapreduce__spark.plans.REGISTRY."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mapreduce__spark.plans import REGISTRY  # noqa: E402


def main() -> None:
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    lines = [
        "# Query registry",
        "",
        "Auto-generated from `mapreduce__spark.plans.REGISTRY` "
        "(`python3 docs/gen_queries.py`). Every name is an entry in "
        "`__spark_entry__.queries()`; oracle = hash-checked against DuckDB at "
        "sf0.01, rows-only = approximate/stubbed by nature with pytest gates.",
        "",
        f"{len(REGISTRY)} queries: {n_oracle} oracle-checked, "
        f"{len(REGISTRY) - n_oracle} rows-only by design.",
        "",
        "| query | check | tags | what it does |",
        "|---|---|---|---|",
    ]
    for name, q in sorted(REGISTRY.items()):
        check = "oracle" if q.oracle else "rows-only"
        doc = (q.doc.splitlines()[0] if q.doc else "").replace("|", "\\|")
        lines.append(f"| `{name}` | {check} | {', '.join(q.tags)} | {doc} |")
    path = os.path.join(os.path.dirname(__file__), "QUERIES.md")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
