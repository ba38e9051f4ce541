#!/usr/bin/env python3
"""Regenerate docs/ATTESTATION.md — the driver-attestation coverage
table (round-11 VERDICT item 7): greens-per-query histogram and the
low-coverage names, auto-derived from the checked-in
CORRECTNESS_r*.json files so coverage decay is visible at a glance
instead of being recomputed by each judge.

A green row = rows_match AND schema_match AND hash_match AND no err.
Counts cover ALL committed rounds (unlike tests/test_registry_window.py,
which cuts at WINDOW_BASIS_ROUND to keep rotation policy stable
mid-round); the table states its own basis so the two never read
ambiguously."""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mapreduce__spark.plans import DRIVER_WINDOW, REGISTRY  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), "..")


def green_rows(max_round: int | None = None) -> list[tuple[str, int]]:
    rows: list[tuple[str, int]] = []
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        if max_round is not None and rnd > max_round:
            continue
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                rows.append((name, rnd))
    return rows


def render(max_round: int | None = None) -> str:
    """Render the coverage doc from CORRECTNESS files up to max_round
    (all committed rounds when None). The parameter exists so the
    doc-sync test can tolerate a driver dropping CORRECTNESS_r{N}.json
    into the tree AFTER the builder's close: the committed doc then
    legitimately reflects basis r1..r{N-1} (round-12 VERDICT item 1)."""
    rows = green_rows(max_round)
    rounds = sorted({r for _, r in rows})
    counts: dict[str, int] = {}
    last: dict[str, int] = {}
    for name, rnd in rows:
        counts[name] = counts.get(name, 0) + 1
        last[name] = max(rnd, last.get(name, 0))

    oracle = [n for n, q in REGISTRY.items() if q.oracle is not None]
    rows_only = [n for n, q in REGISTRY.items() if q.oracle is None]
    hist: dict[int, int] = {}
    for n in oracle:
        c = counts.get(n, 0)
        hist[c] = hist.get(c, 0) + 1

    lines = [
        "# Driver-attestation coverage",
        "",
        "Auto-generated (`python3 docs/gen_attestation.py`) from the",
        "committed `CORRECTNESS_r*.json` files. A green row means the",
        "driver's independent sf0.01 comparison matched rows, schema and",
        "value hash with no error. Queries outside the current 50-slot",
        "window remain bit-exact-gated by `tests/test_oracle.py` on every",
        "pytest run; this table tracks only the EXTERNAL driver signal.",
        "",
        f"Basis: rounds r{rounds[0]}..r{rounds[-1]}; registry "
        f"{len(REGISTRY)} queries ({len(oracle)} oracle-checked, "
        f"{len(rows_only)} rows-only by design).",
        "",
        "## Greens-per-query histogram (oracle-checked queries)",
        "",
        "| green driver rows | queries |",
        "|---|---|",
    ]
    for c in sorted(hist):
        lines.append(f"| {c} | {hist[c]} |")
    lines += [
        "",
        "## Low-coverage queries (0 or 1 green rows)",
        "",
        "These hold window slots by right at the next rotation.",
        "",
    ]
    low = sorted(
        (n for n in oracle if counts.get(n, 0) <= 1),
        key=lambda n: (counts.get(n, 0), n),
    )
    if low:
        lines += ["| query | greens | last green | in current window |",
                  "|---|---|---|---|"]
        for n in low:
            lg = f"r{last[n]}" if n in last else "—"
            inw = "yes" if n in DRIVER_WINDOW else "no"
            lines.append(f"| `{n}` | {counts.get(n, 0)} | {lg} | {inw} |")
    else:
        lines.append("(none)")
    lines += [
        "",
        "## Rows-only queries (no SQL oracle possible; driver checks rows)",
        "",
        ", ".join(f"`{n}`" for n in sorted(rows_only)),
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    out = os.path.join(ROOT, "docs", "ATTESTATION.md")
    with open(out, "w") as f:
        f.write(render())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
