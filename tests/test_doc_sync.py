"""Registry-vs-docs sync (round-3 VERDICT item 8): the query counts the
docs advertise drifted across rounds (93 -> 104 -> 106) because nothing
re-derived them. These tests pin every documented count to the live
REGISTRY so a new query without a doc regen fails the suite."""

from __future__ import annotations

import os
import re

from mapreduce__spark.plans import REGISTRY

ROOT = os.path.join(os.path.dirname(__file__), "..")
COUNT_RE = re.compile(r"(\d+) queries: (\d+) oracle-checked, (\d+) rows-only")


def _counts():
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    return len(REGISTRY), n_oracle, len(REGISTRY) - n_oracle


def test_queries_md_matches_registry():
    """docs/QUERIES.md must be regenerated (docs/gen_queries.py) whenever
    the registry changes: its summary counts AND its row set must match."""
    text = open(os.path.join(ROOT, "docs", "QUERIES.md")).read()
    m = COUNT_RE.search(text)
    assert m, "QUERIES.md lost its summary count line"
    assert tuple(int(g) for g in m.groups()) == _counts(), (
        "QUERIES.md counts stale — run python3 docs/gen_queries.py"
    )
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M))
    assert listed == set(REGISTRY), (
        f"QUERIES.md rows out of sync: missing {set(REGISTRY) - listed}, "
        f"stale {listed - set(REGISTRY)} — run python3 docs/gen_queries.py"
    )


def test_readme_count_matches_registry():
    text = open(os.path.join(ROOT, "README.md")).read()
    m = COUNT_RE.search(text)
    assert m, "README lost its query-count sentence"
    assert tuple(int(g) for g in m.groups()) == _counts(), (
        "README query counts stale — update the machine-generated-list "
        "sentence to match len(REGISTRY)"
    )


def test_attestation_md_in_sync():
    """Round-11 VERDICT item 7: docs/ATTESTATION.md (greens-per-query
    coverage) must be regenerated whenever the registry or the committed
    CORRECTNESS files change — the render is a pure function of both, so
    byte-compare against a fresh render.

    Round-12 VERDICT item 1: the driver drops CORRECTNESS_r{N}.json into
    the tree AFTER the builder's close, so a doc whose basis is exactly
    one round behind the newest file is a driver-drop artifact, not
    staleness — accept a render at basis max_round-1 too. Anything older
    (or a registry drift) still fails."""
    import glob
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_attestation", os.path.join(ROOT, "docs", "gen_attestation.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    on_disk = open(os.path.join(ROOT, "docs", "ATTESTATION.md")).read()
    newest = max(
        int("".join(c for c in os.path.basename(p) if c.isdigit()))
        for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
    )
    accepted = {mod.render(), mod.render(max_round=newest - 1)}
    assert on_disk in accepted, (
        "docs/ATTESTATION.md stale — run python3 docs/gen_attestation.py"
    )


def test_survey_newest_count_matches_registry():
    """Round-7 VERDICT item 7: SURVEY.md's round addenda quote the
    registry size; the NEWEST mention (last in the file) must track the
    live registry so the next addendum can't drift. Older mentions are
    historical narrative and deliberately unpinned."""
    text = open(os.path.join(ROOT, "SURVEY.md")).read()
    ms = list(
        re.finditer(
            # \s+ between tokens: the survey hard-wraps at 79 cols, so
            # the count sentence may break across lines
            r"(\d+) queries\s+\((\d+)\s+oracle-checked,\s+(\d+)\s+rows-only",
            text,
        )
    )
    assert ms, "SURVEY.md lost its registry-count sentence"
    assert tuple(int(g) for g in ms[-1].groups()) == _counts(), (
        "SURVEY.md newest registry count stale — update the latest round"
        " addendum"
    )
