"""Z-order layout: per-file min/max spans must shrink on BOTH clustered
dimensions versus a single-column sort — measured from the actual parquet
footers (the statistics readers prune on), not from plan text."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from mapreduce__spark.operators.layout import write_zordered
from mapreduce__spark.sources import load_table


def _avg_span_fraction(path: str, col: str) -> float:
    """Mean over files of (file max - file min) / (global max - global
    min) for `col` — the fraction of the key range a file covers; the
    expected fraction of files a point/range predicate must read."""
    spans, lo, hi = [], None, None
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = _col_idx(md, col)
        fmin = min(
            md.row_group(i).column(idx).statistics.min
            for i in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(i).column(idx).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append((fmin, fmax))
        lo = fmin if lo is None else min(lo, fmin)
        hi = fmax if hi is None else max(hi, fmax)
    width = hi - lo
    return sum((b - a) / width for a, b in spans) / len(spans)


def _col_idx(md, name: str) -> int:
    for i in range(md.row_group(0).num_columns):
        if md.row_group(0).column(i).path_in_schema == name:
            return i
    raise KeyError(name)


def test_zorder_shrinks_spans_on_both_dimensions(spark, sf_small, tmp_path):
    o = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 8

    single = str(tmp_path / "single_sort")
    (
        o.repartitionByRange(n_files, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.parquet(single)
    )
    zpath = str(tmp_path / "zorder")
    write_zordered(o, zpath, ["o_custkey", "o_totalprice"], n_files=n_files)

    # single-column sort: near-perfect on the sort key, near-useless on
    # the other (each file spans ~the whole price range)
    assert _avg_span_fraction(single, "o_custkey") < 0.25
    assert _avg_span_fraction(single, "o_totalprice") > 0.7

    # z-order: BOTH dimensions shrink to a fraction of the space — the
    # theoretical tile edge for 8 files on a 2-d curve is ~1/sqrt(8)≈0.35
    zc = _avg_span_fraction(zpath, "o_custkey")
    zp = _avg_span_fraction(zpath, "o_totalprice")
    assert zc < 0.6 and zp < 0.6, (zc, zp)
    # and the clustered write loses no rows
    assert spark.read.parquet(zpath).count() == o.count()


def test_zorder_guards_reject_silent_corruption(spark, sf_small):
    """Over-budget bit interleave (>63 bits) and internal-name collisions
    must raise loudly instead of silently corrupting the curve or
    dropping user columns."""
    import pytest

    from mapreduce__spark.operators.layout import zorder_value

    o = load_table(spark, sf_small, "orders").select("o_orderkey", "o_custkey")
    with pytest.raises(ValueError, match="interleaved width"):
        zorder_value(o, ["o_orderkey", "o_custkey"], bits=32)
    with pytest.raises(ValueError, match="_z"):
        zorder_value(o.withColumn("_z", o.o_orderkey), ["o_orderkey"], bits=8)


def test_no_partitionless_window_outside_exemptions():
    """Source lint (round-8 verdict item 4): `Window.orderBy(...)` with no
    partitionBy funnels the whole relation through ONE task — forbidden in
    operator/plan code except where the windowed relation is a BOUNDED
    histogram/summary (documented at the site). A chained partitionBy
    always precedes orderBy syntactically, so the literal `Window.orderBy(`
    in code is exactly the partition-less form."""
    import re

    root = os.path.join(os.path.dirname(__file__), "..", "mapreduce__spark")
    # file -> expected number of partition-less windows, each documented
    # as histogram/summary-sized at the call site
    # the two sites (in their post-split family modules): the
    # histogram-sized rank map (round 8, tier2_stats) and
    # seasonal_decompose's hour spine (span-sized, post-aggregation,
    # tier2_events)
    exemptions = {"plans/tier2_events.py": 1, "plans/tier2_stats.py": 1}
    found: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root).replace(os.sep, "/")
            with open(path) as f:
                src = f.read()
            # strings/comments can mention the pattern; count only code
            # lines (no leading #, not inside a docstring is approximated
            # by requiring an assignment/usage shape)
            n = 0
            for line in src.splitlines():
                stripped = line.strip()
                # prose mentions live in comments/docstrings — backticked
                # or em-dash-adjacent; real call sites are bare
                if stripped.startswith("#") or "`" in stripped or "—" in stripped:
                    continue
                if re.search(r"\bWindow\.orderBy\(", stripped):
                    n += 1
            if n:
                found[rel] = n
    assert found == exemptions, (
        f"partition-less Window.orderBy sites changed: {found} != "
        f"{exemptions} — a new one-task window funnel needs a documented "
        "bounded-relation justification AND an exemption entry here"
    )


def test_zorder_rejects_overwide_grid(spark):
    """bits=63 on one column passed the old width check but crashed plan
    construction (2^63 is not a valid long literal); both overwide cases
    must be a clear ValueError."""
    import pytest

    from mapreduce__spark.operators.layout import zorder_value

    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(ValueError, match="bits"):
        zorder_value(df, ["a"], bits=63)
    with pytest.raises(ValueError, match="bits"):
        zorder_value(df, ["a", "a"], bits=32)
    # the widest legal single-column grid still builds a plan
    assert "_z" in zorder_value(df, ["a"], bits=62).columns
