"""Storage-layout shaping: Z-order (Morton) clustering for multi-dimension
file skipping.

Parquet readers prune files (and row groups) on per-file min/max column
statistics. A sort on ONE column gives perfect pruning on that column and
none on others; interleaving the bits of several normalized key columns
(the Z-order curve) makes every file cover a small hyper-rectangle of the
combined key space, so range predicates on ANY of the clustered columns
skip most files — the technique behind Delta/Iceberg OPTIMIZE ZORDER BY,
expressed here as plain Catalyst expressions + repartitionByRange.

Scale notes: cell assignment is equi-depth (balanced under skew, like
the percent_rank this replaced in round 9) but WITHOUT a global
window: per-column cut points come from a bounded value histogram
(groupBy(col).count(), collected only when distinct count stays under
a cap) or, for over-cap numeric columns, from approxQuantile — either
way at most 2^bits-1 values, broadcast back into the scan as ONE
array literal probed by a codegen'd size(filter(...)). Nothing
corpus-sized funnels through one task. The z-value itself is pure bit
arithmetic (whole-stage codegen); the write is range-partitioned on z
so files tile the curve contiguously.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Distinct-value cap above which the exact histogram path gives way to
# approxQuantile: 2^16 (value, count) rows is a trivially safe driver
# materialization, and any column with more distinct values than that
# gets statistically indistinguishable cuts from the sketch anyway.
HISTOGRAM_CARDINALITY_CAP = 1 << 16


def _interleave_bits(cells: list[Column], bits: int) -> Column:
    """Morton-interleave `bits`-wide integer cell ids, JVM-side: output
    bit (b * ncols + i) takes bit b of column i."""
    z = F.lit(0).cast("bigint")
    n = len(cells)
    for b in range(bits):
        for i, c in enumerate(cells):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit.cast("bigint"), b * n + i))
    return z


def _equidepth_cuts(df: DataFrame, col: str, bits: int) -> list:
    """Interior cut points for an equi-depth 2^bits grid on `col`:
    cuts[k-1] = smallest value whose lower cumulative count reaches
    k/2^bits of the rows, so `size(filter(cuts, c -> c <= v))` is a
    balanced cell id even under heavy skew (a hot value spans several
    cells' worth of mass but contributes only one cut).

    Exact path: the bounded value histogram (groupBy(col).count()) when
    the column's distinct count stays under HISTOGRAM_CARDINALITY_CAP —
    limit(cap+1) detects over-cap without a separate countDistinct job.
    Over-cap numeric columns fall back to approxQuantile (error 1/2^bits
    of a cell); over-cap non-numeric columns raise, since there is no
    bounded sketch for arbitrary orderable types.
    """
    n_cells = 1 << bits
    hist = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .limit(HISTOGRAM_CARDINALITY_CAP + 1)
        .collect()
    )
    if len(hist) <= HISTOGRAM_CARDINALITY_CAP:
        pairs = sorted((r[0], r["_cnt"]) for r in hist if r[0] is not None)
        total = sum(c for _, c in pairs)
        if total == 0:
            return []
        cuts, cum, k = [], 0, 1
        for v, c in pairs:
            # lower cumulative rank of v, as a fraction of total rows
            while k < n_cells and cum * n_cells >= k * total:
                cuts.append(v)
                k += 1
            cum += c
        return cuts
    dtype = dict(df.dtypes)[col]
    numeric = dtype in ("tinyint", "smallint", "int", "bigint", "float", "double") or (
        dtype.startswith("decimal")
    )
    if not numeric:
        raise ValueError(
            f"zorder_value: column {col!r} ({dtype}) has more than "
            f"{HISTOGRAM_CARDINALITY_CAP} distinct values and no numeric "
            "quantile sketch exists for its type — pre-bucket it (e.g. a "
            "fixed-width prefix or hash band) before clustering on it"
        )
    probs = [k / n_cells for k in range(1, n_cells)]
    qs = df.stat.approxQuantile(col, probs, 1.0 / (4 * n_cells))
    return [q for q in qs if q is not None]


def zorder_value(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Add a `_z` Morton code over `cols`, each equi-depth-normalized to
    a 2^bits grid. Cut points per column come from `_equidepth_cuts`
    (bounded histogram, approxQuantile fallback) and ride into the scan
    as ONE <=2^bits-1-element array literal; the cell id is
    size(filter(cuts, c -> c <= v)) — codegen'd, no window, no shuffle
    before the final range-partitioned write."""
    if bits * len(cols) > 63 or bits > 62:
        raise ValueError(
            f"zorder_value: bits={bits}, bits*len(cols) = {bits * len(cols)} — "
            "the interleaved width must stay <= 63 (Java shift amounts mask "
            "mod 64, so higher bits would silently wrap; bit 64 is the "
            "bigint sign) and bits itself <= 62 (the 2^bits grid literal "
            "must be a valid long); reduce bits or cluster fewer columns"
        )
    clobbered = ({"_z"} | {f"_cell_{c}" for c in cols}) & set(df.columns)
    if clobbered:
        raise ValueError(
            f"zorder_value: input already has column(s) {sorted(clobbered)} — "
            "the internal names would silently replace and then drop them"
        )
    out = df
    cells = []
    for c in cols:
        cuts = _equidepth_cuts(df, c, bits)
        if cuts:
            cell = (
                F.size(F.filter(F.lit(cuts), lambda b: b <= F.col(c)))
                .cast("bigint")
            )
            # NULLs order first: filter over the literal array yields
            # NULL size for a NULL probe, so pin them to cell 0
            cell = F.coalesce(cell, F.lit(0).cast("bigint"))
        else:
            cell = F.lit(0).cast("bigint")
        out = out.withColumn(f"_cell_{c}", F.least(F.lit((1 << bits) - 1), cell))
        cells.append(F.col(f"_cell_{c}"))
    out = out.withColumn("_z", _interleave_bits(cells, bits))
    return out.drop(*[f"_cell_{c}" for c in cols])


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int, bits: int = 8
) -> None:
    """Write parquet tiled along the Z-curve: each output file covers a
    compact hyper-rectangle of the clustered columns' space, so min/max
    stats prune on every clustered dimension."""
    (
        zorder_value(df, cols, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_files(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 << 20,
    cluster_by: list[str] | None = None,
) -> dict:
    """Small-files compaction — the table-maintenance op behind Delta/
    Iceberg OPTIMIZE / rewrite_data_files, expressed as plain Spark: a
    streaming ingest (or an over-parallel write) leaves thousands of
    KB-scale files whose per-file open/footer cost dominates scans;
    rewrite them into ~target-byte files, optionally range-clustered on
    `cluster_by` so the rewrite also buys min/max pruning (pair with
    write_zordered for multi-dimension clustering).

    Output file count is computed from the ACTUAL input bytes (one
    listStatus per input DIRECTORY — not a per-file getFileStatus round
    trip, which at thousands of small files is itself a scan-killer on
    object stores), not guessed from row counts — compressed parquet
    bytes are the quantity the target is stated in. The unclustered
    rewrite is a genuinely shuffle-free coalesce when reducing file
    count (repartition only when growing — coalesce cannot add
    partitions); the clustered rewrite is one range exchange. At
    warehouse scale this runs per-partition (compact yesterday's
    directory), never corpus-wide.

    Returns {"n_input_files", "n_output_files", "input_bytes", "rows",
    "plan"} — the row count is re-read from the DESTINATION, so the
    caller's preservation assertion is against what actually landed, and
    "plan" is the rewrite's executed plan string so callers/tests can
    assert the no-Exchange claim mechanically."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def _qualified(p: str) -> str:
        hp = jvm.org.apache.hadoop.fs.Path(p)
        return hp.getFileSystem(hconf).makeQualified(hp).toString().rstrip("/")

    if _qualified(src_path) == _qualified(dst_path):
        raise ValueError(
            "compact_files: src_path and dst_path resolve to the same "
            f"location ({_qualified(src_path)}) — mode('overwrite') onto "
            "the path being lazily read would destroy the source mid-"
            "rewrite; compact into a fresh directory and swap after"
        )
    df = spark.read.parquet(src_path)
    inputs = df.inputFiles()
    by_dir: dict[str, set[str]] = {}
    for f in inputs:
        d, name = f.rsplit("/", 1)
        by_dir.setdefault(d, set()).add(name)
    total = 0
    for d, names in by_dir.items():
        hp = jvm.org.apache.hadoop.fs.Path(d)
        fs = hp.getFileSystem(hconf)
        for st in fs.listStatus(hp):
            if st.getPath().getName() in names:
                total += st.getLen()
    n_out = max(1, -(-total // target_file_bytes))  # ceil-div
    if cluster_by:
        out = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    elif n_out <= df.rdd.getNumPartitions():
        out = df.coalesce(n_out)
    else:
        out = df.repartition(n_out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    out.write.mode("overwrite").parquet(dst_path)
    back = spark.read.parquet(dst_path)
    return {
        "n_input_files": len(inputs),
        "n_output_files": len(back.inputFiles()),
        "input_bytes": total,
        "rows": back.count(),
        "plan": plan,
    }
