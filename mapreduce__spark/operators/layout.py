"""Storage-layout shaping: Z-order (Morton) clustering for multi-dimension
file skipping.

Parquet readers prune files (and row groups) on per-file min/max column
statistics. A sort on ONE column gives perfect pruning on that column and
none on others; interleaving the bits of several normalized key columns
(the Z-order curve) makes every file cover a small hyper-rectangle of the
combined key space, so range predicates on ANY of the clustered columns
skip most files — the technique behind Delta/Iceberg OPTIMIZE ZORDER BY,
expressed here as plain Catalyst expressions + repartitionByRange.

Scale notes: the rank normalization here is an unpartitioned
percent_rank window per clustered column — the whole input funnels
through one task per column, acceptable only at the test scale this
repo writes at (percent_rank keeps the curve balanced under skewed
value distributions — raw-value scaling would squash everything into a
few cells). At warehouse scale replace it with approxQuantile bucket
boundaries broadcast as a literal array (zorder_value's docstring):
same curve semantics, no global window. The z-value itself is pure bit
arithmetic (whole-stage codegen); the write is range-partitioned on z
so files tile the curve contiguously.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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


def zorder_value(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Add a `_z` Morton code over `cols` (each rank-normalized to a
    2^bits grid). percent_rank here is an UNPARTITIONED window per column
    over the full-width rows — a one-task funnel acceptable only at the
    scale this repo writes at; at warehouse scale replace it with
    approxQuantile bucket boundaries broadcast as a literal array (same
    curve semantics, no global window, no wide rows through one task)."""
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
        w = Window.orderBy(F.col(c))
        cell = F.least(
            F.lit((1 << bits) - 1),
            F.floor(F.percent_rank().over(w) * (1 << bits)).cast("bigint"),
        )
        out = out.withColumn(f"_cell_{c}", cell)
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

    Output file count is computed from the ACTUAL input bytes (summed
    through the Hadoop FileSystem of each input file, so any FS scheme
    works), not guessed from row counts — compressed parquet bytes are
    the quantity the target is stated in. The rewrite is one shuffle-
    free coalesce-style repartition when unclustered, or one range
    exchange when clustered; at warehouse scale this runs per-partition
    (compact yesterday's directory), never corpus-wide.

    Returns {"n_input_files", "n_output_files", "input_bytes", "rows"}
    — and the row count is re-read from the DESTINATION, so the caller's
    preservation assertion is against what actually landed."""
    df = spark.read.parquet(src_path)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    inputs = df.inputFiles()
    total = 0
    for f in inputs:
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(hconf)
        total += fs.getFileStatus(p).getLen()
    n_out = max(1, -(-total // target_file_bytes))  # ceil-div
    if cluster_by:
        out = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_path)
    back = spark.read.parquet(dst_path)
    return {
        "n_input_files": len(inputs),
        "n_output_files": len(back.inputFiles()),
        "input_bytes": total,
        "rows": back.count(),
    }
