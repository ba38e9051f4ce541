"""Change-data-capture apply: MERGE semantics on plain DataFrames and the
streaming foreachBatch upsert sink.

The relational core (apply_changes) is what Delta/Iceberg MERGE INTO
compiles to: delete-and-replace keyed rows, drop 'D' ops. The streaming
side applies each micro-batch to a VERSIONED parquet snapshot chain with
an atomically-swapped current-version pointer — the poor man's table
format, and deliberately so: every real table format is exactly this
(immutable snapshot files + an atomic pointer), so the pattern carries to
100 TB by swapping the pointer file for a metastore/catalog commit.

Exactly-once: foreachBatch can re-deliver a batch after recovery. Two
crash windows exist: (a) before the pointer commit — the re-run rebuilds
batch N's snapshot from the still-current N-1 pointer and commits, a
clean overwrite of a never-referenced path; (b) after the pointer commit
but before the source-offset commit — the re-run detects the pointer
already names v{N} and short-circuits (re-applying would read and
overwrite the same path in one job, which Spark rejects). Either way the
batch lands exactly once (the checkpointed source offsets guarantee no
batch is skipped).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(base: DataFrame, changes: DataFrame, key: str, op_col: str = "op") -> DataFrame:
    """Upsert semantics: rows with op 'U' replace (or insert) the base row
    with the same key; rows with op 'D' delete it. `changes` must carry
    the base schema plus `op_col`. One anti join + one union — both sides
    shuffle once on the uniform key.

    Any OTHER op value is rejected loudly: the anti join removes every
    changed key from the base, so an unrecognized op (producer bug,
    schema drift — 'u', 'I', null) would otherwise act as a silent
    DELETE. The check is a limit(1) probe, so it scans until the first
    offender, not the whole batch."""
    bad = changes.where(
        ~F.col(op_col).isin("U", "D") | F.col(op_col).isNull()
    ).limit(1)
    offenders = [r[op_col] for r in bad.collect()]
    if offenders:
        raise ValueError(
            f"apply_changes: unrecognized op {offenders[0]!r} in change "
            "batch (must be 'U' or 'D') — refusing to treat it as a delete"
        )
    keys = changes.select(key).distinct()
    kept = base.join(keys, key, "left_anti")
    upserts = changes.where(F.col(op_col) == "U").drop(op_col)
    return kept.unionByName(upserts)


def _pointer_path(state_root: str) -> str:
    return os.path.join(state_root, "_CURRENT")


def current_snapshot_path(state_root: str) -> str | None:
    """Path of the current snapshot, or None before the first commit."""
    try:
        with open(_pointer_path(state_root)) as fh:
            rel = fh.read().strip()
    except FileNotFoundError:
        return None
    return os.path.join(state_root, rel) if rel else None


def _commit_pointer(state_root: str, rel: str) -> None:
    """Atomic pointer swap (write-tmp + rename) — the commit primitive a
    real deployment replaces with a catalog/metastore transaction."""
    tmp = _pointer_path(state_root) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(rel)
    os.replace(tmp, _pointer_path(state_root))


def read_snapshot(spark, state_root: str, version: int | None = None) -> DataFrame:
    """Time travel over the snapshot chain: read the current state
    (version=None, via the pointer) or any retained historical version by
    its batch id — the AS OF read every table format offers, here a plain
    parquet read of the immutable per-batch directory.

    Only COMMITTED versions are readable: a v{N} directory can exist
    without a pointer commit (the crash window between write and
    _commit_pointer), and reading it would expose uncommitted — possibly
    torn, possibly being concurrently rebuilt — state. The pointer names
    the newest committed version; everything at or below it is immutable
    by construction."""
    cur = current_snapshot_path(state_root)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot under {state_root}")
    if version is None:
        return spark.read.parquet(cur)
    committed = int(os.path.basename(cur)[1:])
    if version > committed:
        raise FileNotFoundError(
            f"snapshot v{version} is not committed (newest committed "
            f"version under {state_root} is v{committed})"
        )
    path = os.path.join(state_root, f"v{version}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"snapshot v{version} not found under {state_root}")
    return spark.read.parquet(path)


def stream_upsert_sink(changes_sdf: DataFrame, key: str, state_root: str, checkpoint_dir: str):
    """foreachBatch upsert sink: each micro-batch of change rows merges
    into the current snapshot and commits a new immutable version.
    Returns the started StreamingQuery (AvailableNow trigger)."""

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        os.makedirs(state_root, exist_ok=True)
        rel = f"v{batch_id}"
        cur = current_snapshot_path(state_root)
        # Replay short-circuit: if the pointer already names this batch's
        # snapshot, the previous attempt got through the commit and only
        # the streaming checkpoint's offset commit was lost — re-applying
        # would read vN and overwrite vN in the same job (Spark rejects
        # that), wedging the stream on every restart. The batch is
        # already fully applied; do nothing.
        if cur is not None and os.path.basename(cur) == rel:
            return
        if cur is not None:
            base = spark.read.parquet(cur)
        else:
            base = spark.createDataFrame([], bdf.drop("op").schema)
        merged = apply_changes(base, bdf, key)
        merged.write.mode("overwrite").parquet(os.path.join(state_root, rel))
        _commit_pointer(state_root, rel)

    return (
        changes_sdf.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
