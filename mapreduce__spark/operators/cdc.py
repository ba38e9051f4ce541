"""Change-data-capture apply: MERGE semantics on plain DataFrames and the
streaming foreachBatch upsert sink.

The relational core (apply_changes) is what Delta/Iceberg MERGE INTO
compiles to: delete-and-replace keyed rows, drop 'D' ops. The streaming
side applies each micro-batch to a VERSIONED, hash-BUCKETED parquet
snapshot with an atomically-swapped current-version pointer — the poor
man's table format, and deliberately so: every real table format is
exactly this (immutable data files + a manifest + an atomic commit), so
the pattern carries to 100 TB by swapping the pointer file for a
metastore/catalog commit. A batch rewrites only the buckets containing
changed keys (manifest entries for untouched buckets keep pointing at
the version that last wrote them), so per-batch I/O is bounded by change
volume, not table size.

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

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _orderable(dt) -> bool:
    """Whether Spark can ORDER BY a value of this type (struct comparators
    require every field to be orderable). Maps (and variants) are not;
    arrays/structs are orderable iff their element/field types are."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if getattr(T, "VariantType", None) is not None and isinstance(
        dt, T.VariantType
    ):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Upsert semantics: rows with op 'U' replace (or insert) the base row
    with the same key; rows with op 'D' delete it. `changes` must carry
    the base schema plus `op_col`. One anti join + one union — both sides
    shuffle once on the uniform key.

    CONTRACT: the change batch must be a NET change set — at most one row
    per key — unless `seq_col` names a monotonically-increasing sequence
    column (commit LSN, source offset, event time). With `seq_col` the
    batch is first compacted to the latest row per key (max seq wins;
    a deterministic op-code tiebreak of 'U' over 'D' guards against
    producers that emit a D+U pair under one sequence number), so a
    micro-batch carrying a key's full history applies as its final
    state. WITHOUT `seq_col`, duplicate keys are rejected loudly rather
    than guessed at: two 'U' rows for one key would both survive the
    anti-join+union (a keyed-table invariant violation), and which of a
    D/U pair "wins" would depend on nothing the data states. The probe
    is a limit(1) over a count>1 aggregate — one narrow shuffle of the
    key column, bounded output.

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
    if seq_col is not None:
        # Compact to the latest row per key. max_by is a hash aggregate
        # (no window/sort); the struct comparator orders by (seq, op) so
        # equal-seq D/U pairs resolve deterministically ('U' > 'D').
        # seq_col survives only if it's part of the base schema (an
        # updated_at-style table column); a transport-only LSN is dropped
        # so the union below stays name-aligned with base.
        keep = [
            c for c in changes.columns
            if c != seq_col or seq_col in base.columns
        ]
        # comparator extends past (seq, op) to the kept ORDERABLE columns:
        # max_by is documented NON-deterministic on ties, and a producer
        # stamping one transaction's rows with one LSN yields exact
        # (seq, op) ties — the extended lexicographic ordering makes the
        # winner a function of the data, not the partitioning. Struct
        # comparison requires every field to be orderable, so map/variant
        # columns are excluded (a batch carrying one would otherwise fail
        # AnalysisException); if such a column is the ONLY differing field
        # at a tie, the winner is that far deterministic but the excluded
        # column's value is whichever row won — the documented residue.
        fields = {f.name: f.dataType for f in changes.schema.fields}
        tie_cols = [c for c in keep if _orderable(fields[c])]
        changes = (
            changes.groupBy(key)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in keep]),
                    F.struct(
                        F.col(seq_col),
                        F.col(op_col),
                        *[F.col(c) for c in tie_cols],
                    ),
                ).alias("_latest")
            )
            .select([F.col(f"_latest.{c}").alias(c) for c in keep])
        )
    else:
        dup = (
            changes.groupBy(key)
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > 1)
            .limit(1)
        )
        dups = [r[key] for r in dup.collect()]
        if dups:
            raise ValueError(
                f"apply_changes: multiple change rows for key {dups[0]!r} "
                "in one batch — pass seq_col to compact to the latest row "
                "per key, or pre-net the batch upstream"
            )
    # NULL-SAFE key match: a plain equi anti-join never matches NULL keys,
    # so a NULL-key upsert would DUPLICATE an existing NULL-key base row
    # (and a NULL-key delete would no-op) — the keyed-table invariant this
    # function loudly defends everywhere else. eqNullSafe treats NULL as a
    # join value, so NULL-key changes replace/delete like any other key.
    keys = changes.select(F.col(key).alias("_ck")).distinct()
    kept = base.join(keys, F.col(key).eqNullSafe(F.col("_ck")), "left_anti")
    upserts = changes.where(F.col(op_col) == "U").drop(op_col)
    return kept.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    op_col: str = "op",
    include_preimage: bool = False,
) -> DataFrame:
    """The INVERSE of apply_changes: derive the NET change batch that
    transforms `old` into `new` — how a change feed is GENERATED when
    the source system offers only snapshots (the nightly-full-dump
    reality most warehouse ingestion starts from; Delta calls the
    forward direction CDF/table_changes). Law, property-tested in
    tests/test_cdc.py:

        apply_changes(old, snapshot_diff(old, new, key), key) == new

    Output: one row per key whose state changed — op 'U' carrying the
    new payload for inserts and value-changes, op 'D' (NULL payload)
    for disappeared keys. Keys present in both snapshots with ALL
    payload columns null-safely equal produce NO row: the batch is net,
    minimal, and directly consumable by apply_changes / the streaming
    upsert sink.

    Both snapshots must share the schema; comparison is per-column
    eqNullSafe, so NULL -> value and value -> NULL transitions are
    detected as changes (a plain equality would silently drop them).
    Matched-ness comes from join-side MARKER columns, never from
    payload null-ness (the merge_upsert lesson: a legitimately-NULL
    payload must not masquerade as row-absence).

    SCALE: one full-outer sort-merge join on the uniform key — both
    snapshots shuffle once; output is bounded by the true change volume.
    At warehouse scale, snapshots bucketed on the key (as the streaming
    sink already writes them) diff with zero exchanges.

    `include_preimage=True` additionally emits `pre_present` (false
    exactly for inserts — an explicit marker, because a legitimately
    all-NULL old payload must not read as row-absence) and one
    `pre_<col>` per payload column: the Delta-CDF-style pre/post-image
    feed that downstream incremental aggregate maintenance needs. The
    apply_changes round-trip law is stated for the DEFAULT shape; drop
    the pre columns before feeding a preimage diff to apply_changes
    (its union is name-aligned with the base schema)."""
    cols = [c for c in old.columns if c != key]
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot_diff: schemas differ — old has {sorted(old.columns)}, "
            f"new has {sorted(new.columns)}"
        )
    # The output adds op_col (and, with preimages, pre_present/pre_<col>)
    # NEXT TO the payload columns — a payload column with one of those
    # names would silently duplicate in the output schema, and every
    # downstream F.col() reference (including apply_changes) would then
    # raise AMBIGUOUS_REFERENCE far from the cause. Fail loudly here.
    reserved = {op_col}
    if include_preimage:
        reserved.add("pre_present")
        reserved.update(f"pre_{c}" for c in cols)
    clashes = reserved & set(old.columns)
    if clashes:
        raise ValueError(
            f"snapshot_diff: column name collision {sorted(clashes)} — the "
            f"snapshot schema already uses names the diff output generates; "
            f"pass a different op_col or rename the payload columns"
        )
    # NULL-SAFE key join (same reasoning as apply_changes): a NULL-key
    # row must diff as ONE key like any other — a plain equi join would
    # split it into a spurious D + U pair, which apply_changes then
    # rejects as a duplicate-key batch, breaking the round-trip law.
    o = old.select(
        F.col(key).alias("_ok"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        F.col(key).alias("_nk"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, F.col("_ok").eqNullSafe(F.col("_nk")), "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    changed = j.where(
        F.col("_in_old").isNull() | F.col("_in_new").isNull() | ~same
    )
    pre = (
        [
            F.col("_in_old").isNotNull().alias("pre_present"),
            *[F.col(f"_o_{c}").alias(f"pre_{c}") for c in cols],
        ]
        if include_preimage
        else []
    )
    return changed.select(
        F.coalesce(F.col("_ok"), F.col("_nk")).alias(key),
        F.when(F.col("_in_new").isNull(), F.lit("D"))
        .otherwise(F.lit("U"))
        .alias(op_col),
        *[F.col(f"_n_{c}").alias(c) for c in cols],
        *pre,
    )


def incremental_group_stats(
    old: DataFrame,
    new: DataFrame,
    key: str,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Incremental view maintenance for a per-group (count, sum)
    aggregate: equals `new.groupBy(group_col).agg(count, sum)` but is
    computed WITHOUT aggregating `new` — the old aggregate is patched
    with ±contributions from snapshot_diff's pre/post-image feed.
    Post-images contribute +1/+value to their group, pre-images −1/−value
    to theirs (a row whose group changed moves through one −/+ pair);
    groups patched to zero rows drop out. Sums accumulate in
    DECIMAL(18,2) so incremental == direct to the bit for 2-decimal
    values regardless of partitioning.

    The group merge join is NULL-SAFE: groupBy treats NULL as a real
    group on both sides, so a name-list (EqualTo) join would split a
    NULL group's baseline and delta into two wrong rows — the same
    class of null-key hazard snapshot_diff guards on its row key.

    NULL values follow SQL sum semantics end-to-end: a NULL-valued row
    counts toward n_rows but not the sum, and a group whose remaining
    rows are ALL null-valued reports sum_value NULL (not 0.00) — a
    non-null-value count is maintained alongside n_rows to decide this,
    since the patched sum alone cannot distinguish "all NULL" from
    "sums to zero".

    Output: group_col, n_rows (bigint), sum_value (decimal) — only
    groups with n_rows > 0. SCALE: the whole point of change feeds —
    one narrow groupBy of change rows + a #groups-row null-safe outer
    merge; `new` is never scanned."""
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    old_agg = old.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n0"),
        F.sum(dec(value_col)).alias("_s0"),
        # non-null VALUE count: SQL sum() is NULL when every input is
        # NULL, so the merge must know whether any non-null contribution
        # survives — coalesce(_s0,0)+coalesce(_ds,0) alone turns an
        # all-NULL group's sum into 0.00 where the direct recompute says
        # NULL (round-7 advice item 1)
        F.count(dec(value_col)).alias("_v0"),
    )
    diff = snapshot_diff(old, new, key, include_preimage=True)
    post = diff.where(F.col("op") == "U").select(
        F.col(group_col).alias("_g"),
        dec(value_col).alias("_p"),
        F.lit(1).alias("_sign"),
    )
    pre = diff.where(F.col("pre_present")).select(
        F.col(f"pre_{group_col}").alias("_g"),
        dec(f"pre_{value_col}").alias("_p"),
        F.lit(-1).alias("_sign"),
    )
    delta = (
        post.unionByName(pre)
        .groupBy("_g")
        .agg(
            F.sum("_sign").alias("_dn"),
            F.sum(F.col("_sign") * F.col("_p")).alias("_ds"),
            # signed non-null-value count (sum skips NULL _p rows, so a
            # NULL-valued insert/delete moves _dn but not _dv)
            F.sum(
                F.col("_sign") * F.col("_p").isNotNull().cast("int")
            ).alias("_dv"),
        )
    )
    n_nonnull = F.coalesce(F.col("_v0"), F.lit(0)) + F.coalesce(
        F.col("_dv"), F.lit(0)
    )
    merged = old_agg.join(
        delta, F.col(group_col).eqNullSafe(F.col("_g")), "full_outer"
    ).select(
        F.coalesce(F.col(group_col), F.col("_g")).alias(group_col),
        (
            F.coalesce(F.col("_n0"), F.lit(0))
            + F.coalesce(F.col("_dn"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_rows"),
        # NULL when no non-null value remains in the group — matching
        # new.groupBy().agg(sum) exactly, where sum over all-NULL is NULL
        F.when(
            n_nonnull > 0,
            F.coalesce(F.col("_s0"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("_ds"), F.lit(0).cast("decimal(18,2)")),
        ).alias("sum_value"),
    )
    return merged.where(F.col("n_rows") > 0)


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


def _fsync_replace(tmp: str, dst: str) -> None:
    """rename + DURABILITY: fsync the temp file before the rename and the
    parent directory after, so a power loss cannot revert or tear a
    commit the streaming checkpoint already considers done (rename alone
    is atomic against crashes of the process, not of the page cache).
    The source fsync happens HERE, not in the caller — a commit primitive
    whose durability depends on every caller remembering a step is not a
    primitive (callers that also fsync their open handle pay a no-op)."""
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, dst)
    dfd = os.open(os.path.dirname(dst) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _commit_pointer(state_root: str, rel: str) -> None:
    """Atomic pointer swap (write-tmp + fsync + rename + dir fsync) — the
    commit primitive a real deployment replaces with a catalog/metastore
    transaction."""
    tmp = _pointer_path(state_root) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(rel)
        fh.flush()
        os.fsync(fh.fileno())
    _fsync_replace(tmp, _pointer_path(state_root))


def _manifest_path(version_dir: str) -> str:
    return os.path.join(version_dir, "_MANIFEST.json")


def _load_manifest(version_dir: str) -> dict | None:
    """The version's bucket manifest, or None for a legacy monolithic
    snapshot directory (plain parquet files, pre-bucketing layout)."""
    try:
        with open(_manifest_path(version_dir)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _write_manifest(version_dir: str, manifest: dict) -> None:
    # tmp+fsync+rename like the pointer: a torn manifest must never be
    # readable through a committed pointer, even across power loss.
    tmp = _manifest_path(version_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    _fsync_replace(tmp, _manifest_path(version_dir))


def _bucket_data_path(state_root: str, owner_rel: str, bucket: int) -> str:
    return os.path.join(state_root, owner_rel, "data", f"_bucket={bucket}")


def _read_version_dir(spark, state_root: str, version_dir: str) -> DataFrame:
    """Materialize one committed version as a DataFrame — resolving the
    bucket manifest (each bucket read from the version that last wrote
    it) or falling back to a plain read for legacy monolithic dirs."""
    manifest = _load_manifest(version_dir)
    if manifest is None:
        return spark.read.parquet(version_dir)
    if manifest.get("vacuumed"):
        # The dir may still exist because newer versions reference some
        # of its buckets, but ITS OWN view of the table was expired — a
        # plain read here would assemble a wrong/partial snapshot.
        raise FileNotFoundError(
            f"snapshot {os.path.basename(version_dir)} was vacuumed "
            f"(expired by vacuum_snapshots) under {state_root}"
        )
    paths = [
        _bucket_data_path(state_root, owner, int(b))
        for b, owner in manifest["buckets"].items()
    ]
    # The writer never commits a manifest entry pointing at a missing dir
    # (empty changed buckets are popped before the manifest write), and
    # vacuum tombstones a version BEFORE touching its buckets — so a
    # missing referenced dir here is corruption (manual deletion, torn
    # filesystem). Fail loudly rather than assemble a partial table.
    missing = [p for p in paths if not os.path.isdir(p)]
    if missing:
        raise FileNotFoundError(
            f"snapshot {os.path.basename(version_dir)} references missing "
            f"bucket data {missing[:3]} under {state_root} — refusing to "
            "return a partial snapshot"
        )
    if not paths:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(json.loads(manifest["schema"])))
    return spark.read.parquet(*paths)


def read_snapshot(spark, state_root: str, version: int | None = None) -> DataFrame:
    """Time travel over the snapshot chain: read the current state
    (version=None, via the pointer) or any retained historical version by
    its batch id — the AS OF read every table format offers. A version is
    a bucket MANIFEST (bucket -> version that last rewrote it), so a read
    assembles the table from immutable per-bucket parquet dirs across
    versions; legacy monolithic version dirs read as plain parquet.

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
        return _read_version_dir(spark, state_root, cur)
    committed = int(os.path.basename(cur)[1:])
    if version > committed:
        raise FileNotFoundError(
            f"snapshot v{version} is not committed (newest committed "
            f"version under {state_root} is v{committed})"
        )
    path = os.path.join(state_root, f"v{version}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"snapshot v{version} not found under {state_root}")
    return _read_version_dir(spark, state_root, path)


def vacuum_snapshots(state_root: str, keep_last: int = 2) -> dict:
    """Expire old snapshot versions — the retention half every
    copy-on-write layout needs: without it the version chain grows
    O(#batches) forever. Keeps the newest `keep_last` committed versions
    time-travelable; older versions are expired with per-bucket
    liveness: a bucket data dir inside an expired version survives as
    long as ANY retained manifest still references it (that is what
    "rewrite only changed buckets" means — old versions keep owning the
    buckets nobody rewrote), and an expired version's directory is
    deleted outright only once nothing references it. Expired versions
    that still own live buckets get a tombstone manifest so a time-travel
    read fails loudly instead of assembling a wrong snapshot.

    Safety properties:
    * the CURRENT snapshot (and every retained version) reads back
      byte-identically — vacuum never touches a referenced bucket;
    * versions ABOVE the committed pointer are never touched (that's the
      in-flight write window of a live stream);
    * idempotent and crash-safe: a version's TOMBSTONE manifest is
      swapped in (tmp+rename) BEFORE any of its paths are deleted, so a
      crash mid-vacuum can never leave an expired version readable with
      buckets silently missing — reads fail loudly on the tombstone, and
      a re-run just finishes the pruning;
    * `keep_last` counts READABLE versions only — already-tombstoned
      dirs (kept alive because newer manifests reference their buckets)
      are neither retained nor reported as such.

    Driver-side metadata walk only — O(#versions + #buckets) small file
    ops, no table data read — exactly the shape of a table format's
    expire-snapshots action, which this becomes at 100 TB.

    Returns {"retained": [...], "removed_versions": [...],
    "pruned_buckets": N}."""
    import re
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the current version)")
    cur = current_snapshot_path(state_root)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot under {state_root}")
    committed = int(os.path.basename(cur)[1:])
    versions = sorted(
        int(d[1:])
        for d in os.listdir(state_root)
        if re.fullmatch(r"v\d+", d)
        and os.path.isdir(os.path.join(state_root, d))
        and int(d[1:]) <= committed
    )
    manifests = {v: _load_manifest(os.path.join(state_root, f"v{v}")) for v in versions}
    # keep_last is a promise about TIME-TRAVELABLE versions; tombstoned
    # dirs (alive only because newer manifests reference their buckets)
    # raise on read, so counting them would silently shrink the window.
    readable = [v for v in versions if not (manifests[v] or {}).get("vacuumed")]
    retained = readable[-keep_last:]
    # Expire the older readable versions, and re-walk already-tombstoned
    # dirs: buckets they own may have dropped out of every retained
    # manifest since the vacuum that tombstoned them.
    expired = sorted(set(readable[:-keep_last]) | (set(versions) - set(readable)))

    referenced: set[tuple[str, str]] = set()  # (owner_rel, bucket)
    for v in retained:
        manifest = manifests[v]
        if manifest is None:
            continue  # legacy monolithic — self-contained dir
        for b, owner in manifest["buckets"].items():
            referenced.add((owner, b))

    removed_versions: list[str] = []
    pruned_buckets = 0
    for v in expired:
        rel = f"v{v}"
        vdir = os.path.join(state_root, rel)
        live = {b for owner, b in referenced if owner == rel}
        # Tombstone FIRST (atomic swap), delete after: if we crash
        # mid-prune, the version is already loudly unreadable instead of
        # readable-but-partial through its original manifest.
        manifest = manifests[v] or {}
        if not manifest.get("vacuumed"):
            _write_manifest(
                vdir,
                {
                    "vacuumed": True,
                    "num_buckets": manifest.get("num_buckets"),
                    "buckets": {},
                },
            )
        if not live:
            # Remove data/ BEFORE the rest of the dir: rmtree's scandir
            # order is arbitrary, so a crash after it removed the
            # tombstone manifest but before the data files would leave a
            # manifest-less dir that _read_version_dir's legacy fallback
            # would plain-read as a partial snapshot. Data-first keeps the
            # tombstone-or-gone invariant at every intermediate state.
            data_dir = os.path.join(vdir, "data")
            if os.path.isdir(data_dir):
                shutil.rmtree(data_dir)
            shutil.rmtree(vdir)
            removed_versions.append(rel)
            continue
        data_dir = os.path.join(vdir, "data")
        if os.path.isdir(data_dir):
            for d in os.listdir(data_dir):
                if d.startswith("_bucket=") and d.split("=")[1] not in live:
                    shutil.rmtree(os.path.join(data_dir, d))
                    pruned_buckets += 1
    return {
        "retained": [f"v{v}" for v in retained],
        "removed_versions": removed_versions,
        "pruned_buckets": pruned_buckets,
    }


def _bucket_expr(key: str, num_buckets: int):
    """Deterministic key -> bucket assignment. xxhash64 is seed-stable
    across sessions and executors, so a key lands in the same bucket for
    the life of the table — the invariant the whole layout rests on."""
    return F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")


def stream_upsert_sink(
    changes_sdf: DataFrame,
    key: str,
    state_root: str,
    checkpoint_dir: str,
    seq_col: str | None = None,
    num_buckets: int = 16,
    seq_in_table: bool = False,
):
    """foreachBatch upsert sink: each micro-batch of change rows merges
    into the current snapshot and commits a new immutable version.
    Returns the started StreamingQuery (AvailableNow trigger).

    SCALE: the snapshot is hash-bucketed by key, and a batch rewrites
    ONLY the buckets containing changed keys — per-batch I/O is bounded
    by change volume x (table_size / num_buckets), not table size. A
    version is a manifest mapping each bucket to the version that last
    rewrote it; untouched buckets' files are shared byte-identical across
    versions (tests/test_cdc.py pins this). This is exactly the
    copy-on-write table-format layout (Delta/Iceberg partition rewrite
    with an atomic metadata commit); at 100 TB you'd raise num_buckets so
    a bucket is a few GB — the default 16 is sized for the test rig.
    num_buckets is fixed at table creation; later calls adopt the stored
    value (a re-bucket is a full rewrite, deliberately not implicit).

    CONTRACT (inherited from apply_changes): each micro-batch must be a
    net change set — one row per key — unless `seq_col` names the
    source's sequence column, in which case the batch is compacted to
    the latest row per key before applying. A real CDC feed routinely
    delivers a key's full history inside one micro-batch, so production
    callers should pass seq_col; without it a duplicate key fails the
    batch loudly instead of silently writing duplicate keyed rows.

    By default seq_col is TRANSPORT metadata (a commit LSN / source
    offset) and is dropped from the stored table. Pass seq_in_table=True
    when it is real table data (an updated_at-style column): the
    snapshot then stores each key's latest sequence value alongside its
    row — without the flag the column would be silently absent from
    every snapshot the sink ever writes."""

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
        # A batch id BELOW the committed pointer means the stream restarted
        # against a fresh/lost checkpoint (batch ids restart at 0): writing
        # would overwrite committed version dirs that newer manifests still
        # reference — irreversible snapshot corruption. Refuse loudly; the
        # operator must either restore the checkpoint or start a new
        # state_root.
        if cur is not None and batch_id < int(os.path.basename(cur)[1:]):
            raise RuntimeError(
                f"stream_upsert_sink: batch {batch_id} is below the committed "
                f"snapshot {os.path.basename(cur)} under {state_root} — the "
                "streaming checkpoint was reset or replaced; refusing to "
                "overwrite committed versions (restore the checkpoint or use "
                "a fresh state_root)"
            )
        drop_cols = ["op"] + ([seq_col] if seq_col and not seq_in_table else [])
        prior = _load_manifest(cur) if cur is not None else None
        nb = int(prior["num_buckets"]) if prior else num_buckets

        # Every probe below (changed-bucket scan, apply_changes' op/dup
        # probes) and the final write launches its own Spark job over the
        # batch source — persist once so the change data is scanned once,
        # not 3-4x per micro-batch.
        bdf = bdf.persist()
        try:
            # Changed buckets: one bounded probe (<= nb distinct values,
            # now mechanically capped rather than reviewed).
            from mapreduce__spark.operators.staging import bounded_collect

            changed = sorted(
                r.b
                for r in bounded_collect(
                    bdf.select(_bucket_expr(key, nb).alias("b")).distinct(),
                    nb,
                    "cdc changed buckets",
                )
            )

            if prior is not None:
                # Base = ONLY the changed buckets' current data. Rows in
                # untouched buckets are never read, never rewritten. A
                # committed manifest entry always points at an existing
                # dir, so a missing one is corruption — fail loudly, same
                # contract as _read_version_dir.
                base_paths = [
                    _bucket_data_path(state_root, prior["buckets"][str(b)], b)
                    for b in changed
                    if str(b) in prior["buckets"]
                ]
                missing = [p for p in base_paths if not os.path.isdir(p)]
                if missing:
                    raise FileNotFoundError(
                        f"current snapshot references missing bucket data "
                        f"{missing[:3]} under {state_root}"
                    )
                if base_paths:
                    base = spark.read.parquet(*base_paths)
                else:
                    base = spark.createDataFrame([], bdf.drop(*drop_cols).schema)
            elif cur is not None:
                # Legacy monolithic snapshot below us: migrate by rewriting
                # the whole table into the bucketed layout once.
                base = spark.read.parquet(cur)
                changed = list(range(nb))
            else:
                base = spark.createDataFrame([], bdf.drop(*drop_cols).schema)

            merged = apply_changes(base, bdf, key, seq_col=seq_col)
            # merged holds exactly the changed buckets' new content (every
            # batch key hashes into `changed`; base was restricted to it).
            out = os.path.join(state_root, rel, "data")
            merged.withColumn("_bucket", _bucket_expr(key, nb)).write.mode(
                "overwrite"
            ).partitionBy("_bucket").parquet(out)
        finally:
            bdf.unpersist()

        buckets = dict(prior["buckets"]) if prior else {}
        for b in changed:
            # partitionBy writes no dir for an empty bucket — a changed
            # bucket with no dir became empty; drop its manifest entry.
            if os.path.isdir(_bucket_data_path(state_root, rel, b)):
                buckets[str(b)] = rel
            else:
                buckets.pop(str(b), None)
        _write_manifest(
            os.path.join(state_root, rel),
            {
                "num_buckets": nb,
                "buckets": buckets,
                "schema": merged.schema.json(),
            },
        )
        _commit_pointer(state_root, rel)

    return (
        changes_sdf.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
