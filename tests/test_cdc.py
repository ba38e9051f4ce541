"""CDC apply properties (operators/cdc.py): the algebra MERGE INTO relies
on — idempotence, last-writer-wins composition, delete-then-reinsert —
checked with hypothesis over arbitrary small change logs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce__spark.operators.cdc import apply_changes


def reference_apply(state: dict, batch) -> dict:
    """Single-threaded model: upserts replace by key, deletes remove."""
    out = dict(state)
    for key, val, op in batch:
        if op == "D":
            out.pop(key, None)
        else:
            out[key] = val
    return out


# batches are keyed dicts so a key appears at most once per batch —
# apply_changes' contract (a change batch is the NET change per key,
# the shape CDC compaction produces).
change_batch = st.dictionaries(
    st.integers(min_value=0, max_value=20),
    st.tuples(st.integers(min_value=-1000, max_value=1000), st.sampled_from(["U", "D"])),
    max_size=12,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=st.lists(change_batch, min_size=1, max_size=4))
def test_apply_changes_matches_reference_fold(spark, batches):
    state: dict = {}
    df = spark.createDataFrame([], "k bigint, v bigint")
    for batch in batches:
        rows = [(k, v, op) for k, (v, op) in batch.items()]
        state = reference_apply(state, rows)
        if rows:
            bdf = spark.createDataFrame(rows, "k bigint, v bigint, op string")
            df = apply_changes(df, bdf, "k")
    got = {(r.k, r.v) for r in df.collect()}
    assert got == set(state.items())


def test_apply_changes_upsert_idempotent(spark, sf_small):
    """Re-applying the same net change batch is a no-op — the property
    foreachBatch re-delivery after recovery leans on."""
    from mapreduce__spark.sources import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    batch = o.where(F.col("o_orderkey") % 4 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 5.0).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 8 == 0, "D").otherwise("U").alias("op"),
    )
    once = apply_changes(o, batch, "o_orderkey")
    twice = apply_changes(once, batch, "o_orderkey")
    a = {(r.o_orderkey, round(r.o_totalprice, 2)) for r in once.collect()}
    b = {(r.o_orderkey, round(r.o_totalprice, 2)) for r in twice.collect()}
    assert a == b and a


def test_apply_changes_rejects_duplicate_keys_without_seq(spark):
    """Without seq_col, two change rows for one key are an invariant
    violation (which one wins is undefined) — must fail loudly, not
    write duplicate keyed rows."""
    import pytest

    base = spark.createDataFrame([(1, 10)], "k bigint, v bigint")
    batch = spark.createDataFrame(
        [(1, 11, "U"), (1, 12, "U")], "k bigint, v bigint, op string"
    )
    with pytest.raises(ValueError, match="multiple change rows"):
        apply_changes(base, batch, "k")


def test_apply_changes_seq_compacts_to_latest_per_key(spark):
    """With seq_col a batch may carry a key's full history: compaction
    keeps the max-seq row per key (so D+U order is decided by the data,
    not luck), and an equal-seq D/U pair resolves deterministically to
    'U'. The transport-only seq column is dropped from the output."""
    base = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k bigint, v bigint")
    batch = spark.createDataFrame(
        [
            # key 1: U then D (seq order) -> net delete
            (1, 11, "U", 100),
            (1, 0, "D", 101),
            # key 2: D then U -> net upsert 22
            (2, 0, "D", 200),
            (2, 22, "U", 201),
            # key 4: insert history, latest wins
            (4, 40, "U", 300),
            (4, 44, "U", 301),
            # key 5: equal-seq D/U pair -> 'U' wins deterministically
            (5, 55, "U", 400),
            (5, 0, "D", 400),
        ],
        "k bigint, v bigint, op string, seq bigint",
    )
    got = {(r.k, r.v) for r in apply_changes(base, batch, "k", seq_col="seq").collect()}
    assert got == {(2, 22), (3, 30), (4, 44), (5, 55)}


def test_apply_changes_seq_tolerates_unorderable_columns(spark):
    """A change batch carrying a map<...> column must still compact: the
    tie-break comparator extends only over ORDERABLE columns, so the map
    column rides along in the payload without making the struct
    comparator unorderable (previously an AnalysisException). Distinct
    seq values keep the winner fully data-determined."""
    base = spark.createDataFrame(
        [(1, {"a": 1})], "k bigint, props map<string,bigint>"
    )
    batch = spark.createDataFrame(
        [
            (1, {"b": 2}, "U", 100),
            (1, {"c": 3}, "U", 101),
            (2, {"d": 4}, "U", 200),
        ],
        "k bigint, props map<string,bigint>, op string, seq bigint",
    )
    got = {
        (r.k, tuple(sorted(r.props.items())))
        for r in apply_changes(base, batch, "k", seq_col="seq").collect()
    }
    assert got == {(1, (("c", 3),)), (2, (("d", 4),))}


def _dir_file_hashes(root):
    """{relative parquet path: sha256} for every data file under root."""
    import hashlib
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.sha256(fh.read()).hexdigest()
    return out


def test_bucketed_sink_rewrites_only_changed_buckets(spark, tmp_path):
    """The scale contract of the streaming upsert sink: a micro-batch's
    I/O is bounded by CHANGE volume, not table size. Batch 1 touches a
    handful of keys; afterwards (a) v1 holds data dirs only for the
    buckets those keys hash into, (b) every untouched bucket's manifest
    entry still points at v0 and its files are byte-identical, and
    (c) the assembled snapshot equals the sequential batch merge."""
    import os as _os

    from pyspark.sql import functions as F

    from mapreduce__spark.operators.cdc import (
        _bucket_data_path,
        _load_manifest,
        current_snapshot_path,
        read_snapshot,
        stream_upsert_sink,
    )

    nb = 8
    # batch 0: seed 2000 keys; batch 1: change 3 keys (2 upserts + 1 del)
    b0 = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"), F.lit("U").alias("op")
    )
    b1 = spark.createDataFrame(
        [(7, 777, "U"), (1900, 19999, "U"), (42, 0, "D")],
        "k bigint, v bigint, op string",
    )
    src = tmp_path / "changes"
    src.mkdir()
    b0.coalesce(1).write.parquet(str(src / "batch0"))
    b1.coalesce(1).write.parquet(str(src / "batch1"))
    t0 = 1_700_000_000
    for i, d in enumerate(("batch0", "batch1")):
        for f in _os.listdir(src / d):
            _os.utime(src / d / f, (t0 + i, t0 + i))

    state_root = str(tmp_path / "state")
    sdf = (
        spark.readStream.schema("k bigint, v bigint, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = stream_upsert_sink(
        sdf, "k", state_root, str(tmp_path / "ckpt"), num_buckets=nb
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    assert _os.path.basename(current_snapshot_path(state_root)) == "v1"
    v0_hashes_after = _dir_file_hashes(_os.path.join(state_root, "v0", "data"))
    man0 = _load_manifest(_os.path.join(state_root, "v0"))
    man1 = _load_manifest(_os.path.join(state_root, "v1"))
    assert man0["num_buckets"] == man1["num_buckets"] == nb

    # buckets of the changed keys, computed the same way the sink does
    changed = {
        r.b
        for r in b1.select(
            F.pmod(F.xxhash64("k"), F.lit(nb)).cast("int").alias("b")
        ).collect()
    }
    assert changed and len(changed) < nb  # the test needs untouched buckets

    # (a) v1 wrote exactly the changed buckets
    v1_buckets = {
        int(d.split("=")[1])
        for d in _os.listdir(_os.path.join(state_root, "v1", "data"))
        if d.startswith("_bucket=")
    }
    assert v1_buckets == changed
    # (b) untouched buckets: manifest points at v0, files byte-identical
    for b in range(nb):
        if b in changed:
            assert man1["buckets"][str(b)] == "v1"
        else:
            assert man1["buckets"][str(b)] == "v0"
            assert _os.path.isdir(_bucket_data_path(state_root, "v0", b))
    assert _dir_file_hashes(_os.path.join(state_root, "v0", "data")) == v0_hashes_after

    # (c) assembled reads are correct, both current and time-travel
    want = {(k, k * 10) for k in range(2000)} - {(7, 70), (1900, 19000), (42, 420)}
    want |= {(7, 777), (1900, 19999)}
    got = {(r.k, r.v) for r in read_snapshot(spark, state_root).collect()}
    assert got == want
    v0_read = {(r.k, r.v) for r in read_snapshot(spark, state_root, version=0).collect()}
    assert v0_read == {(k, k * 10) for k in range(2000)}


def test_read_snapshot_refuses_uncommitted_version(spark, tmp_path):
    """A v{N} directory without a pointer commit (the write/commit crash
    window) must not be readable as a version — only committed snapshots
    exist."""
    import os

    import pytest

    from mapreduce__spark.operators.cdc import _commit_pointer, read_snapshot

    root = str(tmp_path / "state")
    os.makedirs(root)
    df = spark.createDataFrame([(1, 10.0)], "k bigint, v double")
    df.write.parquet(f"{root}/v0")
    with pytest.raises(FileNotFoundError, match="no committed snapshot"):
        read_snapshot(spark, root)
    _commit_pointer(root, "v0")
    # v1 written but never committed — the crash window
    df.write.parquet(f"{root}/v1")
    assert read_snapshot(spark, root).count() == 1
    assert read_snapshot(spark, root, version=0).count() == 1
    with pytest.raises(FileNotFoundError, match="not committed"):
        read_snapshot(spark, root, version=1)


def test_vacuum_expires_versions_but_never_live_buckets(spark, tmp_path):
    """Retention for the snapshot chain: vacuum deletes exactly the
    version data nothing retained references — expired versions' own
    views become unreadable (tombstone or gone), buckets still owned by
    retained manifests survive byte-identically, and the current read is
    unchanged. Idempotent on re-run."""
    import os as _os

    import pytest
    from pyspark.sql import functions as F

    from mapreduce__spark.operators.cdc import (
        _bucket_data_path,
        current_snapshot_path,
        read_snapshot,
        stream_upsert_sink,
        vacuum_snapshots,
    )

    nb = 8
    b0 = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"), F.lit("U").alias("op")
    )
    b1 = spark.createDataFrame(
        [(7, 777, "U"), (1900, 19999, "U"), (42, 0, "D")],
        "k bigint, v bigint, op string",
    )
    b2 = spark.createDataFrame(
        [(7, 7777, "U"), (100, 1001, "U")], "k bigint, v bigint, op string"
    )
    src = tmp_path / "changes"
    src.mkdir()
    t0 = 1_700_000_000
    for i, b in enumerate((b0, b1, b2)):
        d = src / f"batch{i}"
        b.coalesce(1).write.parquet(str(d))
        for f in _os.listdir(d):
            _os.utime(d / f, (t0 + i, t0 + i))

    state_root = str(tmp_path / "state")
    sdf = (
        spark.readStream.schema("k bigint, v bigint, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = stream_upsert_sink(sdf, "k", state_root, str(tmp_path / "ckpt"), num_buckets=nb)
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    assert _os.path.basename(current_snapshot_path(state_root)) == "v2"

    def bucket_of(keys):
        return {
            r.b
            for r in spark.createDataFrame([(k,) for k in keys], "k bigint")
            .select(F.pmod(F.xxhash64("k"), F.lit(nb)).cast("int").alias("b"))
            .collect()
        }

    # v0 buckets stay live while ANY retained manifest references them:
    # retained v1 references v0 for every bucket b1 didn't touch (incl.
    # the bucket only b2 touched), so only buckets(b1) are prunable.
    prunable = bucket_of([7, 1900, 42])
    assert len(prunable) < nb  # some v0 buckets must stay live
    want_cur = {(r.k, r.v) for r in read_snapshot(spark, state_root).collect()}
    v0_live_hashes = {
        b: _dir_file_hashes(_bucket_data_path(state_root, "v0", b))
        for b in range(nb)
        if b not in prunable
    }

    stats = vacuum_snapshots(state_root, keep_last=2)
    assert stats["retained"] == ["v1", "v2"]
    # v0 still owns the never-rewritten buckets -> tombstoned, not removed
    assert stats["removed_versions"] == []
    assert stats["pruned_buckets"] == len(prunable)
    for b in prunable:
        assert not _os.path.isdir(_bucket_data_path(state_root, "v0", b))
    for b, hashes in v0_live_hashes.items():
        assert _dir_file_hashes(_bucket_data_path(state_root, "v0", b)) == hashes

    # current and retained-version reads unchanged; expired read fails loudly
    assert {(r.k, r.v) for r in read_snapshot(spark, state_root).collect()} == want_cur
    assert read_snapshot(spark, state_root, version=1).count() == 1999  # 2000 - del(42)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        read_snapshot(spark, state_root, version=0)

    # idempotent: a second run finds nothing more to do
    again = vacuum_snapshots(state_root, keep_last=2)
    assert again["removed_versions"] == [] and again["pruned_buckets"] == 0

    # tighter retention: v1's own view expires too (its bucket for key 7
    # was rewritten by v2, but keys 42/1900 keep v1 buckets live)
    stats1 = vacuum_snapshots(state_root, keep_last=1)
    assert stats1["retained"] == ["v2"]
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        read_snapshot(spark, state_root, version=1)
    assert {(r.k, r.v) for r in read_snapshot(spark, state_root).collect()} == want_cur


def _run_sink(spark, tmp_path, batch_dfs, schema, tag, **sink_kwargs):
    """Drive stream_upsert_sink over a file stream delivering one batch
    per trigger (mtime-ordered), returning the state root."""
    import os as _os

    from mapreduce__spark.operators.cdc import stream_upsert_sink

    src = tmp_path / f"changes_{tag}"
    src.mkdir()
    t0 = 1_700_000_000
    for i, b in enumerate(batch_dfs):
        d = src / f"batch{i}"
        b.coalesce(1).write.parquet(str(d))
        for f in _os.listdir(d):
            _os.utime(d / f, (t0 + i, t0 + i))
    state_root = str(tmp_path / f"state_{tag}")
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = stream_upsert_sink(
        sdf, "k", state_root, str(tmp_path / f"ckpt_{tag}"), **sink_kwargs
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    return state_root


def _three_version_chain(spark, tmp_path, nb=8):
    """Seed + two small change batches -> a v0/v1/v2 snapshot chain."""
    from pyspark.sql import functions as F

    b0 = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"), F.lit("U").alias("op")
    )
    b1 = spark.createDataFrame(
        [(7, 777, "U"), (400, 4444, "U"), (42, 0, "D")],
        "k bigint, v bigint, op string",
    )
    b2 = spark.createDataFrame(
        [(7, 7777, "U"), (100, 1001, "U")], "k bigint, v bigint, op string"
    )
    return _run_sink(
        spark, tmp_path, [b0, b1, b2], "k bigint, v bigint, op string",
        "chain", num_buckets=nb,
    )


def test_vacuum_tombstones_before_pruning(spark, tmp_path, monkeypatch):
    """Crash-safety ordering: a version must become loudly unreadable
    (tombstone committed) BEFORE any of its paths are deleted. Simulated
    by making the first delete crash mid-vacuum: the half-vacuumed
    version's read must raise, never assemble a partial snapshot, and a
    re-run must finish the job."""
    import shutil

    import pytest

    from mapreduce__spark.operators.cdc import read_snapshot, vacuum_snapshots

    state_root = _three_version_chain(spark, tmp_path)
    want_cur = {(r.k, r.v) for r in read_snapshot(spark, state_root).collect()}

    real_rmtree = shutil.rmtree
    calls = {"n": 0}

    def crashing_rmtree(path, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("simulated crash mid-vacuum")
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(shutil, "rmtree", crashing_rmtree)
    with pytest.raises(OSError, match="simulated crash"):
        vacuum_snapshots(state_root, keep_last=2)
    assert calls["n"] == 1  # it really was mid-prune

    # The victim version is already tombstoned -> loud failure, and the
    # retained chain is untouched.
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        read_snapshot(spark, state_root, version=0)
    assert {(r.k, r.v) for r in read_snapshot(spark, state_root).collect()} == want_cur

    monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    vacuum_snapshots(state_root, keep_last=2)  # re-run finishes the prune
    assert {(r.k, r.v) for r in read_snapshot(spark, state_root).collect()} == want_cur


def test_vacuum_retained_counts_readable_versions_only(spark, tmp_path):
    """keep_last promises time-travelable versions: a tombstoned dir that
    survives only because newer manifests reference its buckets must not
    occupy a retention slot nor be reported as retained."""
    import os as _os

    import pytest

    from mapreduce__spark.operators.cdc import read_snapshot, vacuum_snapshots

    state_root = _three_version_chain(spark, tmp_path)
    vacuum_snapshots(state_root, keep_last=1)
    # v0/v1 own live buckets (most keys were never rewritten), so their
    # tombstoned dirs survive — the trap a dir-count retention would hit.
    assert _os.path.isdir(_os.path.join(state_root, "v0"))
    stats = vacuum_snapshots(state_root, keep_last=3)
    assert stats["retained"] == ["v2"]  # dead versions take no slots
    for v in (0, 1):
        with pytest.raises(FileNotFoundError, match="vacuumed"):
            read_snapshot(spark, state_root, version=v)


def test_read_snapshot_fails_loudly_on_missing_bucket_data(spark, tmp_path):
    """A committed manifest entry always points at an existing dir (empty
    buckets are popped before the manifest write; vacuum tombstones
    first) — so a missing referenced dir is corruption and the read must
    raise, not return a silently partial table."""
    import os as _os
    import shutil

    import pytest

    from mapreduce__spark.operators.cdc import (
        _load_manifest,
        current_snapshot_path,
        read_snapshot,
    )

    state_root = _three_version_chain(spark, tmp_path)
    cur = current_snapshot_path(state_root)
    man = _load_manifest(cur)
    b, owner = sorted(man["buckets"].items())[0]
    victim = _os.path.join(state_root, owner, "data", f"_bucket={b}")
    shutil.rmtree(victim)
    with pytest.raises(FileNotFoundError, match="missing bucket data"):
        read_snapshot(spark, state_root).count()


def test_sink_seq_in_table_stores_sequence_column(spark, tmp_path):
    """seq_col is transport metadata by default (dropped from the stored
    table); seq_in_table=True declares it real table data — the snapshot
    then carries each key's latest sequence value."""
    from mapreduce__spark.operators.cdc import read_snapshot

    schema = "k bigint, v bigint, op string, updated_at bigint"
    b0 = spark.createDataFrame(
        [(1, 10, "U", 100), (2, 20, "U", 100), (3, 30, "U", 100)], schema
    )
    # key 1's full history in one batch: compaction keeps the max-seq row
    b1 = spark.createDataFrame(
        [(1, 11, "U", 101), (1, 12, "U", 103), (1, 99, "D", 102), (3, 0, "D", 101)],
        schema,
    )

    root = _run_sink(
        spark, tmp_path, [b0, b1], schema, "seqtab",
        seq_col="updated_at", num_buckets=4, seq_in_table=True,
    )
    snap = read_snapshot(spark, root)
    assert "updated_at" in snap.columns
    got = {(r.k, r.v, r.updated_at) for r in snap.collect()}
    assert got == {(1, 12, 103), (2, 20, 100)}

    root2 = _run_sink(
        spark, tmp_path, [b0, b1], schema, "seqdrop",
        seq_col="updated_at", num_buckets=4,
    )
    snap2 = read_snapshot(spark, root2)
    assert "updated_at" not in snap2.columns
    assert {(r.k, r.v) for r in snap2.collect()} == {(1, 12), (2, 20)}


def test_sink_refuses_checkpoint_reset(spark, tmp_path):
    """A restart against a fresh/lost checkpoint restarts batch ids at 0;
    writing would overwrite committed version dirs that newer manifests
    still reference. The sink must refuse loudly, and the committed
    snapshot must remain fully readable afterwards."""
    import pytest

    from mapreduce__spark.operators.cdc import read_snapshot

    state_root = _three_version_chain(spark, tmp_path)
    want = {(r.k, r.v) for r in read_snapshot(spark, state_root).collect()}

    b = spark.createDataFrame([(7, 1, "U")], "k bigint, v bigint, op string")
    from pyspark.sql import functions as F  # noqa: F401
    import os as _os

    src2 = tmp_path / "changes_reset"
    src2.mkdir()
    b.coalesce(1).write.parquet(str(src2 / "batch0"))
    sdf = (
        spark.readStream.schema("k bigint, v bigint, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src2}/*")
    )
    from mapreduce__spark.operators.cdc import stream_upsert_sink

    # FRESH checkpoint dir against the existing state_root -> batch 0
    q = stream_upsert_sink(sdf, "k", state_root, str(tmp_path / "ckpt_reset"))
    with pytest.raises(Exception, match="checkpoint was reset|below the committed"):
        q.awaitTermination(120)
        q.processAllAvailable()
    if q.isActive:
        q.stop()
    # nothing was overwritten
    assert {(r.k, r.v) for r in read_snapshot(spark, state_root).collect()} == want


def test_apply_changes_null_key_replaces_not_duplicates(spark):
    """NULL keys must upsert/delete like any other key (null-safe match):
    a plain equi anti-join would keep the old NULL row AND append the new
    one — a keyed-table invariant violation."""
    from mapreduce__spark.operators.cdc import apply_changes

    base = spark.createDataFrame([(None, 1), (5, 50)], "k bigint, v bigint")
    batch = spark.createDataFrame([(None, 2, "U")], "k bigint, v bigint, op string")
    got = {(r.k, r.v) for r in apply_changes(base, batch, "k").collect()}
    assert got == {(None, 2), (5, 50)}

    batch_d = spark.createDataFrame([(None, 0, "D")], "k bigint, v bigint, op string")
    got_d = {(r.k, r.v) for r in apply_changes(base, batch_d, "k").collect()}
    assert got_d == {(5, 50)}


# one nullable-int payload per key; None key included — the null-safe
# join path snapshot_diff must treat as ONE key, not a spurious D+U pair
_snapshot = st.dictionaries(
    st.one_of(st.none(), st.integers(min_value=0, max_value=12)),
    st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    max_size=10,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=_snapshot, new=_snapshot)
def test_snapshot_diff_roundtrip_and_minimality(spark, old, new):
    """The operator's law: apply_changes(old, snapshot_diff(old, new)) ==
    new, for arbitrary snapshots including NULL keys and NULL payloads.
    Minimality: keys whose payload is null-safely unchanged emit no row."""
    from mapreduce__spark.operators.cdc import snapshot_diff

    old_df = spark.createDataFrame(list(old.items()) or [], "k bigint, v bigint")
    new_df = spark.createDataFrame(list(new.items()) or [], "k bigint, v bigint")
    diff = snapshot_diff(old_df, new_df, "k")
    rows = diff.collect()

    unchanged = {k for k in old.keys() & new.keys() if old[k] == new[k]}
    assert {r.k for r in rows}.isdisjoint(unchanged)
    assert len(rows) == len(set(old) | set(new)) - len(unchanged)

    applied = apply_changes(old_df, diff, "k")
    assert {(r.k, r.v) for r in applied.collect()} == set(new.items())

    # preimage feed: pre_present marks exactly the keys that existed in
    # old (NEVER inferred from payload null-ness), pre_v carries old's
    # value, and the default-shape columns are unchanged
    pre_rows = snapshot_diff(
        old_df, new_df, "k", include_preimage=True
    ).collect()
    assert {(r.k, r.op) for r in pre_rows} == {(r.k, r.op) for r in rows}
    for r in pre_rows:
        assert r.pre_present == (r.k in old)
        assert r.pre_v == (old[r.k] if r.k in old else None)


def test_snapshot_diff_rejects_reserved_name_collisions(spark):
    """A payload column named like a generated output column (op,
    pre_present, pre_<col>) must fail loudly at diff time, not as an
    AMBIGUOUS_REFERENCE somewhere downstream."""
    import pytest

    from mapreduce__spark.operators.cdc import snapshot_diff

    df_op = spark.createDataFrame([(1, "U")], "k bigint, op string")
    with pytest.raises(ValueError, match="collision"):
        snapshot_diff(df_op, df_op, "k")
    # a different op_col name makes the same frame diffable
    assert snapshot_diff(df_op, df_op, "k", op_col="change_op").count() == 0

    df_pre = spark.createDataFrame([(1, 2)], "k bigint, pre_present bigint")
    with pytest.raises(ValueError, match="collision"):
        snapshot_diff(df_pre, df_pre, "k", include_preimage=True)
    # without preimages the pre_* namespace is not generated — fine
    assert snapshot_diff(df_pre, df_pre, "k").count() == 0


# keyed snapshots whose payload is (nullable group label, nullable
# 2-decimal cents value) — NULL groups are the shape the fixtures lack
# and the null-safe group merge exists for; NULL values exercise the
# SQL-sum edge where a group's sum must be NULL, not 0.00, when every
# remaining value is NULL (round-7 advice item 1)
_grouped_snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=15),
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["g0", "g1", "g2"])),
        st.one_of(
            st.none(), st.integers(min_value=-10_000, max_value=10_000)
        ),
    ),
    max_size=12,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=_grouped_snapshot, new=_grouped_snapshot)
def test_incremental_group_stats_equals_direct_recompute(spark, old, new):
    """The IVM law: patching old's per-group (count, sum) with the
    pre/post-image delta == aggregating new directly — for arbitrary
    snapshots, including NULL group labels (split-group hazard of a
    null-unsafe merge) and group moves between snapshots."""
    from mapreduce__spark.operators.cdc import incremental_group_stats

    def mk(d):
        return spark.createDataFrame(
            [
                (k, g, c / 100.0 if c is not None else None)
                for k, (g, c) in d.items()
            ]
            or [],
            "k bigint, g string, v double",
        )

    got = {
        r.g: (r.n_rows, float(r.sum_value) if r.sum_value is not None else None)
        for r in incremental_group_stats(mk(old), mk(new), "k", "g", "v").collect()
    }
    # pure-Python mirror of new.groupBy(g).agg(count(*), sum(v)) with SQL
    # sum semantics: NULL values skipped; all-NULL (or empty) sum is NULL
    want: dict = {}
    for g, c in new.values():
        n, s = want.get(g, (0, None))
        if c is not None:
            s = (s or 0) + c
        want[g] = (n + 1, s)
    want = {g: (n, s / 100.0 if s is not None else None) for g, (n, s) in want.items()}
    assert got == want
