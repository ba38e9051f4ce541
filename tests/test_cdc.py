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
