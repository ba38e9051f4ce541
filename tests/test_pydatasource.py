"""The custom Python DataSource connector (sources/pydatasource.py):
batch partition planning + parallel reads, streaming offsets, and the
restart/exactly-once contract a real queue connector must honor."""

from __future__ import annotations

import time

from mapreduce__spark.sources.pydatasource import (
    _doc_text,
    _plan_ranges,
    register,
)


def _registered(spark):
    register(spark)
    return spark


def test_batch_read_parallel_and_deterministic(spark):
    spark = _registered(spark)
    df = (
        spark.read.format("synthdocs")
        .option("n_docs", 100)
        .option("partitions", 5)
        .load()
    )
    # The planner must honor the requested split — this is what fans the
    # read across executors on a cluster.
    assert df.rdd.getNumPartitions() == 5
    rows = sorted((r.doc_id, r.text) for r in df.collect())
    assert [r[0] for r in rows] == list(range(100))
    # Rows are a pure function of doc_id: re-read is bit-identical and
    # matches the formula directly.
    assert rows[37][1] == _doc_text(37, 30)
    assert rows == sorted((r.doc_id, r.text) for r in df.collect())


def test_plan_ranges_never_empty_and_covering():
    for start, end, parts in [(0, 10, 3), (0, 2, 8), (5, 5, 4), (7, 6, 2)]:
        ranges = _plan_ranges(start, end, parts)
        assert all(r.start < r.end for r in ranges)
        covered = [i for r in ranges for i in range(r.start, r.end)]
        assert covered == list(range(start, max(start, end)))
        assert len(ranges) <= parts


def _run_stream_until(spark, sdf, out: str, ckpt: str, n: int, timeout: float):
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + timeout
    cnt = 0
    while time.time() < deadline:
        try:
            cnt = spark.read.parquet(out).count()
        except Exception:
            cnt = 0
        if cnt >= n:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    return cnt


def test_stream_delivers_exactly_once_across_restart(spark, tmp_path):
    """Micro-batches cover contiguous offset ranges; a restart against the
    same checkpoint must deliver nothing new and nothing twice (the
    persisted cursor_file is the 'broker position' that stops a fresh
    reader from regressing offsets — see the reader's docstring)."""
    spark = _registered(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sdf = (
        spark.readStream.format("synthdocs")
        .option("max_rows", 60)
        .option("rows_per_batch", 20)
        .option("partitions", 3)
        .option("cursor_file", str(tmp_path / "cursor"))
        .load()
    )
    assert _run_stream_until(spark, sdf, out, ckpt, 60, timeout=90) == 60
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == list(range(60))
    # restart: bounded wait, then the corpus must be byte-for-byte the same
    _run_stream_until(spark, sdf, out, ckpt, 61, timeout=10)
    again = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert [a[0] for a in again] == list(range(60))
    assert all(t == _doc_text(i, 30) for i, t in again)


def test_stream_reader_warns_without_cursor_file():
    """ADVICE r6: omitting cursor_file silently permitted a restart to
    regress latestOffset and re-emit delivered rows. The hazard must be
    surfaced at construction (Spark hides the checkpoint dir from the
    source, so no safe default path can be derived)."""
    import warnings

    from mapreduce__spark.sources.pydatasource import SynthDocsStreamReader

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        SynthDocsStreamReader({"max_rows": "10"})
    assert any("cursor_file" in str(w.message) for w in caught)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        SynthDocsStreamReader({"max_rows": "10", "cursor_file": "/tmp/_c"})
    assert not any("cursor_file" in str(w.message) for w in caught)
