"""Pipeline materialization seam: executor-memory vs durable parquet.

The multi-consumer intermediates in the dedup/pipeline flagships (MinHash
signatures, the scrubbed corpus, the decontaminated corpus) must be
materialized once — left lazy, every downstream consumer re-executes the
producing lineage. Two shapes exist:

* ``staging_dir=None`` (default): ``localCheckpoint(eager=True)`` —
  executor-memory blocks, zero I/O, the right call at benchmark scale
  (measured ~1.9x on the end-to-end flagship at sf0.1).
* ``staging_dir=<path>``: write parquet under the dir and read it back —
  the 100 TB shape. A corpus-sized scrubbed/decontaminated relation does
  not fit in executor storage memory at scale, is itself a deliverable
  (the scrubbed corpus ships), and durable staging survives executor
  loss, which ``localCheckpoint`` does NOT (its blocks live only in
  executor storage, so losing one executor kills the lineage-truncated
  job). On a cluster the dir is an object-store/HDFS URI.

Both shapes truncate lineage and are value-identical
(tests/test_staging.py pins equality at sf0.001).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame


def bounded_collect(df: DataFrame, max_rows: int, what: str) -> list:
    """Driver-side collect with an EXPLICIT, ENFORCED row bound.

    Every deliberate `.collect()` in a declared query path is an O(small)
    relation — counter rows, vocab heads, per-dimension stats, 1-row
    probes. The hazard is the NEXT caller passing a relation that is
    only accidentally small (round-7 verdict item 8 — the same mistake
    class the NULL/overflow audits were catching elsewhere): this helper
    fetches `max_rows + 1` via limit() and refuses if the declared bound
    is exceeded, so an unbounded driver materialization fails loudly at
    the seam instead of OOMing the driver at scale.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"bounded_collect({what}): relation exceeds its declared "
            f"bound of {max_rows} rows — refusing what would be an "
            "unbounded driver-side materialization"
        )
    return rows


def stage(df: DataFrame, staging_dir: str | None, name: str) -> DataFrame:
    """Materialize ``df`` once: memory checkpoint, or durable parquet
    under ``staging_dir/name`` (overwritten per run — staging output is a
    scratch namespace owned by the pipeline invocation, not a sink)."""
    if staging_dir is None:
        return df.localCheckpoint(eager=True)
    # posixpath, not os.path: staging dirs are Hadoop-filesystem URIs
    # (s3a://, hdfs://, file:/) whose separator is '/' on every platform.
    path = posixpath.join(staging_dir, name)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
