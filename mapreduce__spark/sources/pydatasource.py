"""Custom connector via the Python DataSource API (PySpark 4) — the
pluggable-source half of O-3 (SURVEY.md §2b): the reference hard-wires its
one input (a directory listing fed to Map tasks,
MapReduceFramework.cpp:621-694); a Spark-first engine instead exposes the
connector seam itself, so ANY external system (an object-store listing, a
message queue, an internal record service) can feed the same query surface
without touching the operators.

`synthdocs` is that seam exercised end-to-end with a deterministic
generator behind it (no external service exists in the sandbox; the
CONNECTOR machinery — schema declaration, partition planning, parallel
batch reads, streaming offsets/replay/commit — is the real, tested part,
exactly like the multimodal decode stubs keep real plumbing around a
stubbed codec):

* batch: `spark.read.format("synthdocs").option("n_docs", ...)` plans K
  `InputPartition`s read in parallel on executors — the shape a real
  connector uses to split a table/topic/bucket listing;
* streaming: `spark.readStream.format("synthdocs")` is an offset-based
  micro-batch source: offsets are row positions, each batch is the
  deterministic row range [start, end), so checkpoint replay after a
  crash reproduces the exact same batch — the exactly-once contract a
  queue connector must honor.

Rows are a pure function of doc_id (no RNG state), so any two reads of
the same options are bit-identical — which is what makes the connector
testable and its streams replayable.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_VOCAB = (
    "spark map reduce shuffle sort merge scan filter join group window "
    "batch stream table row column key value hash range part"
).split()


def _doc_text(doc_id: int, n_words: int) -> str:
    # Pure function of doc_id — a multiplicative step walks the vocab so
    # neighboring docs differ everywhere, not just in a suffix.
    return " ".join(
        _VOCAB[(doc_id * 31 + 7 * i) % len(_VOCAB)] for i in range(n_words)
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _plan_ranges(start: int, end: int, parts: int) -> list[_Range]:
    """Split [start, end) into at most `parts` contiguous ranges (never an
    empty range — Spark tolerates them, but they waste task launches)."""
    total = end - start
    if total <= 0:
        return []
    parts = max(1, min(parts, total))
    step = math.ceil(total / parts)
    return [
        _Range(s, min(s + step, end)) for s in range(start, end, step)
    ]


class SynthDocsReader(DataSourceReader):
    """Batch half: K partitions, each generating its own id range on an
    executor — the driver plans ranges only (O(#partitions) metadata, no
    row ever materializes driver-side)."""

    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.n_words = int(options.get("words_per_doc", 30))

    def partitions(self) -> list[InputPartition]:
        return _plan_ranges(0, self.n_docs, self.n_parts)

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, _doc_text(i, self.n_words))


class SynthDocsStreamReader(DataSourceStreamReader):
    """Streaming half: offsets are row positions; batch N covers the
    deterministic range [start, end), split into the same parallel
    partitions as the batch reader.

    Replay contract: the rows of a range are a pure function of the
    range, so re-reading a checkpointed (start, end) after a crash
    yields the identical batch — exactly-once lands on the sink's
    idempotency as usual.

    RESTART contract (measured, not assumed): after a restart Spark may
    call `latestOffset` on the FRESH reader instance before this reader
    has seen any checkpointed offset (the offset log lives with the
    SINK's checkpoint, not the source), and if the answer moves BACKWARD
    past the checkpointed position, Spark records the regressed offset
    and the next forward batch re-plans — and therefore re-emits —
    already-delivered rows. A real queue connector avoids this by asking
    the BROKER for its position; the broker here is `cursor_file`: the
    furthest planned position is fsync-persisted there and reloaded on
    restart, and every offset Spark hands us (partitions/commit) also
    fast-forwards it. Without cursor_file the reader still never
    re-plans rows when Spark replays the last uncommitted batch first
    (the partitions() fast-forward), but a restart that skips the replay
    can regress the cursor — so the tests (and any caller that restarts
    streams) pass cursor_file."""

    def __init__(self, options: dict):
        self.max_rows = int(options.get("max_rows", 100))
        self.rows_per_batch = int(options.get("rows_per_batch", 10))
        self.n_parts = int(options.get("partitions", 4))
        self.n_words = int(options.get("words_per_doc", 30))
        self._cursor_file = options.get("cursor_file")
        if not self._cursor_file:
            # The docstring's restart contract is unenforceable without a
            # cursor: a restart that skips last-batch replay regresses
            # latestOffset past the checkpointed position and re-emits
            # delivered rows. Spark does not expose the checkpoint dir to
            # the source, so a safe default path cannot be derived —
            # surface the hazard instead of silently permitting it.
            import warnings

            warnings.warn(
                "synthdocs streamReader built without option 'cursor_file': "
                "a stream RESTART may re-emit already-delivered rows "
                "(latestOffset can regress past the checkpointed position). "
                "Pass .option('cursor_file', <path>) for restart-safe offsets.",
                RuntimeWarning,
                stacklevel=2,
            )
        # furthest row position ever planned or committed
        self._cursor = self._load_cursor()

    def _load_cursor(self) -> int:
        if not self._cursor_file:
            return 0
        try:
            with open(self._cursor_file) as fh:
                return int(fh.read().strip() or 0)
        except FileNotFoundError:
            return 0

    def _fast_forward(self, pos: int) -> None:
        if pos <= self._cursor:
            return
        self._cursor = pos
        if self._cursor_file:
            import os

            tmp = self._cursor_file + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(str(pos))
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, self._cursor_file)

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        self._fast_forward(
            min(self._cursor + self.rows_per_batch, self.max_rows)
        )
        return {"pos": self._cursor}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # Offsets Spark hands back are ground truth — a replayed batch
        # after restart fast-forwards a fresh reader past planned rows.
        self._fast_forward(max(int(start["pos"]), int(end["pos"])))
        return _plan_ranges(int(start["pos"]), int(end["pos"]), self.n_parts)

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, _doc_text(i, self.n_words))

    def commit(self, end: dict) -> None:
        self._fast_forward(int(end["pos"]))


class SynthDocsDataSource(DataSource):
    """format("synthdocs"): deterministic document corpus as a custom
    Python data source — batch and micro-batch streaming."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def streamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the synthdocs format on a session."""
    spark.dataSource.register(SynthDocsDataSource)
