"""Multimodal columns — binary payloads with typed metadata.

Images / audio / video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; heavy per-item work (decode, feature
extraction, resize, frame sampling) runs as Arrow-batched pandas functions
over ``mapInPandas`` so each Python worker sees whole columnar batches.

The decode step itself is STUBBED (no image/audio libraries in this
environment): :func:`decode_stub_features` computes a deterministic fake
"decode" from the payload bytes, and :data:`REAL_DECODE_AVAILABLE` gates
where a real `PIL.Image.open` / `soundfile.read` would slot in. The
Spark-side plumbing — schema, batch iteration, partitioning — is real and
tested.

Scale notes: binary payloads dominate row size, so (a) never groupBy/join
on a payload — project metadata out first and join on ids; (b) size scan
partitions by bytes (`spark.sql.files.maxPartitionBytes`), not rows;
(c) `mapInPandas` preserves partitioning — no shuffle is introduced by the
decode stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoders would be imported here on a full cluster image
    import PIL.Image  # noqa: F401

    REAL_DECODE_AVAILABLE = True
except Exception:  # pragma: no cover - env has no PIL by design
    REAL_DECODE_AVAILABLE = False


FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, fake_width int, fake_height int, "
    "fake_mode string, checksum bigint"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary payload column + typed metadata struct (the
    multimodal row shape: id, payload, meta)."""
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.length(payload).alias("byte_len"),
        F.lit("text/plain").alias("mime"),
        F.md5(payload).alias("content_md5"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def decode_stub_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: deterministic fake decode of binary payloads.

    A real implementation would replace the body of `fake_decode` with
    `PIL.Image.open(io.BytesIO(b))` etc.; everything around it (Arrow
    batching, output schema, partition preservation) is the production
    plumbing.
    """

    def fake_decode(b: bytes) -> tuple[int, int, str, int]:
        if REAL_DECODE_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("real decoder path not wired in this build")
        width = (b[0] % 64) + 1 if b else 0
        height = (b[-1] % 64) + 1 if b else 0
        mode = "RGB" if (len(b) % 2 == 0) else "L"
        checksum = sum(b[:256])
        return width, height, mode, checksum

    for pdf in batches:
        decoded = [fake_decode(bytes(b)) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "byte_len": [len(bytes(b)) for b in pdf["payload"]],
                "fake_width": [d[0] for d in decoded],
                "fake_height": [d[1] for d in decoded],
                "fake_mode": [d[2] for d in decoded],
                "checksum": [d[3] for d in decoded],
            }
        )


def extract_features(multimodal: DataFrame) -> DataFrame:
    """Run the (stubbed) decode/feature pass over binary payloads."""
    return multimodal.select("doc_id", "payload").mapInPandas(
        decode_stub_features, schema=FEATURE_SCHEMA
    )


def decode_stub_features_arrow(batches):
    """mapInArrow body: same fake decode, but consuming/producing
    pyarrow RecordBatches directly — skips the Arrow<->pandas conversion
    that mapInPandas pays on both edges. The faster boundary when the
    Python work reads raw bytes anyway (decoders do)."""
    import pyarrow as pa

    for batch in batches:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        cols = {
            "doc_id": doc_ids,
            "byte_len": [], "fake_width": [], "fake_height": [],
            "fake_mode": [], "checksum": [],
        }
        for b in payloads:
            b = bytes(b)
            cols["byte_len"].append(len(b))
            cols["fake_width"].append((b[0] % 64) + 1 if b else 0)
            cols["fake_height"].append((b[-1] % 64) + 1 if b else 0)
            cols["fake_mode"].append("RGB" if len(b) % 2 == 0 else "L")
            cols["checksum"].append(sum(b[:256]))
        yield pa.RecordBatch.from_pydict(
            cols,
            schema=pa.schema([
                ("doc_id", pa.int64()), ("byte_len", pa.int32()),
                ("fake_width", pa.int32()), ("fake_height", pa.int32()),
                ("fake_mode", pa.string()), ("checksum", pa.int64()),
            ]),
        )


def extract_features_arrow(multimodal: DataFrame) -> DataFrame:
    """Arrow-native variant of :func:`extract_features` (mapInArrow)."""
    return multimodal.select("doc_id", "payload").mapInArrow(
        decode_stub_features_arrow, schema=FEATURE_SCHEMA
    )
