"""IMA ADPCM (DVI4 / WAV format tag 0x11) audio decode over real WAV
bytes — the 4-bit block-structured codec telephony and game corpora
actually ship when they are not mu-law.

Each data block restarts the decoder state from its own 4-byte header
(int16 predictor + uint8 step index) — the property that makes the
format seekable and makes blocks INDEPENDENT decode units at 100 TB.
The decoder below is the general IMA state machine (per-nibble step
lookup, the standard 4-term delta approximation, int16 sample clamp,
0..88 index clamp). The FIXTURE law keeps each block's nibble constant
and its index walk inside the table's interior, so the decoded samples
collapse to an affine form over step-table lookups that a DuckDB oracle
computes with generate_series + a list literal — no recursion — while
the Python side still runs the real sequential machine; the two agree
only if the state walk is exactly right.

The WAV chunk walk is standalone (the attested mu-law/PCM paths stay
byte-identical — operators/audio.py rationale). Scale shape: one corpus
scan, Arrow-batched mapInPandas, audio bytes never shuffle. Reference
parity: no audio in the reference; tier-2 multimodal extension
(SURVEY §2b O-25).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# The IMA ADPCM step-size table (89 entries) and index-adjust table —
# the constants every reference implementation shares.
ADPCM_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
ADPCM_INDEX_ADJ = (-1, -1, -1, -1, 2, 4, 6, 8)

ADPCM_BLOCK_ALIGN = 12  # 4-byte header + 8 nibble bytes
ADPCM_NIBBLES = (ADPCM_BLOCK_ALIGN - 4) * 2  # 16 coded samples
ADPCM_SAMPLES_PER_BLOCK = ADPCM_NIBBLES + 1  # header predictor included

# Fixture law: (nibble, initial index, base predictor) per (d+b) % 6 —
# chosen so the index walk stays strictly inside [0, 88] and no sample
# ever clamps (verified exhaustively in tests). Nibbles cover both sign
# paths and all three magnitude-bit combinations the fixtures need.
ADPCM_LAW = (
    (1, 40, 1000),
    (3, 50, 2000),
    (5, 8, -25000),
    (9, 45, 2500),
    (11, 35, 2000),
    (13, 6, 20000),
)


def _adpcm_law_block(d: int, b: int) -> tuple[int, int, int]:
    v, i0, s0_base = ADPCM_LAW[(d + b) % 6]
    return v, i0, s0_base + (7 * d + 13 * b) % 97


def synth_wav_adpcm_bytes(doc_id: int) -> bytes:
    """Deterministic spec-valid mono IMA-ADPCM WAV (format tag 0x11,
    block align 12, fact chunk with the true sample count): d%3+1
    blocks, each a law-defined (predictor, index) header plus 16 copies
    of the law nibble packed low-nibble-first."""
    d = doc_id
    n_blocks = d % 3 + 1
    data = bytearray()
    for b in range(n_blocks):
        v, i0, s0 = _adpcm_law_block(d, b)
        data += struct.pack("<hBB", s0, i0, 0)
        byte = (v & 0x0F) | ((v & 0x0F) << 4)
        data += bytes([byte]) * (ADPCM_BLOCK_ALIGN - 4)
    n_samples = n_blocks * ADPCM_SAMPLES_PER_BLOCK
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11,  # WAVE_FORMAT_IMA_ADPCM
        1,  # mono
        8000,
        8000 * ADPCM_BLOCK_ALIGN // ADPCM_SAMPLES_PER_BLOCK,  # avg bytes/s
        ADPCM_BLOCK_ALIGN,
        4,  # bits per (coded) sample
        2,  # cbSize
        ADPCM_SAMPLES_PER_BLOCK,
    )
    fact = struct.pack("<I", n_samples)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_adpcm(b: bytes) -> list[int]:
    """General IMA ADPCM decode of a mono format-0x11 WAV: chunk walk,
    fmt/fact validation, then per block the real state machine — step
    lookup, 4-term delta, int16 sample clamp, 0..88 index clamp. The
    header predictor is emitted as the block's first sample. Raises
    ValueError on any malformed input."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    (riff_len,) = struct.unpack("<I", b[4:8])
    if riff_len + 8 != len(b):
        raise ValueError("RIFF length disagrees with file size")
    i = 12
    fmt = None
    fact_samples = None
    data_span = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        if i + 8 + size > len(b):
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 20:
                raise ValueError("short ADPCM fmt chunk")
            fmt = struct.unpack("<HHIIHHHH", b[i + 8 : i + 28])
        elif cid == b"fact":
            if size < 4:
                raise ValueError("short fact chunk")
            (fact_samples,) = struct.unpack("<I", b[i + 8 : i + 12])
        elif cid == b"data":
            data_span = (i + 8, size)
        i += 8 + size + (size & 1)
    if i != len(b):
        raise ValueError("trailing bytes after final WAV chunk")
    if fmt is None or data_span is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, _rate, _avg, block_align, bits, _cb, spb = fmt
    if tag != 0x11:
        raise ValueError(f"not IMA ADPCM (format tag {tag})")
    if channels != 1 or bits != 4:
        raise ValueError("only mono 4-bit IMA ADPCM supported")
    if spb != (block_align - 4) * 2 + 1:
        raise ValueError("samples-per-block disagrees with block align")
    off, size = data_span
    if size % block_align:
        raise ValueError("data size is not whole ADPCM blocks")
    samples: list[int] = []
    for blk in range(size // block_align):
        p = off + blk * block_align
        pred, idx, reserved = struct.unpack("<hBB", b[p : p + 4])
        if reserved != 0:
            raise ValueError("nonzero reserved byte in block header")
        if idx > 88:
            raise ValueError("ADPCM step index out of range")
        samples.append(pred)
        for j in range((block_align - 4) * 2):
            byte = b[p + 4 + j // 2]
            v = (byte >> 4) if j % 2 else (byte & 0x0F)
            step = ADPCM_STEPS[idx]
            diff = step >> 3
            if v & 4:
                diff += step
            if v & 2:
                diff += step >> 1
            if v & 1:
                diff += step >> 2
            pred = pred - diff if v & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + ADPCM_INDEX_ADJ[v & 7]))
            samples.append(pred)
    if fact_samples is not None and fact_samples != len(samples):
        raise ValueError("fact sample count disagrees with data blocks")
    return samples


def with_adpcm_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with synthesized IMA-ADPCM WAV bytes."""
    from mapreduce__spark.operators.multimodal import _with_payload

    return _with_payload(docs, synth_wav_adpcm_bytes)


def adpcm_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched ADPCM decode: per-doc block/sample counts, the
    exact sample sum, and the final decoded sample."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "n_blocks": [], "n_samples": [],
                "sum_samples": [], "last_sample": [],
            }
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = decode_wav_adpcm(bytes(payload))
                out["doc_id"].append(int(i))
                out["n_blocks"].append(len(s) // ADPCM_SAMPLES_PER_BLOCK)
                out["n_samples"].append(len(s))
                out["sum_samples"].append(sum(s))
                out["last_sample"].append(s[-1])
            yield pd.DataFrame(out)

    return mm.select("doc_id", "payload").mapInPandas(
        gen,
        schema=(
            "doc_id bigint, n_blocks bigint, n_samples bigint, "
            "sum_samples bigint, last_sample bigint"
        ),
    )
