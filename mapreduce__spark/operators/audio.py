"""G.711 mu-law audio transcoding over real WAV bytes.

The audio sibling of the image-codec family: telephony/ASR corpora
ship 8-bit mu-law companded audio, and a training pipeline needs the
encode (PCM16 -> 8-bit code) and decode (code -> PCM16) as exact
integer operators. G.711's mu-law is a piecewise-linear approximation
of a logarithm — sign bit, 3-bit segment (the magnitude's MSB
position), 4-bit mantissa, all bits inverted on the wire — so both
directions are pure integer arithmetic an SQL oracle can replicate
term for term (ITU-T G.711 tables 1a/1b; BIAS 0x84, CLIP 32635 — the
constants every reference implementation shares).

The WAV chunk walk here is intentionally standalone (same rationale as
operators/phash.py: the attested decode_wav_pcm path stays
byte-identical) and honors the same RIFF hazards the fixtures plant:
odd-size junk chunks with pad bytes, data before fmt.

Scale shape: one corpus scan, Arrow-batched mapInPandas; audio bytes
never shuffle — only per-doc code hashes and error aggregates leave
the scan stage. Reference parity: no audio ops in the reference
(Search.cpp is text-only); tier-2 multimodal extension (SURVEY §2b
O-25).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MULAW_BIAS = 0x84  # 132
MULAW_CLIP = 32635
CHARFOLD_MOD = 2147483647

# segment thresholds on v = (mag >> 7): exponent e iff v in [2^e, 2^(e+1))
_SEG_THRESHOLDS = np.array([2, 4, 8, 16, 32, 64, 128, 256], dtype=np.int64)


def _wav_samples(b: bytes) -> np.ndarray:
    """PCM16 WAV -> int64 sample array (interleaved frame order).
    Standalone chunk walk (see module docstring); raises ValueError on
    anything that is not an intact PCM16 file."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i = 12
    fmt = None
    data_span = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 8 + 16 <= len(b):
            fmt = struct.unpack("<HHIIHH", b[i + 8 : i + 24])
        elif cid == b"data":
            data_span = (i + 8, size)
        i += 8 + size + (size & 1)
    if fmt is None or data_span is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, _rate, _, block_align, bits = fmt
    if audio_format != 1 or bits != 16 or channels < 1:
        raise ValueError("unsupported WAV variant (need PCM16)")
    if block_align != channels * 2:
        raise ValueError("inconsistent WAV block alignment for PCM16")
    off, size = data_span
    if len(b) < off + size or size % block_align != 0:
        raise ValueError("truncated WAV data chunk")
    return np.frombuffer(b, dtype="<i2", count=size // 2, offset=off).astype(
        np.int64
    )


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16-range samples -> uint8 mu-law codes (vectorized G.711)."""
    x = samples.astype(np.int64)
    sign = (x < 0).astype(np.int64) * 0x80
    mag = np.minimum(np.abs(x), MULAW_CLIP) + MULAW_BIAS
    e = np.searchsorted(_SEG_THRESHOLDS, mag >> 7, side="right")
    mant = (mag >> (e + 3)) & 0x0F
    return (~(sign | (e << 4) | mant) & 0xFF).astype(np.int64)


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> reconstructed int16-range samples."""
    u = (~codes.astype(np.int64)) & 0xFF
    sign = u & 0x80
    e = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + MULAW_BIAS) << e) - MULAW_BIAS
    return np.where(sign != 0, -mag, mag)


def wav_mulaw_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched mu-law roundtrip audit per document: sample count,
    an order-pinned char-fold hash of the code stream, the reconstructed
    sample sum, and the max absolute reconstruction error."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "n_samples": [], "code_hash": [],
                "sum_decoded": [], "max_abs_err": [],
            }
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = _wav_samples(bytes(payload))
                codes = mulaw_encode(s)
                dec = mulaw_decode(codes)
                h = 0
                for c in codes:
                    h = (h * 31 + int(c)) % CHARFOLD_MOD
                out["doc_id"].append(int(i))
                out["n_samples"].append(len(s))
                out["code_hash"].append(h)
                out["sum_decoded"].append(int(dec.sum()))
                out["max_abs_err"].append(int(np.abs(s - dec).max()))
            yield pd.DataFrame(out)

    return mm.select("doc_id", "payload").mapInPandas(
        gen,
        schema=(
            "doc_id bigint, n_samples bigint, code_hash bigint, "
            "sum_decoded bigint, max_abs_err bigint"
        ),
    )
