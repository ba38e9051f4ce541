"""Perceptual image hashing (dHash) + Hamming-banded near-dup pairs.

Image-level near-duplicate detection is the multimodal sibling of the
text MinHash family: hash every image to a tiny fingerprint, then find
pairs within a Hamming radius WITHOUT the all-pairs product. dHash
(difference hash) is the standard cheap perceptual fingerprint: sample
the grayscale image on a 9x8 grid and emit one bit per horizontally
adjacent cell comparison — 64 bits that survive re-encoding and small
crops/noise.

Exactness discipline: grayscale is integer BT.601
((299R + 587G + 114B) // 1000), the grid is nearest-neighbor sampled
at x = (col*w)//9, y = (row*h)//8 (pure integer ops — box-averaging
would also work but NN sampling keeps the DuckDB oracle a closed-form
expression over the pixel law), and the 64 bits ship as two 32-bit
halves (dhash_hi/dhash_lo) so BIGINT arithmetic never touches the sign
bit in either engine.

Scale path (the declared operator): split the 64 bits into FOUR 16-bit
bands. By pigeonhole, two hashes within Hamming distance 3 must agree
on at least one whole band, so candidates meet in an equi-join on
(band_index, band_value) — O(N·4) shuffle rows, never N². The exact
Hamming filter then runs only on candidates. The DuckDB oracle is the
quadratic brute force over the law-reconstructed hashes, so the banded
plan is differentially proven complete (the pigeonhole guarantee is
what makes brute-force vs banded agree EXACTLY, not approximately).

The BMP array decode here is intentionally standalone (not a refactor
of operators/multimodal.py's attested decode_bmp_pixels) so the
driver-attested decoder paths stay byte-identical; the hazards are the
same (bottom-up vs top-down rows, stride padding).

Reference parity: no image ops exist in the reference (its corpus is
text, Search.cpp:183-205); this is tier-2 multimodal+dedup extension
surface (SURVEY §2b O-22/O-25).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DHASH_BANDS = 4
DHASH_RADIUS = 3  # pigeonhole-complete with 4 bands: radius < bands


def _bmp_rgb_array(b: bytes) -> np.ndarray:
    """Uncompressed 24bpp BMP -> (h, w, 3) uint8 RGB array with row
    order normalized to top-down. Standalone on purpose (see module
    docstring); raises ValueError on unsupported variants."""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP")
    data_offset = struct.unpack("<I", b[10:14])[0]
    w, h_signed = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    compression = struct.unpack("<I", b[30:34])[0]
    if bpp != 24 or compression != 0 or planes != 1 or w <= 0 or h_signed == 0:
        raise ValueError("unsupported BMP variant (need uncompressed 24bpp)")
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    if len(b) < data_offset + stride * h:
        raise ValueError("truncated BMP pixel array")
    arr = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_offset)
    arr = arr.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        arr = arr[::-1]
    return arr[:, :, ::-1]  # BGR -> RGB


def dhash_halves(rgb: np.ndarray) -> tuple[int, int]:
    """64-bit dHash of an RGB array as (hi, lo) 32-bit halves. Bit
    (row*8 + col) compares grid[row][col] < grid[row][col+1] on the
    9x8 nearest-neighbor-sampled integer grayscale grid."""
    h, w, _ = rgb.shape
    px = rgb.astype(np.int64)
    gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    xs = (np.arange(9) * w) // 9
    ys = (np.arange(8) * h) // 8
    grid = gray[np.ix_(ys, xs)]
    bits = (grid[:, :8] < grid[:, 1:]).astype(np.int64)  # 8x8
    weights = 1 << (np.arange(32, dtype=np.int64))
    flat = bits.reshape(64)
    lo = int((flat[:32] * weights).sum())
    hi = int((flat[32:] * weights).sum())
    return hi, lo


def image_dhash_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched per-image fingerprints: (doc_id, width, height,
    dhash_hi, dhash_lo). One scan; image bytes never shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [],
                "dhash_hi": [], "dhash_lo": [],
            }
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                rgb = _bmp_rgb_array(bytes(payload))
                hi, lo = dhash_halves(rgb)
                out["doc_id"].append(int(i))
                out["height"].append(rgb.shape[0])
                out["width"].append(rgb.shape[1])
                out["dhash_hi"].append(hi)
                out["dhash_lo"].append(lo)
            yield pd.DataFrame(out)

    return mm.select("doc_id", "payload").mapInPandas(
        gen,
        schema=(
            "doc_id bigint, width bigint, height bigint, "
            "dhash_hi bigint, dhash_lo bigint"
        ),
    )


def dhash_near_dup_pairs(hashes: DataFrame, radius: int = DHASH_RADIUS) -> DataFrame:
    """(doc_a, doc_b, hamming) for every pair within `radius` — banded
    candidate generation (4 x 16-bit bands, equi-join, pigeonhole-
    complete for radius < 4) + exact Hamming verification, all in
    built-in JVM expressions."""
    if radius >= DHASH_BANDS:
        raise ValueError("pigeonhole completeness needs radius < band count")
    # lazy lineage cut: the hash table feeds BOTH sides of the band
    # self-join — without it the image decode scan runs twice (the
    # dedup_lsh_minhash one-job guard, applied to images)
    hashes = hashes.localCheckpoint(eager=False)
    banded = hashes.select(
        "doc_id", "dhash_hi", "dhash_lo",
        F.posexplode(
            F.array(
                F.col("dhash_lo") % 65536,
                F.shiftrightunsigned("dhash_lo", 16),
                F.col("dhash_hi") % 65536,
                F.shiftrightunsigned("dhash_hi", 16),
            )
        ).alias("band_idx", "band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.dhash_hi").alias("a_hi"),
            F.col("a.dhash_lo").alias("a_lo"),
            F.col("b.dhash_hi").alias("b_hi"),
            F.col("b.dhash_lo").alias("b_lo"),
        )
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
        + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
    ).cast("bigint")
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= radius)
        .select("doc_a", "doc_b", "hamming")
    )
