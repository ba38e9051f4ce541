"""MP4/ISO-BMFF sample-table parsing: the video frame index.

Frame-sampling a video corpus (the multimodal brief's "frame-sample"
step) starts from the container's sample tables, not the codec: the
`stbl` box family maps every sample to its timestamp, size, chunk and
file offset (ISO/IEC 14496-12: `stts` time-to-sample runs, `stsz`
sizes, `stsc` sample-to-chunk runs, `stco`/`co64` chunk offsets).
This module walks the box tree from raw bytes — no media library —
resolves each sample to its absolute file offset, and PROVES the
resolution by reading the sample's first payload byte out of `mdat`
(a wrong stsc run interpretation or chunk-offset base lands on the
wrong byte, which the law check catches).

Container hazards the fixtures plant (all real-world shapes):
* `mdat` with size==1 + 64-bit largesize (every d%6==0 doc);
* a `free` box between `moov` and `mdat` (d%5==1) and an unknown
  `uuid` box inside `stbl` — walkers must skip by size, not pattern;
* `co64` (64-bit chunk offsets) instead of `stco` on d%4==2;
* two-run `stts` and a partial final chunk expressed as a second
  `stsc` run (the spec's run semantics, not the "last chunk implied"
  shortcut).

Reference parity: no media handling in the reference; tier-2 O-25
extension. SCALE: one corpus scan, Arrow-batched mapInPandas; at real
scale only `moov` (KBs) plus the probed bytes are fetched per file —
payload bytes never shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SAMPLES_PER_CHUNK = 3


def _video_laws(d: int) -> tuple[int, int, int, int]:
    """(n_samples, r1, delta1, delta2): two stts runs, r1 samples at
    delta1 then the rest at delta2."""
    n = d % 25 + 5
    r1 = n // 2 + 1
    return n, r1, 100 + d % 5, 200 + d % 7


def _sample_size(d: int, k: int) -> int:
    return (d + k) % 9 + 2


def _sample_first_byte(d: int, k: int) -> int:
    return (d * 3 + k) % 256


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full_box(btype: bytes, payload: bytes, version: int = 0) -> bytes:
    return _box(btype, struct.pack(">B3x", version) + payload)


def synth_mp4_sample_bytes(doc_id: int) -> bytes:
    """Deterministic ISO-BMFF file with a full stbl sample table and a
    real mdat whose per-sample first bytes follow the law."""
    d = doc_id
    n, r1, dt1, dt2 = _video_laws(d)
    sizes = [_sample_size(d, k) for k in range(n)]

    stts_entries = [(r1, dt1)]
    if n - r1 > 0:
        stts_entries.append((n - r1, dt2))
    stts = _full_box(
        b"stts",
        struct.pack(">I", len(stts_entries))
        + b"".join(struct.pack(">II", c, delta) for c, delta in stts_entries),
    )
    stsz = _full_box(
        b"stsz",
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    n_chunks = (n + SAMPLES_PER_CHUNK - 1) // SAMPLES_PER_CHUNK
    stsc_entries = [(1, SAMPLES_PER_CHUNK, 1)]
    if n % SAMPLES_PER_CHUNK:
        stsc_entries.append((n_chunks, n % SAMPLES_PER_CHUNK, 1))
    stsc = _full_box(
        b"stsc",
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )

    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 512)
    uuid_junk = _box(b"uuid", b"\xde\xad" * (d % 4 + 1))
    free = _box(b"free", b"pad" * (d % 3 + 1)) if d % 5 == 1 else b""

    # chunk offsets are absolute: lay out the tail first with a
    # placeholder, then patch. Compute sizes bottom-up instead: build
    # stco/co64 with known header sizes.
    use_co64 = d % 4 == 2
    co_payload_len = 4 + n_chunks * (8 if use_co64 else 4)
    co_box_len = 12 + co_payload_len
    stbl_inner_pre = stts + stsz + stsc + uuid_junk
    stbl_len = 8 + len(stbl_inner_pre) + co_box_len
    minf_len = 8 + stbl_len
    mdia_len = 8 + minf_len
    trak_len = 8 + mdia_len
    moov_len = 8 + trak_len
    mdat_header = 16 if d % 6 == 0 else 8
    mdat_data_start = 16 + moov_len + len(free) + mdat_header

    offsets = []
    pos = mdat_data_start
    for c in range(n_chunks):
        offsets.append(pos)
        for k in range(c * SAMPLES_PER_CHUNK, min(n, (c + 1) * SAMPLES_PER_CHUNK)):
            pos += sizes[k]
    if use_co64:
        co = _full_box(
            b"co64",
            struct.pack(">I", n_chunks)
            + b"".join(struct.pack(">Q", o) for o in offsets),
        )
    else:
        co = _full_box(
            b"stco",
            struct.pack(">I", n_chunks)
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
    stbl = _box(b"stbl", stbl_inner_pre + co)
    moov = _box(b"moov", _box(b"trak", _box(b"mdia", _box(b"minf", stbl))))
    assert len(moov) == moov_len

    payload = b"".join(
        bytes([_sample_first_byte(d, k)]) + b"\x00" * (sizes[k] - 1)
        for k in range(n)
    )
    if d % 6 == 0:
        mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    else:
        mdat = _box(b"mdat", payload)
    return ftyp + moov + free + mdat


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end), honoring 64-bit largesize. Raises ValueError on any
    malformed framing."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        size = struct.unpack(">I", b[pos : pos + 4])[0]
        btype = b[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize")
            size = struct.unpack(">Q", b[pos + 8 : pos + 16])[0]
            header = 16
        if size < header or pos + size > end:
            raise ValueError("MP4 box overruns its container")
        yield btype, pos + header, pos + size
        pos += size


def _find_box(b: bytes, start: int, end: int, path: list[bytes]) -> tuple[int, int]:
    lo, hi = start, end
    for name in path:
        for btype, ps, pe in _walk_boxes(b, lo, hi):
            if btype == name:
                lo, hi = ps, pe
                break
        else:
            raise ValueError(f"missing MP4 box {name.decode()}")
    return lo, hi


def _full_payload(b: bytes, ps: int, pe: int) -> tuple[int, int]:
    if ps + 4 > pe:
        raise ValueError("truncated MP4 full box")
    version = b[ps]
    return version, ps + 4


def parse_mp4_samples(b: bytes) -> list[tuple[int, int, int, int, int, int]]:
    """(sample, dts, size, chunk, offset_in_mdat, first_byte) per
    sample, with offsets resolved through stsc/stco(co64) and the first
    byte READ from mdat at the resolved absolute offset."""
    boxes = {t: (ps, pe) for t, ps, pe in _walk_boxes(b, 0, len(b))}
    if b"moov" not in boxes or b"mdat" not in boxes:
        raise ValueError("missing moov or mdat")
    mdat_start = boxes[b"mdat"][0]
    stbl_lo, stbl_hi = _find_box(
        b, *boxes[b"moov"], [b"trak", b"mdia", b"minf", b"stbl"]
    )
    tables: dict[bytes, tuple[int, int]] = {}
    for btype, ps, pe in _walk_boxes(b, stbl_lo, stbl_hi):
        tables[btype] = (ps, pe)
    for need in (b"stts", b"stsz", b"stsc"):
        if need not in tables:
            raise ValueError(f"missing MP4 box {need.decode()}")
    if b"stco" not in tables and b"co64" not in tables:
        raise ValueError("missing MP4 chunk-offset box")

    def u32(i: int) -> int:
        if i + 4 > len(b):
            raise ValueError("truncated MP4 table")
        return struct.unpack(">I", b[i : i + 4])[0]

    # stsz
    _, p = _full_payload(b, *tables[b"stsz"])
    fixed, n = u32(p), u32(p + 4)
    sizes = [fixed] * n if fixed else [u32(p + 8 + 4 * k) for k in range(n)]

    # stts -> dts per sample
    _, p = _full_payload(b, *tables[b"stts"])
    n_runs = u32(p)
    dts, t = [], 0
    for r in range(n_runs):
        cnt, delta = u32(p + 4 + 8 * r), u32(p + 8 + 8 * r)
        for _ in range(cnt):
            dts.append(t)
            t += delta
    if len(dts) != n:
        raise ValueError("stts sample count disagrees with stsz")

    # chunk offsets
    if b"co64" in tables:
        _, p = _full_payload(b, *tables[b"co64"])
        n_chunks = u32(p)
        if p + 4 + 8 * n_chunks > len(b):
            raise ValueError("truncated MP4 table")
        chunk_offs = [
            struct.unpack(">Q", b[p + 4 + 8 * c : p + 12 + 8 * c])[0]
            for c in range(n_chunks)
        ]
    else:
        _, p = _full_payload(b, *tables[b"stco"])
        n_chunks = u32(p)
        chunk_offs = [u32(p + 4 + 4 * c) for c in range(n_chunks)]

    # stsc runs -> samples per chunk
    _, p = _full_payload(b, *tables[b"stsc"])
    n_sc = u32(p)
    runs = [
        (u32(p + 4 + 12 * r), u32(p + 8 + 12 * r))  # (first_chunk, spc)
        for r in range(n_sc)
    ]
    spc_per_chunk = []
    for idx, (first, spc) in enumerate(runs):
        last = runs[idx + 1][0] - 1 if idx + 1 < len(runs) else n_chunks
        spc_per_chunk.extend([spc] * (last - first + 1))
    if len(spc_per_chunk) != n_chunks:
        raise ValueError("stsc runs do not cover the chunk list")

    rows = []
    k = 0
    for c in range(n_chunks):
        off = chunk_offs[c]
        for _ in range(spc_per_chunk[c]):
            if k >= n:
                raise ValueError("stsc assigns more samples than stsz has")
            if off + sizes[k] > len(b):
                raise ValueError("sample overruns the file")
            rows.append(
                (k, dts[k], sizes[k], c + 1, off - chunk_offs[0], b[off])
            )
            off += sizes[k]
            k += 1
    if k != n:
        raise ValueError("chunk walk did not cover every sample")
    _ = mdat_start  # absolute offsets are proven by the first-byte read
    return rows


def with_mp4_sample_payload(docs: DataFrame) -> DataFrame:
    from mapreduce__spark.operators.multimodal import _with_payload

    return _with_payload(docs, synth_mp4_sample_bytes)


def mp4_sample_index(mm: DataFrame) -> DataFrame:
    """Arrow-batched sample-table walk: one row per video sample."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "sample", "dts", "size", "chunk", "off_mdat", "first_byte"]
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                for row in parse_mp4_samples(bytes(payload)):
                    out["doc_id"].append(int(i))
                    for c, v in zip(cols[1:], row):
                        out[c].append(v)
            yield pd.DataFrame(out)

    return mm.select("doc_id", "payload").mapInPandas(
        gen,
        schema=(
            "doc_id bigint, sample bigint, dts bigint, size bigint, "
            "chunk bigint, off_mdat bigint, first_byte bigint"
        ),
    )
