"""Parquet footer audit: a from-scratch Thrift compact-protocol parser.

Row-group pruning — the single most important scan optimization at
100 TB — lives or dies on the footer: per-row-group, per-column
statistics (min/max/null_count), page offsets and sizes. This module
parses that footer from RAW BYTES with no parquet or thrift library:
the Thrift compact protocol (varints, zigzag field ids, typed field
headers, nested structs/lists) and the parquet.thrift FileMetaData /
RowGroup / ColumnChunk / ColumnMetaData / Statistics shapes
(apache/parquet-format, parquet.thrift — public spec).

Why it earns its place: the differential here is NOT a synthesis law —
it is DuckDB's OWN parquet reader (`parquet_metadata(...)`) reading
the same staged files. Two independent implementations of the same
binary format must agree field for field: a mis-read varint, a wrong
zigzag, a skipped-field bug or an off-by-one in the footer locate all
diverge immediately.

Footer layout (parquet-format README): file ends with
`[FileMetaData thrift] [4-byte little-endian length] [b"PAR1"]`.

At scale the parser reads ONLY the tail of the file (footer length +
8); the fixture files are read whole via binaryFile because they are
kilobytes. Reference parity: the reference has no binary formats at
all (Search.cpp reads text lines); this is tier-2 source-surface
engineering like the rest of O-3.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# --------------------------------------------------------------------------
# Thrift compact protocol (generic layer).
# --------------------------------------------------------------------------

_T_STOP = 0
_T_TRUE = 1
_T_FALSE = 2
_T_BYTE = 3
_T_I16 = 4
_T_I32 = 5
_T_I64 = 6
_T_DOUBLE = 7
_T_BINARY = 8
_T_LIST = 9
_T_SET = 10
_T_MAP = 11
_T_STRUCT = 12


def _varint(b: bytes, i: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if i >= len(b):
            raise ValueError("truncated thrift varint")
        byte = b[i]
        i += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, i
        shift += 7
        if shift > 70:
            raise ValueError("thrift varint too long")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _read_value(b: bytes, i: int, typ: int):
    """Read one compact-protocol value of `typ` at offset i."""
    if typ == _T_TRUE:
        return True, i
    if typ == _T_FALSE:
        return False, i
    if typ == _T_BYTE:
        if i >= len(b):
            raise ValueError("truncated thrift byte")
        return struct.unpack("b", b[i : i + 1])[0], i + 1
    if typ in (_T_I16, _T_I32, _T_I64):
        raw, i = _varint(b, i)
        return _zigzag(raw), i
    if typ == _T_DOUBLE:
        if i + 8 > len(b):
            raise ValueError("truncated thrift double")
        return struct.unpack("<d", b[i : i + 8])[0], i + 8
    if typ == _T_BINARY:
        ln, i = _varint(b, i)
        if i + ln > len(b):
            raise ValueError("truncated thrift binary")
        return b[i : i + ln], i + ln
    if typ in (_T_LIST, _T_SET):
        if i >= len(b):
            raise ValueError("truncated thrift list header")
        head = b[i]
        i += 1
        size = head >> 4
        etype = head & 0x0F
        if size == 0x0F:
            size, i = _varint(b, i)
        out = []
        for _ in range(size):
            # bools inside lists are full bytes (1 = true), unlike fields
            if etype in (_T_TRUE, _T_FALSE):
                out.append(b[i] == 1)
                i += 1
            else:
                v, i = _read_value(b, i, etype)
                out.append(v)
        return out, i
    if typ == _T_MAP:
        size, i = _varint(b, i)
        if size == 0:
            return {}, i
        if i >= len(b):
            raise ValueError("truncated thrift map header")
        kv = b[i]
        i += 1
        ktype, vtype = kv >> 4, kv & 0x0F
        out = {}
        for _ in range(size):
            k, i = _read_value(b, i, ktype)
            v, i = _read_value(b, i, vtype)
            out[k] = v
        return out, i
    if typ == _T_STRUCT:
        return _read_struct(b, i)
    raise ValueError(f"unknown thrift compact type {typ}")


def _read_struct(b: bytes, i: int) -> tuple[dict[int, object], int]:
    """Struct -> {field_id: value}; unknown fields are parsed (and thus
    skipped) by the same typed reader, so schema evolution is safe."""
    fields: dict[int, object] = {}
    last_fid = 0
    while True:
        if i >= len(b):
            raise ValueError("truncated thrift struct")
        head = b[i]
        i += 1
        if head == _T_STOP:
            return fields, i
        delta = head >> 4
        typ = head & 0x0F
        if delta:
            fid = last_fid + delta
        else:
            raw, i = _varint(b, i)
            fid = _zigzag(raw)
        last_fid = fid
        v, i = _read_value(b, i, typ)
        fields[fid] = v


# --------------------------------------------------------------------------
# parquet.thrift interpretation (the subset the audit surfaces).
# --------------------------------------------------------------------------

_CODECS = {
    0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
    4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW",
}
_TYPES = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
    4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}


def _uint_field(
    container: dict, key: int, what: str, default: int | None = None
) -> int:
    """Fetch a thrift field the page walkers do arithmetic on,
    enforcing the parse_parquet_footer discipline: a structurally-valid
    thrift footer of the wrong SHAPE (missing/boolean/negative/non-int
    field) must fail as ValueError, never TypeError."""
    v = container.get(key, default)
    if not isinstance(v, int) or isinstance(v, bool) or v < 0:
        raise ValueError(f"malformed {what}")
    return v


def parse_parquet_footer(b: bytes) -> list[dict[str, object]]:
    """One row per (row_group, column chunk): row-group shape, column
    path, codec, value/byte counts, data page offset, and statistics
    (null_count always; min/max decoded for INT64 columns). Raises
    ValueError on anything that is not an intact parquet file."""
    if len(b) < 12 or b[:4] != b"PAR1" or b[-4:] != b"PAR1":
        raise ValueError("not a parquet file (missing PAR1 magic)")
    (meta_len,) = struct.unpack("<I", b[-8:-4])
    start = len(b) - 8 - meta_len
    if start < 4:
        raise ValueError("parquet footer length out of bounds")
    meta, _ = _read_struct(b, start)
    # A corrupt footer can still be VALID thrift of the wrong shape
    # (the generic layer parses any well-formed bytes) — every shape
    # assumption below must fail as ValueError, never AttributeError.
    row_groups = meta.get(4, [])
    if not isinstance(row_groups, list):
        raise ValueError("malformed FileMetaData.row_groups")
    rows: list[dict[str, object]] = []
    for rg_idx, rg in enumerate(row_groups):
        if not isinstance(rg, dict):
            raise ValueError("malformed RowGroup")
        rg_rows = rg.get(3)
        chunks = rg.get(1, [])
        if not isinstance(chunks, list):
            raise ValueError("malformed RowGroup.columns")
        for col_idx, chunk in enumerate(chunks):
            if not isinstance(chunk, dict):
                raise ValueError("malformed ColumnChunk")
            md = chunk.get(3)
            if not isinstance(md, dict):
                raise ValueError("column chunk without metadata")
            segs = md.get(3, [])
            if not isinstance(segs, list) or not all(
                isinstance(p, bytes) for p in segs
            ):
                raise ValueError("malformed path_in_schema")
            try:
                path = ".".join(p.decode("utf-8") for p in segs)
            except UnicodeDecodeError as e:
                raise ValueError("non-UTF8 path_in_schema") from e
            if not isinstance(md.get(1), (int, bool, type(None))) or not isinstance(
                md.get(4), (int, bool, type(None))
            ):
                raise ValueError("malformed type/codec enum")
            ptype = _TYPES.get(md.get(1), "?")
            stats = md.get(12, {})
            if not isinstance(stats, dict):
                raise ValueError("malformed Statistics")
            null_count = stats.get(3)
            if null_count is not None and not isinstance(null_count, int):
                raise ValueError("malformed Statistics.null_count")
            id_min = id_max = None
            if ptype == "INT64" and 6 in stats and 5 in stats:
                if not (
                    isinstance(stats[5], bytes)
                    and isinstance(stats[6], bytes)
                    and len(stats[5]) == 8
                    and len(stats[6]) == 8
                ):
                    raise ValueError("malformed INT64 statistics bounds")
                id_min = struct.unpack("<q", stats[6])[0]
                id_max = struct.unpack("<q", stats[5])[0]
            rows.append(
                {
                    "rg": rg_idx,
                    "rg_rows": rg_rows,
                    "col": col_idx,
                    "path": path,
                    "codec": _CODECS.get(md.get(4), "?"),
                    "num_values": md.get(5),
                    "comp_bytes": md.get(7),
                    "uncomp_bytes": md.get(6),
                    "data_off": md.get(9),
                    "null_count": null_count,
                    "id_min": id_min,
                    "id_max": id_max,
                }
            )
    return rows


# --------------------------------------------------------------------------
# Data-page decode: from-scratch Snappy + PLAIN values. The footer tells
# us WHERE the values are; this layer reads them — the full raw-bytes
# read path for a required flat INT64 column, no parquet library.
# --------------------------------------------------------------------------


def snappy_decompress(b: bytes) -> bytes:
    """Snappy block format (google/snappy format_description.txt):
    varint uncompressed length, then literal/copy tagged elements.
    Raises ValueError on any malformed stream."""
    n, i = _varint(b, 0)
    out = bytearray()
    while i < len(b):
        tag = b[i]
        i += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                if i + nbytes > len(b):
                    raise ValueError("truncated snappy literal length")
                ln = int.from_bytes(b[i : i + nbytes], "little")
                i += nbytes
            ln += 1
            if i + ln > len(b):
                raise ValueError("truncated snappy literal")
            out += b[i : i + ln]
            i += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x07) + 4
            if i >= len(b):
                raise ValueError("truncated snappy copy-1")
            off = ((tag >> 5) << 8) | b[i]
            i += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if i + 2 > len(b):
                raise ValueError("truncated snappy copy-2")
            off = int.from_bytes(b[i : i + 2], "little")
            i += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if i + 4 > len(b):
                raise ValueError("truncated snappy copy-4")
            off = int.from_bytes(b[i : i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy copy offset out of range")
        # overlapping copies are the RLE idiom: copy byte-by-byte
        for _ in range(ln):
            out.append(out[-off])
    if len(out) != n:
        raise ValueError("snappy length mismatch")
    return bytes(out)


def read_int64_column(b: bytes, path: str) -> list[int]:
    """Every value of the REQUIRED flat INT64 column `path`, in row
    order across row groups, decoded from raw bytes: footer -> chunk
    offsets -> per-page thrift PageHeader -> (snappy|raw) PLAIN i64s.
    Raises ValueError on unsupported shapes (nullable columns carry
    definition levels; dictionary-encoded chunks carry dict pages)."""
    if len(b) < 12 or b[:4] != b"PAR1" or b[-4:] != b"PAR1":
        raise ValueError("not a parquet file (missing PAR1 magic)")
    (meta_len,) = struct.unpack("<I", b[-8:-4])
    start = len(b) - 8 - meta_len
    if start < 4:
        raise ValueError("parquet footer length out of bounds")
    meta, _ = _read_struct(b, start)
    values: list[int] = []
    for rg in meta.get(4, []):
        for chunk in rg.get(1, []):
            md = chunk.get(3, {})
            if ".".join(p.decode() for p in md.get(3, [])) != path:
                continue
            if _TYPES.get(md.get(1)) != "INT64":
                raise ValueError("page decode supports INT64 only")
            codec = _CODECS.get(md.get(4))
            if codec not in ("SNAPPY", "UNCOMPRESSED"):
                raise ValueError(f"unsupported page codec {codec}")
            need = _uint_field(md, 5, "chunk num_values")
            pos = _uint_field(md, 9, "data_page_offset")
            got = 0
            while got < need:
                header, data_start = _read_struct(b, pos)
                ptype = header.get(1)
                if ptype != 0:
                    raise ValueError(f"unsupported page type {ptype}")
                comp_size = _uint_field(header, 3, "page compressed size")
                dph = header.get(5)
                if not isinstance(dph, dict):
                    raise ValueError("missing data page header")
                n_vals = _uint_field(dph, 1, "page num_values")
                if dph.get(2) != 0:  # Encoding.PLAIN
                    raise ValueError("page decode supports PLAIN only")
                raw = b[data_start : data_start + comp_size]
                if len(raw) != comp_size:
                    raise ValueError("truncated page data")
                if codec == "SNAPPY":
                    raw = snappy_decompress(raw)
                if len(raw) != header.get(2):
                    raise ValueError("page uncompressed-size mismatch")
                if len(raw) != 8 * n_vals:
                    raise ValueError(
                        "PLAIN INT64 page size disagrees with value count"
                        " (nullable columns carry definition levels —"
                        " unsupported here)"
                    )
                values.extend(
                    struct.unpack(f"<{n_vals}q", raw)
                )
                got += n_vals
                pos = data_start + comp_size
            if got != need:
                raise ValueError("page walk value count mismatch")
    return values


def _rle_bp_hybrid(
    data: bytes, pos: int, bit_width: int, count: int
) -> tuple[list[int], int]:
    """Parquet's RLE/bit-packed hybrid (Encodings.md): varint header,
    LSB even = RLE run (value in ceil(bw/8) LE bytes), odd = bit-packed
    groups of 8 values, LSB-first. Returns exactly `count` values."""
    out: list[int] = []
    mask = (1 << bit_width) - 1
    while len(out) < count:
        h, pos = _varint(data, pos)
        if h & 1:
            groups = h >> 1
            nbytes = groups * bit_width
            if pos + nbytes > len(data):
                raise ValueError("truncated bit-packed run")
            bits = int.from_bytes(data[pos : pos + nbytes], "little")
            out.extend(
                (bits >> (k * bit_width)) & mask for k in range(groups * 8)
            )
            pos += nbytes
        else:
            run = h >> 1
            vb = (bit_width + 7) // 8
            if pos + vb > len(data):
                raise ValueError("truncated RLE run value")
            val = int.from_bytes(data[pos : pos + vb], "little")
            pos += vb
            out.extend([val] * run)
        if h == 0 and not out:
            raise ValueError("zero-length hybrid run")
    return out[:count], pos


def _schema_optional(meta: dict, path: str) -> bool:
    """True when the flat column `path` is OPTIONAL (carries definition
    levels), per the footer's SchemaElement list."""
    for el in meta.get(2, []):
        if isinstance(el, dict) and el.get(4) == path.encode():
            return el.get(3) == 1
    raise ValueError(f"column {path!r} not in parquet schema")


def read_dict_column(b: bytes, path: str) -> list:
    """Every value of the flat dictionary-encoded column `path`
    (INT64 or BYTE_ARRAY), in row order across row groups, None for
    nulls: dictionary page (PLAIN) + RLE_DICTIONARY index pages +
    RLE/bit-packed definition levels, all decoded from raw bytes."""
    if len(b) < 12 or b[:4] != b"PAR1" or b[-4:] != b"PAR1":
        raise ValueError("not a parquet file (missing PAR1 magic)")
    (meta_len,) = struct.unpack("<I", b[-8:-4])
    start = len(b) - 8 - meta_len
    if start < 4:
        raise ValueError("parquet footer length out of bounds")
    meta, _ = _read_struct(b, start)
    optional = _schema_optional(meta, path)
    values: list = []
    for rg in meta.get(4, []):
        for chunk in rg.get(1, []):
            md = chunk.get(3, {})
            if ".".join(p.decode() for p in md.get(3, [])) != path:
                continue
            ptype = _TYPES.get(md.get(1))
            if ptype not in ("INT64", "BYTE_ARRAY"):
                raise ValueError(f"dict decode unsupported for {ptype}")
            codec = _CODECS.get(md.get(4))
            if codec not in ("SNAPPY", "UNCOMPRESSED"):
                raise ValueError(f"unsupported page codec {codec}")

            def _page(pos: int) -> tuple[dict, bytes, int]:
                header, data_start = _read_struct(b, pos)
                comp = _uint_field(header, 3, "page compressed size")
                raw = b[data_start : data_start + comp]
                if len(raw) != comp:
                    raise ValueError("truncated page data")
                if codec == "SNAPPY":
                    raw = snappy_decompress(raw)
                if len(raw) != header.get(2):
                    raise ValueError("page uncompressed-size mismatch")
                return header, raw, data_start + comp

            if md.get(11) is None:
                raise ValueError("chunk has no dictionary page")
            dict_off = _uint_field(md, 11, "dictionary_page_offset")
            dh, draw, _ = _page(dict_off)
            if dh.get(1) != 2:
                raise ValueError("expected a dictionary page")
            dph0 = dh.get(7)
            if not isinstance(dph0, dict):
                raise ValueError("missing dictionary page header")
            dct_n = _uint_field(dph0, 1, "dictionary num_values")
            dictionary: list = []
            p = 0
            if ptype == "INT64":
                if len(draw) != 8 * dct_n:
                    raise ValueError("dictionary size mismatch")
                dictionary = list(struct.unpack(f"<{dct_n}q", draw))
            else:
                for _ in range(dct_n):
                    if p + 4 > len(draw):
                        raise ValueError("truncated BYTE_ARRAY dictionary")
                    ln = struct.unpack("<I", draw[p : p + 4])[0]
                    p += 4
                    if p + ln > len(draw):
                        raise ValueError("truncated BYTE_ARRAY dictionary")
                    dictionary.append(draw[p : p + ln].decode("utf-8"))
                    p += ln

            need = _uint_field(md, 5, "chunk num_values")
            pos = _uint_field(md, 9, "data_page_offset")
            got = 0
            while got < need:
                header, raw, nxt = _page(pos)
                if header.get(1) != 0:
                    raise ValueError(f"unsupported page type {header.get(1)}")
                dph = header.get(5)
                if not isinstance(dph, dict):
                    raise ValueError("missing data page header")
                n_vals = _uint_field(dph, 1, "page num_values")
                if dph.get(2) not in (2, 8):  # PLAIN_DICTIONARY / RLE_DICT
                    raise ValueError("expected a dictionary-indexed page")
                p = 0
                if optional:
                    if p + 4 > len(raw):
                        raise ValueError("truncated definition levels")
                    dl_len = struct.unpack("<I", raw[:4])[0]
                    defs, _end = _rle_bp_hybrid(raw[: 4 + dl_len], 4, 1, n_vals)
                    p = 4 + dl_len
                else:
                    defs = [1] * n_vals
                if p >= len(raw):
                    raise ValueError("truncated index section")
                bw = raw[p]
                n_present = sum(defs)
                idxs, _ = _rle_bp_hybrid(raw, p + 1, bw, n_present)
                it = iter(idxs)
                for dlev in defs:
                    if dlev:
                        ix = next(it)
                        if ix >= len(dictionary):
                            raise ValueError("dictionary index out of range")
                        values.append(dictionary[ix])
                    else:
                        values.append(None)
                got += n_vals
                pos = nxt
            if got != need:
                raise ValueError("page walk value count mismatch")
    return values


def _delta_binary_packed(raw: bytes, pos: int = 0) -> list[int]:
    """DELTA_BINARY_PACKED (Encodings.md): varint block size /
    miniblocks-per-block / total count / zigzag first value; per block
    a zigzag min-delta, one bit-width byte per miniblock, then
    LSB-first bit-packed deltas (value = min_delta + packed). Trailing
    miniblocks may be omitted once the count is satisfied."""
    block_size, pos = _varint(raw, pos)
    n_mini, pos = _varint(raw, pos)
    total, pos = _varint(raw, pos)
    if n_mini == 0 or block_size % n_mini:
        raise ValueError("malformed delta header")
    vpm = block_size // n_mini
    if vpm % 8:
        raise ValueError("delta miniblock size not a multiple of 8")
    first_raw, pos = _varint(raw, pos)
    out = [_zigzag(first_raw)]
    while len(out) < total:
        md_raw, pos = _varint(raw, pos)
        min_delta = _zigzag(md_raw)
        if pos + n_mini > len(raw):
            raise ValueError("truncated delta miniblock widths")
        widths = raw[pos : pos + n_mini]
        pos += n_mini
        for w in widths:
            if len(out) >= total:
                break
            nbytes = vpm * w // 8
            if pos + nbytes > len(raw):
                raise ValueError("truncated delta miniblock data")
            bits = int.from_bytes(raw[pos : pos + nbytes], "little")
            pos += nbytes
            mask = (1 << w) - 1
            take = min(vpm, total - len(out))
            for k in range(take):
                packed = (bits >> (k * w)) & mask if w else 0
                out.append(out[-1] + min_delta + packed)
    return out[:total]


def read_delta_column(b: bytes, path: str) -> list[int]:
    """Every value of the REQUIRED flat INT64 DELTA_BINARY_PACKED
    column `path` across row groups, from raw bytes — v2 data pages
    (separate uncompressed level sections, is_compressed flag)."""
    if len(b) < 12 or b[:4] != b"PAR1" or b[-4:] != b"PAR1":
        raise ValueError("not a parquet file (missing PAR1 magic)")
    (meta_len,) = struct.unpack("<I", b[-8:-4])
    start = len(b) - 8 - meta_len
    if start < 4:
        raise ValueError("parquet footer length out of bounds")
    meta, _ = _read_struct(b, start)
    values: list[int] = []
    for rg in meta.get(4, []):
        for chunk in rg.get(1, []):
            md = chunk.get(3, {})
            if ".".join(p.decode() for p in md.get(3, [])) != path:
                continue
            if _TYPES.get(md.get(1)) != "INT64":
                raise ValueError("delta decode supports INT64 only")
            codec = _CODECS.get(md.get(4))
            if codec not in ("SNAPPY", "UNCOMPRESSED"):
                raise ValueError(f"unsupported page codec {codec}")
            need = _uint_field(md, 5, "chunk num_values")
            pos = _uint_field(md, 9, "data_page_offset")
            got = 0
            while got < need:
                header, data_start = _read_struct(b, pos)
                comp_size = _uint_field(header, 3, "page compressed size")
                v2 = header.get(8)
                if header.get(1) != 3 or not isinstance(v2, dict):
                    raise ValueError("expected a v2 data page")
                n_vals = _uint_field(v2, 1, "page num_values")
                if v2.get(4) != 5:  # Encoding.DELTA_BINARY_PACKED
                    raise ValueError("expected DELTA_BINARY_PACKED encoding")
                dl_len = _uint_field(v2, 5, "def-level length", default=0)
                rl_len = _uint_field(v2, 6, "rep-level length", default=0)
                if v2.get(2):
                    raise ValueError("nullable delta columns unsupported")
                levels = rl_len + dl_len  # stored UNcompressed in v2
                raw = b[data_start + levels : data_start + comp_size]
                if len(raw) != comp_size - levels:
                    raise ValueError("truncated page data")
                if codec == "SNAPPY" and v2.get(7, True):
                    raw = snappy_decompress(raw)
                vals = _delta_binary_packed(raw)
                if len(vals) != n_vals:
                    raise ValueError("delta value count mismatch")
                values.extend(vals)
                got += n_vals
                pos = data_start + comp_size
            if got != need:
                raise ValueError("page walk value count mismatch")
    return values


def parquet_footer_rows(files: DataFrame) -> DataFrame:
    """Arrow-batched footer parse over a binaryFile frame (path,
    content) -> one row per row-group column chunk."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "file_name", "rg", "rg_rows", "col", "path", "codec",
            "num_values", "comp_bytes", "uncomp_bytes", "data_off",
            "null_count", "id_min", "id_max",
        ]
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for p, content in zip(pdf["path"], pdf["content"]):
                for r in parse_parquet_footer(bytes(content)):
                    out["file_name"].append(os.path.basename(str(p)))
                    for c in cols[1:]:
                        out[c].append(r[c])
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(
        gen,
        schema=(
            "file_name string, rg bigint, rg_rows bigint, col bigint, "
            "path string, codec string, num_values bigint, "
            "comp_bytes bigint, uncomp_bytes bigint, data_off bigint, "
            "null_count bigint, id_min bigint, id_max bigint"
        ),
    )
