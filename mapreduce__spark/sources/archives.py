"""Archive-container ingest: WARC web-crawl records and ZIP members.

The two container formats a large-scale training-data pipeline actually
receives corpora in — Common-Crawl-style WARC files (the canonical LLM
web-text source) and ZIP archives of documents — parsed from raw bytes
with no format library, the multimodal-decode conventions applied to
SOURCES (reference parity: the reference's ingest is a directory scan,
`Search.cpp:183-205`; container parsing is tier-2 engine-extension
surface like the rest of O-3's format matrix).

Both parsers follow the decode-family rules established in
operators/multimodal.py:

* payloads are synthesized per doc_id by a pure law, so a DuckDB oracle
  can regenerate every expected row — including the extracted TEXT,
  pinned cross-engine by the repo's shared char-fold hash mod 2^31-1
  (the content_defined_chunking convention);
* every malformed input raises the documented ValueError (never a
  struct.error or a silent partial parse), per-byte truncation-gated in
  tests/test_round11_properties.py;
* Arrow-batched mapInPandas, one corpus scan, payload bytes never
  shuffle — output rows are the narrow extracted metadata + text hash.

WARC hazards baked into the fixtures (the ones that break naive
split-on-"WARC/1.0" parsers): record payloads CONTAINING the literal
"WARC/1.0" version line (warcinfo always, response bodies on a law
cadence) — only Content-Length-driven framing survives; warcinfo and
request records interleaved with the responses (type filtering);
header-name case varying by record parity; header ORDER varying
(Content-Length first vs last).

ZIP hazards: a non-empty end-of-central-directory comment (the EOCD
must be found by a backwards signature scan, not at a fixed offset);
LOCAL extra fields that differ from the central directory's (member
data must be located through the local header's own lengths); stored
and raw-DEFLATE members interleaved; CRC32 verified over the inflated
bytes.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

CHARFOLD_MOD = 2147483647  # the shared cross-engine token-hash modulus


def charfold_hash(text: str) -> int:
    """h = fold(h*31 + ord(ch)) mod 2^31-1 — bit-equal to the DuckDB
    list_reduce fold and the Spark-side _charfold column (qsketch.py)."""
    h = 0
    for ch in text:
        h = (h * 31 + ord(ch)) % CHARFOLD_MOD
    return h


# --------------------------------------------------------------------------
# WARC (ISO 28500): WARC/1.0 records with CRLF header blocks, payload
# framed by Content-Length, two CRLFs of record separation.
# --------------------------------------------------------------------------


def _warc_body_law(d: int, i: int) -> str:
    """Response-body text law — SQL-reconstructible (repeat/concat of
    integer casts only)."""
    k = (d + i) % 4 + 1
    body = f"doc {d} rec {i} " + f"tok{(d * 7 + i) % 13} " * k
    if (d + i) % 3 == 0:
        # the framing hazard: a body that CONTAINS the version line
        body += "WARC/1.0 lookalike"
    return body


def synth_warc_bytes(doc_id: int) -> bytes:
    """Deterministic WARC file: one warcinfo record (whose payload embeds
    a fake record header — split-based parsing dies here), `d%3 + 2`
    response records with law-generated HTTP payloads, and request
    records interleaved on odd doc_ids. Header case and order vary by
    record parity."""
    d = doc_id
    out = bytearray()

    def record(rtype: str, uri: str | None, payload: bytes, j: int) -> None:
        heads = [("WARC-Type", rtype)]
        if uri is not None:
            heads.append(("WARC-Target-URI", uri))
        heads.append(("WARC-Record-ID", f"<urn:uuid:{d}-{rtype}-{j}>"))
        cl = ("Content-Length", str(len(payload)))
        heads = [cl] + heads if j % 2 == 0 else heads + [cl]
        out.extend(b"WARC/1.0\r\n")
        for name, val in heads:
            name = name.lower() if j % 2 == 1 else name
            out.extend(f"{name}: {val}\r\n".encode())
        out.extend(b"\r\n")
        out.extend(payload)
        out.extend(b"\r\n\r\n")

    record(
        "warcinfo",
        None,
        b"software: synth\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n",
        0,
    )
    n = d % 3 + 2
    for i in range(n):
        uri = f"http://site-{d % 7}.example/doc/{d}/{i}"
        if d % 2 == 1:
            record("request", uri, f"GET /doc/{d}/{i} HTTP/1.1\r\n".encode(), i)
        status = 200 if (d + i) % 5 else 404
        body = _warc_body_law(d, i)
        http = (
            f"HTTP/1.1 {status} X\r\n"
            "Content-Type: text/html\r\n"
            "\r\n"
        ).encode() + body.encode()
        record("response", uri, http, i)
    return bytes(out)


def parse_warc_records(b: bytes) -> list[tuple[int, str, int, int, int]]:
    """Walk a WARC file by Content-Length framing; for each response
    record return (rec, uri, status, body_chars, body_hash) where rec
    numbers responses 0.. in file order and body is the HTTP payload
    past its header block. Raises ValueError on any malformed input."""
    pos = 0
    rec = 0
    rows: list[tuple[int, str, int, int, int]] = []
    while pos < len(b):
        if b[pos : pos + 10] != b"WARC/1.0\r\n":
            raise ValueError("bad WARC version line")
        pos += 10
        headers: dict[str, str] = {}
        while True:
            end = b.find(b"\r\n", pos)
            if end < 0:
                raise ValueError("truncated WARC header block")
            line = b[pos:end]
            pos = end + 2
            if not line:
                break
            sep = line.find(b":")
            if sep <= 0:
                raise ValueError("malformed WARC header line")
            headers[line[:sep].decode("ascii").strip().lower()] = (
                line[sep + 1 :].decode("ascii").strip()
            )
        if "content-length" not in headers:
            raise ValueError("WARC record without Content-Length")
        # ASCII digits only: a negative length would rewind the cursor
        # (re-parsing the same record forever), and int() also accepts
        # forms like '+5' or '1_2' that no conformant writer emits.
        if not headers["content-length"].isdigit():
            raise ValueError("non-numeric WARC Content-Length")
        ln = int(headers["content-length"])
        if pos + ln + 4 > len(b):
            raise ValueError("truncated WARC payload")
        payload = b[pos : pos + ln]
        pos += ln
        if b[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record separator")
        pos += 4
        if headers.get("warc-type") == "response":
            uri = headers.get("warc-target-uri")
            if uri is None:
                raise ValueError("response record without target URI")
            split = payload.find(b"\r\n\r\n")
            if split < 0:
                raise ValueError("HTTP payload without header terminator")
            status_line = payload[:split].split(b"\r\n", 1)[0]
            parts = status_line.split(b" ")
            if len(parts) < 2 or not parts[1].isdigit():
                raise ValueError("malformed HTTP status line")
            body = payload[split + 4 :].decode("ascii")
            rows.append(
                (rec, uri, int(parts[1]), len(body), charfold_hash(body))
            )
            rec += 1
    return rows


def with_warc_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with synthesized WARC container bytes."""
    from mapreduce__spark.operators.multimodal import _with_payload

    return _with_payload(docs, synth_warc_bytes)


def warc_response_records(mm: DataFrame) -> DataFrame:
    """Arrow-batched WARC parse: one row per response record."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "rec": [], "uri": [],
                "status": [], "body_chars": [], "body_hash": [],
            }
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                for rec, uri, status, nch, h in parse_warc_records(
                    bytes(payload)
                ):
                    out["doc_id"].append(int(i))
                    out["rec"].append(rec)
                    out["uri"].append(uri)
                    out["status"].append(status)
                    out["body_chars"].append(nch)
                    out["body_hash"].append(h)
            yield pd.DataFrame(out)

    return mm.select("doc_id", "payload").mapInPandas(
        gen,
        schema=(
            "doc_id bigint, rec bigint, uri string, status bigint, "
            "body_chars bigint, body_hash bigint"
        ),
    )


# --------------------------------------------------------------------------
# ZIP (APPNOTE 4.5 subset): local file headers + central directory +
# EOCD, methods 0 (stored) and 8 (raw DEFLATE).
# --------------------------------------------------------------------------


def _zip_member_law(d: int, i: int) -> tuple[str, str, int]:
    """(name, text, method) for member i of doc d — SQL-reconstructible."""
    name = f"part-{d}-{i}.txt"
    text = f"zip {d} member {i} " + "ab " * ((d + i) % 5 + 1)
    method = 0 if (d + i) % 2 == 0 else 8
    return name, text, method


def synth_zip_bytes(doc_id: int) -> bytes:
    """Deterministic ZIP with `d%3 + 2` members mixing stored and
    DEFLATE, a LOCAL-only extra field on odd members, and a non-empty
    EOCD comment (backwards-scan hazard)."""
    d = doc_id
    n = d % 3 + 2
    out = bytearray()
    central = bytearray()
    for i in range(n):
        name, text, method = _zip_member_law(d, i)
        raw = text.encode("ascii")
        crc = zlib.crc32(raw) & 0xFFFFFFFF
        if method == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(raw) + co.flush()
        else:
            data = raw
        extra = b"\xaa\xbb\x02\x00\xcd\xcd" if i % 2 == 1 else b""
        offset = len(out)
        out += struct.pack(
            "<IHHHHHIIIHH",
            0x04034B50, 20, 0, method, 0, 0x21,
            crc, len(data), len(raw), len(name), len(extra),
        )
        out += name.encode("ascii") + extra + data
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII",
            0x02014B50, 20, 20, 0, method, 0, 0x21,
            crc, len(data), len(raw), len(name), 0, 0, 0, 0, 0, offset,
        )
        central += name.encode("ascii")
    cd_off = len(out)
    out += central
    comment = f"zip {d}".encode()
    out += struct.pack(
        "<IHHHHIIH", 0x06054B50, 0, 0, n, n, len(central), cd_off,
        len(comment),
    )
    out += comment
    return bytes(out)


def parse_zip_members(b: bytes) -> list[tuple[str, int, int, bool, int]]:
    """Walk the central directory (EOCD located by backwards signature
    scan); for each member extract through its LOCAL header, inflate
    method-8 data, verify CRC32, and return (name, method, usize,
    crc_ok, text_hash). Raises ValueError on any malformed input."""
    # Scan backwards for an EOCD whose comment-length field accounts for
    # exactly the bytes that follow it — a bare rfind would lock onto a
    # PK\x05\x06 byte string sitting inside the archive comment.
    eocd = b.rfind(b"\x50\x4b\x05\x06")
    while eocd >= 0:
        if eocd + 22 <= len(b):
            clen = struct.unpack("<H", b[eocd + 20 : eocd + 22])[0]
            if eocd + 22 + clen == len(b):
                break
        eocd = b.rfind(b"\x50\x4b\x05\x06", 0, eocd)
    if eocd < 0:
        raise ValueError("no ZIP end-of-central-directory")
    (_sig, _dn, _cdn, _count, total, cd_size, cd_off, _clen) = struct.unpack(
        "<IHHHHIIH", b[eocd : eocd + 22]
    )
    if cd_off + cd_size > eocd:
        raise ValueError("ZIP central directory out of bounds")
    rows: list[tuple[str, int, int, bool, int]] = []
    pos = cd_off
    for _ in range(total):
        if pos + 46 > len(b) or b[pos : pos + 4] != b"\x50\x4b\x01\x02":
            raise ValueError("bad ZIP central-directory entry")
        (
            _sig, _vm, _vn, _flags, method, _time, _date, crc, csize, usize,
            nlen, xlen, clen, _dstart, _iattr, _eattr, loc_off,
        ) = struct.unpack("<IHHHHHHIIIHHHHHII", b[pos : pos + 46])
        name = b[pos + 46 : pos + 46 + nlen].decode("ascii")
        pos += 46 + nlen + xlen + clen
        if loc_off + 30 > len(b) or b[loc_off : loc_off + 4] != b"\x50\x4b\x03\x04":
            raise ValueError("bad ZIP local header")
        (_lsig, _lv, _lf, lmethod, _lt, _ld, _lcrc, lcsize, _lusize,
         lnlen, lxlen) = struct.unpack("<IHHHHHIIIHH", b[loc_off : loc_off + 30])
        if lmethod != method:
            raise ValueError("ZIP local/central method mismatch")
        start = loc_off + 30 + lnlen + lxlen
        if start + csize > len(b):
            raise ValueError("truncated ZIP member data")
        data = b[start : start + csize]
        if method == 0:
            raw = data
        elif method == 8:
            try:
                raw = zlib.decompress(data, -15)
            except zlib.error as e:
                raise ValueError(f"bad DEFLATE member: {e}") from e
        else:
            raise ValueError(f"unsupported ZIP method {method}")
        if len(raw) != usize:
            raise ValueError("ZIP member size mismatch")
        crc_ok = (zlib.crc32(raw) & 0xFFFFFFFF) == crc
        rows.append(
            (name, method, usize, crc_ok, charfold_hash(raw.decode("ascii")))
        )
    return rows


# --------------------------------------------------------------------------
# tar.gz (POSIX ustar in RFC 1952 gzip): the third container corpora
# actually ship in — research datasets and academic corpora are tarballs.
# The gzip layer is parsed from raw bytes (optional-field walking, header
# CRC16, trailer CRC32 + ISIZE, multi-member streams); only the DEFLATE
# bitstream itself uses stdlib zlib (wbits=-15, the ZIP/PNG convention).
# --------------------------------------------------------------------------


def _tgz_member_law(d: int, i: int) -> tuple[str, str]:
    """(name, text) for regular-file entry i of doc d —
    SQL-reconstructible (concat/repeat of integer casts only)."""
    name = f"corpus/doc-{d}/part-{i}.txt"
    text = f"tar {d} entry {i} " + "xy " * ((d * 3 + i) % 6 + 1)
    return name, text


def _tar_header(name: str, size: int, typeflag: bytes, mtime: int) -> bytes:
    """One 512-byte ustar header with a verified checksum field."""
    h = bytearray(512)
    nb = name.encode("ascii")
    h[0 : len(nb)] = nb
    h[100:108] = b"0000644\x00" if typeflag == b"0" else b"0000755\x00"
    h[108:116] = b"0000000\x00"
    h[116:124] = b"0000000\x00"
    h[124:136] = f"{size:011o}".encode() + b"\x00"
    h[136:148] = f"{mtime:011o}".encode() + b"\x00"
    h[148:156] = b" " * 8  # checksum field counts as spaces
    h[156:157] = typeflag
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = f"{chk:06o}".encode() + b"\x00 "
    return bytes(h)


def _gzip_wrap(raw: bytes, d: int, j: int) -> bytes:
    """One complete gzip member over `raw` with law-driven optional
    header fields: FEXTRA on odd docs, FNAME always, FCOMMENT on
    d%3==0, FHCRC on (d+j)%5==2 — so naive fixed-offset header skipping
    dies and the CRC16 path is exercised."""
    flg = 0x08  # FNAME
    extra = b""
    if d % 2 == 1:
        xf = b"SY\x04\x00tar!"  # subfield id 'SY', len 4
        extra = struct.pack("<H", len(xf)) + xf
        flg |= 0x04
    comment = f"doc {d} member {j}".encode() if d % 3 == 0 else b""
    if comment:
        flg |= 0x10
    fhcrc = (d + j) % 5 == 2
    if fhcrc:
        flg |= 0x02
    head = bytearray(struct.pack("<BBBBIBB", 0x1F, 0x8B, 8, flg, d, 0, 255))
    head += extra
    head += f"doc-{d}-{j}.tar".encode() + b"\x00"
    if comment:
        head += comment + b"\x00"
    if fhcrc:
        head += struct.pack("<H", zlib.crc32(bytes(head)) & 0xFFFF)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = co.compress(raw) + co.flush()
    trailer = struct.pack(
        "<II", zlib.crc32(raw) & 0xFFFFFFFF, len(raw) & 0xFFFFFFFF
    )
    return bytes(head) + body + trailer


def synth_targz_bytes(doc_id: int) -> bytes:
    """Deterministic tarball: one directory entry plus `d%3 + 2` law
    files, ustar checksums valid, two terminating zero blocks; gzipped
    with law-varying optional header fields. On d%4==0 the tar is split
    at a 512 boundary into TWO concatenated gzip members (RFC 1952
    multi-member hazard — single-shot `zlib.decompress` dies here)."""
    d = doc_id
    tar = bytearray()
    tar += _tar_header(f"corpus/doc-{d}/", 0, b"5", d)
    for i in range(d % 3 + 2):
        name, text = _tgz_member_law(d, i)
        raw = text.encode("ascii")
        tar += _tar_header(name, len(raw), b"0", d + i)
        tar += raw
        if len(raw) % 512:
            tar += b"\x00" * (512 - len(raw) % 512)
    tar += b"\x00" * 1024
    if d % 4 == 0:
        split = (len(tar) // 1024) * 512  # a mid-archive block boundary
        return _gzip_wrap(bytes(tar[:split]), d, 0) + _gzip_wrap(
            bytes(tar[split:]), d, 1
        )
    return _gzip_wrap(bytes(tar), d, 0)


def _gunzip_members(b: bytes) -> bytes:
    """Concatenate the decompressed payloads of every gzip member in
    `b`, walking optional header fields and verifying FHCRC, trailer
    CRC32 and ISIZE per member. Raises ValueError on any malformation."""
    out = bytearray()
    pos = 0
    while pos < len(b):
        start = pos
        if pos + 10 > len(b):
            raise ValueError("truncated gzip header")
        magic1, magic2, cm, flg, _mtime, _xfl, _os_ = struct.unpack(
            "<BBBBIBB", b[pos : pos + 10]
        )
        if (magic1, magic2) != (0x1F, 0x8B):
            raise ValueError("bad gzip magic")
        if cm != 8:
            raise ValueError(f"unsupported gzip method {cm}")
        if flg & 0xE0:
            raise ValueError("reserved gzip FLG bits set")
        pos += 10
        if flg & 0x04:  # FEXTRA
            if pos + 2 > len(b):
                raise ValueError("truncated gzip FEXTRA length")
            (xlen,) = struct.unpack("<H", b[pos : pos + 2])
            pos += 2
            if pos + xlen > len(b):
                raise ValueError("truncated gzip FEXTRA data")
            pos += xlen
        for bit in (0x08, 0x10):  # FNAME, FCOMMENT: NUL-terminated
            if flg & bit:
                end = b.find(b"\x00", pos)
                if end < 0:
                    raise ValueError("unterminated gzip header string")
                pos = end + 1
        if flg & 0x02:  # FHCRC
            if pos + 2 > len(b):
                raise ValueError("truncated gzip FHCRC")
            (hc,) = struct.unpack("<H", b[pos : pos + 2])
            if hc != (zlib.crc32(b[start:pos]) & 0xFFFF):
                raise ValueError("gzip header CRC16 mismatch")
            pos += 2
        do = zlib.decompressobj(-15)
        try:
            raw = do.decompress(b[pos:])
        except zlib.error as e:
            raise ValueError(f"bad gzip DEFLATE stream: {e}") from e
        if not do.eof:
            raise ValueError("truncated gzip DEFLATE stream")
        tail = do.unused_data
        if len(tail) < 8:
            raise ValueError("truncated gzip trailer")
        crc, isize = struct.unpack("<II", tail[:8])
        if crc != (zlib.crc32(raw) & 0xFFFFFFFF):
            raise ValueError("gzip CRC32 mismatch")
        if isize != (len(raw) & 0xFFFFFFFF):
            raise ValueError("gzip ISIZE mismatch")
        out += raw
        pos = len(b) - len(tail) + 8
    return bytes(out)


def _tar_octal(field: bytes, what: str) -> int:
    """Parse a NUL/space-terminated octal tar numeric field."""
    s = field.rstrip(b"\x00 ").lstrip(b" ")
    if not s or any(c < 0x30 or c > 0x37 for c in s):
        raise ValueError(f"bad tar octal field: {what}")
    return int(s, 8)


def parse_targz_members(b: bytes) -> list[tuple[str, int, int]]:
    """Gunzip (multi-member aware) then walk the tar: verify each ustar
    magic and header checksum, parse octal sizes, skip directory
    entries and 512-padding, stop at the two terminating zero blocks.
    Returns (name, usize, text_hash) per regular file. Raises
    ValueError on any malformed byte stream."""
    tar = _gunzip_members(b)
    rows: list[tuple[str, int, int]] = []
    pos = 0
    while True:
        if pos + 512 > len(tar):
            raise ValueError("truncated tar header block")
        h = tar[pos : pos + 512]
        if h == b"\x00" * 512:
            if tar[pos + 512 : pos + 1024] != b"\x00" * 512:
                raise ValueError("missing second tar terminator block")
            break
        if h[257:263] != b"ustar\x00":
            raise ValueError("bad ustar magic")
        stored = _tar_octal(h[148:156], "checksum")
        if stored != sum(h[:148]) + 8 * 0x20 + sum(h[156:]):
            raise ValueError("tar header checksum mismatch")
        end = h.find(b"\x00", 0, 100)
        name = h[: end if end >= 0 else 100].decode("ascii")
        size = _tar_octal(h[124:136], "size")
        typeflag = h[156:157]
        pos += 512
        if pos + size > len(tar):
            raise ValueError("truncated tar member data")
        data = tar[pos : pos + size]
        pos += size + ((512 - size % 512) % 512)
        if typeflag in (b"0", b"\x00"):
            rows.append((name, size, charfold_hash(data.decode("ascii"))))
        elif typeflag != b"5":
            raise ValueError(f"unsupported tar typeflag {typeflag!r}")
    return rows


def with_targz_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with synthesized tar.gz container bytes."""
    from mapreduce__spark.operators.multimodal import _with_payload

    return _with_payload(docs, synth_targz_bytes)


def targz_member_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched tar.gz extraction: one row per regular-file member."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "member": [], "usize": [], "text_hash": [],
            }
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                for name, usize, h in parse_targz_members(bytes(payload)):
                    out["doc_id"].append(int(i))
                    out["member"].append(name)
                    out["usize"].append(usize)
                    out["text_hash"].append(h)
            yield pd.DataFrame(out)

    return mm.select("doc_id", "payload").mapInPandas(
        gen,
        schema="doc_id bigint, member string, usize bigint, text_hash bigint",
    )


def with_zip_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with synthesized ZIP container bytes."""
    from mapreduce__spark.operators.multimodal import _with_payload

    return _with_payload(docs, synth_zip_bytes)


def zip_member_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched ZIP extraction: one row per member."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "member": [], "method": [],
                "usize": [], "crc_ok": [], "text_hash": [],
            }
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                for name, method, usize, crc_ok, h in parse_zip_members(
                    bytes(payload)
                ):
                    out["doc_id"].append(int(i))
                    out["member"].append(name)
                    out["method"].append(method)
                    out["usize"].append(usize)
                    out["crc_ok"].append(crc_ok)
                    out["text_hash"].append(h)
            yield pd.DataFrame(out)

    return mm.select("doc_id", "payload").mapInPandas(
        gen,
        schema=(
            "doc_id bigint, member string, method bigint, usize bigint, "
            "crc_ok boolean, text_hash bigint"
        ),
    )


# --------------------------------------------------------------------------
# Avro object-container files (the Avro 1.x spec): magic Obj\x01, a file
# metadata MAP (avro.schema JSON + optional avro.codec), a 16-byte sync
# marker, then data blocks of (record count, byte size, records, sync).
# Longs are zigzag varints; strings are length-prefixed UTF-8; the
# deflate codec is RAW DEFLATE (no zlib wrapper). Supported schema
# subset: a record of long/string fields in SCHEMA order — the shape
# row-oriented ingestion pipelines actually ship; anything else raises
# the documented ValueError.
# --------------------------------------------------------------------------


def _avro_zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        if u < 0x80:
            out.append(u)
            return bytes(out)
        out.append((u & 0x7F) | 0x80)
        u >>= 7


def _avro_long(b: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(b):
            raise ValueError("truncated avro varint")
        byte = b[pos]
        pos += 1
        u |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return (u >> 1) ^ -(u & 1), pos
        shift += 7
        # An Avro long is at most 10 varint bytes (64 bits / 7 per byte);
        # a continuation bit on the 10th byte is malformed, so reject
        # BEFORE consuming an 11th byte (round-12 ADVICE).
        if shift >= 70:
            raise ValueError("avro varint too long")


def _avro_bytes(b: bytes, pos: int) -> tuple[bytes, int]:
    ln, pos = _avro_long(b, pos)
    if ln < 0:
        raise ValueError("negative avro bytes length")
    if pos + ln > len(b):
        raise ValueError("truncated avro bytes")
    return b[pos : pos + ln], pos + ln


def _avro_map(b: bytes, pos: int) -> tuple[dict[str, bytes], int]:
    """File-metadata map: repeated blocks of (count, entries...) ending
    at count 0; a NEGATIVE count is |count| entries preceded by a byte
    size (the spec's skippable-block form)."""
    out: dict[str, bytes] = {}
    while True:
        n, pos = _avro_long(b, pos)
        if n == 0:
            return out, pos
        if n < 0:
            n = -n
            _size, pos = _avro_long(b, pos)  # block byte size (unused)
        for _ in range(n):
            k, pos = _avro_bytes(b, pos)
            v, pos = _avro_bytes(b, pos)
            out[k.decode("utf-8")] = v


def _avro_record_fields(schema_json: bytes) -> list[tuple[str, str]]:
    """(name, type) per field in SCHEMA order; long/string only."""
    import json

    try:
        schema = json.loads(schema_json)
    except ValueError as e:
        raise ValueError(f"bad avro.schema JSON: {e}") from e
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise ValueError("avro schema is not a record")
    fields = schema.get("fields")
    if not isinstance(fields, list) or not fields:
        raise ValueError("avro record without fields")
    out: list[tuple[str, str]] = []
    for f in fields:
        if not isinstance(f, dict) or not isinstance(f.get("name"), str):
            raise ValueError("malformed avro field")
        typ = f.get("type")
        if typ not in ("long", "string"):
            raise ValueError(f"unsupported avro field type {typ!r}")
        out.append((f["name"], typ))
    return out


def parse_avro_records(b: bytes) -> list[tuple[int, dict[str, object]]]:
    """Walk an Avro object-container file and return (rec, fields-dict)
    per record in file order across all blocks. Validates the magic,
    the metadata map, the codec (null/deflate), per-block record counts
    and byte sizes, exact block consumption, and every block's sync
    marker against the header's. Raises ValueError on any malformed
    input."""
    if b[:4] != b"Obj\x01":
        raise ValueError("not an avro object container (bad magic)")
    meta, pos = _avro_map(b, 4)
    if "avro.schema" not in meta:
        raise ValueError("avro file without avro.schema")
    fields = _avro_record_fields(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    if pos + 16 > len(b):
        raise ValueError("truncated avro sync marker")
    sync = b[pos : pos + 16]
    pos += 16
    rows: list[tuple[int, dict[str, object]]] = []
    rec = 0
    while pos < len(b):
        count, pos = _avro_long(b, pos)
        if count <= 0:
            raise ValueError("non-positive avro block count")
        size, pos = _avro_long(b, pos)
        if size < 0 or pos + size > len(b):
            raise ValueError("truncated avro block data")
        data = b[pos : pos + size]
        pos += size
        if codec == b"deflate":
            try:
                data = zlib.decompress(data, -15)
            except zlib.error as e:
                raise ValueError(f"bad avro deflate block: {e}") from e
        p = 0
        for _ in range(count):
            vals: dict[str, object] = {}
            for name, typ in fields:
                if typ == "long":
                    v, p = _avro_long(data, p)
                else:
                    raw, p = _avro_bytes(data, p)
                    try:
                        v = raw.decode("utf-8")
                    except UnicodeDecodeError as e:
                        raise ValueError(f"bad avro string: {e}") from e
                vals[name] = v
            rows.append((rec, vals))
            rec += 1
        if p != len(data):
            raise ValueError("avro block size disagrees with records")
        if b[pos : pos + 16] != sync:
            raise ValueError("avro block sync marker mismatch")
        pos += 16
    return rows


def synth_avro_bytes(doc_id: int) -> bytes:
    """Deterministic spec-valid Avro container: d%3+2 records of
    (id long, name string, score long) — score goes NEGATIVE (the
    zigzag path) — with field order rotated every third doc (schema
    order IS the wire order), deflate codec on odd docs (the key is
    OMITTED on null-codec docs — absent means null per spec), records
    split across TWO blocks every fourth doc, and a negative-count
    metadata-map block every fifth doc."""
    import json

    d = doc_id
    n = d % 3 + 2
    alt_order = d % 3 == 0
    field_defs = (
        [("name", "string"), ("id", "long"), ("score", "long")]
        if alt_order
        else [("id", "long"), ("name", "string"), ("score", "long")]
    )
    schema = json.dumps(
        {
            "type": "record",
            "name": "rec",
            "fields": [{"name": fn, "type": ft} for fn, ft in field_defs],
        }
    ).encode()
    deflate = d % 2 == 1
    sync = bytes((d * j + j * j + 7) % 256 for j in range(16))

    def rec_bytes(i: int) -> bytes:
        vals = {
            "id": d * 100 + i,
            "name": f"user-{(d * 7 + i) % 19}-" + "x" * ((d + i) % 3),
            "score": (d * 13 + i * 7) % 1000 - 200,
        }
        out = bytearray()
        for fn, ft in field_defs:
            if ft == "long":
                out += _avro_zigzag_encode(vals[fn])
            else:
                raw = vals[fn].encode()
                out += _avro_zigzag_encode(len(raw)) + raw
        return bytes(out)

    out = bytearray(b"Obj\x01")
    entries = [(b"avro.schema", schema)]
    if deflate:
        entries.append((b"avro.codec", b"deflate"))
    if d % 5 == 0:
        # negative-count map block: |count| entries preceded by a size
        body = b"".join(
            _avro_zigzag_encode(len(k)) + k + _avro_zigzag_encode(len(v)) + v
            for k, v in entries
        )
        out += _avro_zigzag_encode(-len(entries))
        out += _avro_zigzag_encode(len(body))
        out += body
    else:
        out += _avro_zigzag_encode(len(entries))
        for k, v in entries:
            out += _avro_zigzag_encode(len(k)) + k
            out += _avro_zigzag_encode(len(v)) + v
    out += _avro_zigzag_encode(0)
    out += sync
    splits = [list(range(n))]
    if d % 4 == 0:
        splits = [list(range(n - 1)), [n - 1]]
    for idxs in splits:
        body = b"".join(rec_bytes(i) for i in idxs)
        if deflate:
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = comp.compress(body) + comp.flush()
        out += _avro_zigzag_encode(len(idxs))
        out += _avro_zigzag_encode(len(body))
        out += body
        out += sync
    return bytes(out)


def with_avro_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with synthesized Avro container bytes."""
    from mapreduce__spark.operators.multimodal import _with_payload

    return _with_payload(docs, synth_avro_bytes)


def avro_record_rows(mm: DataFrame) -> DataFrame:
    """Arrow-batched Avro parse: one row per record across blocks."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "rec": [], "rec_id": [],
                "name": [], "score": [],
            }
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                for rec, vals in parse_avro_records(bytes(payload)):
                    out["doc_id"].append(int(i))
                    out["rec"].append(rec)
                    out["rec_id"].append(vals["id"])
                    out["name"].append(vals["name"])
                    out["score"].append(vals["score"])
            yield pd.DataFrame(out)

    return mm.select("doc_id", "payload").mapInPandas(
        gen,
        schema=(
            "doc_id bigint, rec bigint, rec_id bigint, name string, "
            "score bigint"
        ),
    )
