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
    eocd = b.rfind(b"\x50\x4b\x05\x06")
    if eocd < 0 or eocd + 22 > len(b):
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
