"""Regression tests for the round-11 ADVICE findings: WARC
Content-Length validation (negative lengths rewound the cursor into an
infinite loop), ZIP EOCD location when the archive comment contains the
EOCD signature, parquet page-walker shape validation (ValueError, never
TypeError, on structurally-valid-thrift-but-wrong-shape footers), HTML
rawtext closers that only prefix-match the tag name, and URL
canonicalization of authority-only / single-label-host URLs."""

from __future__ import annotations

import io
import struct
import zipfile
from urllib.parse import urlsplit

import pytest

from mapreduce__spark.operators.html import extract_html_text
from mapreduce__spark.sources.archives import (
    charfold_hash,
    parse_warc_records,
    parse_zip_members,
)
from mapreduce__spark.sources.parquet_footer import (
    read_delta_column,
    read_dict_column,
    read_int64_column,
)


# ---------------------------------------------------------------------------
# WARC Content-Length discipline
# ---------------------------------------------------------------------------


def _warc_record(content_length: str, payload: bytes = b"") -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"Content-Length: " + content_length.encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )


def test_warc_negative_content_length_raises_not_hangs():
    """ADVICE (medium): a negative Content-Length made pos += ln rewind
    the cursor; a rewind landing on a prior record separator re-parsed
    the same record forever. Must be the documented ValueError."""
    # the hazard shape: a valid record followed by one whose negative
    # length would rewind the cursor back inside already-parsed bytes
    b = _warc_record("4", b"honk") + _warc_record("-44", b"x" * 8)
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_records(b)


@pytest.mark.parametrize("bad", ["-1", "+5", "1_2", " 7", "7 ", "", "0x10"])
def test_warc_non_digit_content_length_rejected(bad):
    """int() accepts '+5' and '1_2'; no conformant writer emits them, so
    the parser rejects anything that is not pure ASCII digits. (Leading/
    trailing blanks are already stripped by header parsing — the
    parametrized blanks arrive through a literal header line.)"""
    with pytest.raises(ValueError):
        parse_warc_records(_warc_record(bad, b"1234567890"))


def test_warc_digit_content_length_still_parses():
    rows = parse_warc_records(
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://h.example/x\r\n"
        b"Content-Length: 26\r\n"
        b"\r\n"
        b"HTTP/1.1 200 X\r\n\r\nhi there\r\n\r\n"
    )
    assert rows == [(0, "http://h.example/x", 200, 8, charfold_hash("hi there"))]


# ---------------------------------------------------------------------------
# ZIP EOCD location with a hostile archive comment
# ---------------------------------------------------------------------------


def test_zip_comment_containing_eocd_signature_parses():
    """ADVICE: rfind of PK\\x05\\x06 locked onto a signature embedded in
    the archive comment. The scan must keep walking backwards until the
    comment-length field accounts for exactly the remaining bytes."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("a.txt", "alpha beta")
        z.writestr("b.txt", "gamma")
        z.comment = b"decoy " + b"\x50\x4b\x05\x06" + b" trailing junk"
    rows = parse_zip_members(buf.getvalue())
    assert [(r[0], r[2], r[3]) for r in rows] == [
        ("a.txt", 10, True),
        ("b.txt", 5, True),
    ]
    assert rows[0][4] == charfold_hash("alpha beta")


def test_zip_trailing_garbage_still_rejected():
    """Bytes past the true EOCD that do NOT form a consistent comment
    must still fail loudly rather than silently misparse."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("a.txt", "alpha")
    with pytest.raises(ValueError):
        parse_zip_members(buf.getvalue() + b"\xde\xad\xbe\xef")


# ---------------------------------------------------------------------------
# Parquet page walkers: wrong-shape footers fail as ValueError
# ---------------------------------------------------------------------------
# A tiny compact-protocol thrift ENCODER (the inverse of the module's
# reader) so the tests can synthesize footers that are perfectly valid
# thrift yet miss the shape assumptions — the exact corruption class the
# ADVICE flagged as raising TypeError instead of ValueError.


def _zz(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _vint(n: int) -> bytes:
    out = bytearray()
    while True:
        if n < 0x80:
            out.append(n)
            return bytes(out)
        out.append((n & 0x7F) | 0x80)
        n >>= 7


def _enc_value(v) -> tuple[int, bytes]:
    """value -> (compact type code, encoded bytes)."""
    if isinstance(v, bool):
        # standalone bools only appear as field types; handled in _enc_struct
        raise AssertionError("encode bools at field level")
    if isinstance(v, int):
        return 6, _vint(_zz(v))  # I64
    if isinstance(v, bytes):
        return 8, _vint(len(v)) + v
    if isinstance(v, list):
        assert v, "typed empty lists not needed here"
        etype, _ = _enc_value(v[0])
        body = b"".join(_enc_value(x)[1] for x in v)
        head = (
            bytes([(len(v) << 4) | etype])
            if len(v) < 15
            else bytes([0xF0 | etype]) + _vint(len(v))
        )
        return 9, head + body
    if isinstance(v, dict):
        return 12, _enc_struct(v)
    raise AssertionError(f"unsupported {type(v)}")


def _enc_struct(fields: dict) -> bytes:
    out = bytearray()
    last = 0
    for fid in sorted(fields):
        v = fields[fid]
        if isinstance(v, bool):
            typ, body = (1 if v else 2), b""
        else:
            typ, body = _enc_value(v)
        delta = fid - last
        if 0 < delta <= 15:
            out.append((delta << 4) | typ)
        else:
            out.append(typ)
            out += _vint(_zz(fid))
        out += body
        last = fid
    out.append(0)
    return bytes(out)


def _footer_file(meta: dict) -> bytes:
    footer = _enc_struct(meta)
    return b"PAR1" + footer + struct.pack("<I", len(footer)) + b"PAR1"


def _chunk_meta(md: dict) -> dict:
    """FileMetaData wrapping one row group / one chunk with meta_data md."""
    return {4: [{1: [{3: md}]}]}


_BASE_MD = {1: 2, 3: [b"id"], 4: 0}  # INT64, path ["id"], UNCOMPRESSED


@pytest.mark.parametrize(
    "md_extra",
    [
        {9: 100},          # num_values (field 5) missing entirely
        {5: True, 9: 100},  # num_values is a bool
        {5: -3, 9: 100},   # num_values negative
        {5: 10},           # data_page_offset (field 9) missing
        {5: 10, 9: -1},    # data_page_offset negative
    ],
)
def test_page_walkers_reject_wrong_shape_footers(md_extra):
    """ADVICE: read_int64/dict/delta_column did arithmetic on unvalidated
    footer fields, turning wrong-shape-but-valid-thrift footers into
    TypeError. All three must follow parse_parquet_footer's documented
    raise-ValueError discipline."""
    b = _footer_file(_chunk_meta({**_BASE_MD, **md_extra}))
    for reader in (read_int64_column, read_delta_column):
        with pytest.raises(ValueError):
            reader(b, "id")
    # read_dict_column needs schema + a dictionary offset to reach the
    # same fields; give it a minimal REQUIRED schema element and a
    # bad-shape chunk with field 11 present
    meta = _chunk_meta({**_BASE_MD, **md_extra, 11: 4})
    meta[2] = [{4: b"id", 3: 0}]  # SchemaElement: name "id", REQUIRED
    with pytest.raises(ValueError):
        read_dict_column(_footer_file(meta), "id")


def test_page_walker_rejects_wrong_shape_page_header():
    """A chunk whose fields are fine but whose PageHeader lacks the
    compressed-size field must also fail as ValueError: the walker reads
    the header from unvalidated data_page_offset bytes."""
    # plant a thrift struct {1: 0 (DATA_PAGE), 5: {...}} with no field 3
    # (compressed size) at offset 8 (= PAR1 magic + 4 pad bytes) and
    # point the chunk's data_page_offset at it
    page_header = _enc_struct({1: 0, 5: {1: 5, 2: 0}})
    footer = _enc_struct(_chunk_meta({**_BASE_MD, 5: 5, 9: 8}))
    b = b"PAR1" + b"\x00" * 4 + page_header
    b += footer + struct.pack("<I", len(footer)) + b"PAR1"
    with pytest.raises(ValueError):
        read_int64_column(b, "id")


# ---------------------------------------------------------------------------
# HTML rawtext closers
# ---------------------------------------------------------------------------


def test_rawtext_closer_requires_tag_boundary():
    """ADVICE: low.find('</script') matched '</scripty>', ending a
    <script> body early and leaking its code into the visible text."""
    html = "<p>before</p><script>var x = '</scripty>hidden';</script>after"
    text, _, _, _ = extract_html_text(html)
    assert "hidden" not in text
    assert "before" in text and "after" in text


@pytest.mark.parametrize(
    "closer", ["</script>", "</SCRIPT>", "</script >", "</script\n>", "</script/>"]
)
def test_rawtext_closer_variants_still_close(closer):
    html = f"<p>a</p><script>skip me{closer}b"
    text, _, _, _ = extract_html_text(html)
    assert "skip" not in text
    assert "a" in text and "b" in text


def test_rawtext_unclosed_swallows_to_eof():
    text, _, _, _ = extract_html_text("<p>a</p><style>p {{}} </styleX> tail")
    assert text == "a"


# ---------------------------------------------------------------------------
# URL canonicalization: authority-only and single-label hosts
# ---------------------------------------------------------------------------


def test_canonicalize_authority_only_and_single_label(spark):
    """ADVICE: with no '/' in the rest, instr()=0 made substring() echo
    the whole authority — canonical_url became 'http://hosthost'; a
    single-label host hit element_at(labels, 0). Cross-checked against
    urllib's split on the same strings."""
    from mapreduce__spark.functions.urls import canonicalize_urls

    urls = [
        "http://example.com",            # authority-only, no path at all
        "http://Example.COM?b=2&utm_x=1",  # no path, query present
        "http://localhost:8080",         # single-label host, kept port
        "http://localhost",              # single-label, no port
        "https://www.site-1.example.com",  # www-strip + no path
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id bigint, url string"
    )
    got = {
        r.url: (r.canonical_url, r.host, r.registered_domain, r.path_depth)
        for r in canonicalize_urls(df).collect()
    }
    for u in urls:
        s = urlsplit(u)
        host = s.hostname.removeprefix("www.")
        cu, h, _rd, depth = got[u]
        assert h == host, u
        # no-path URLs canonicalize to path '/' and depth 0
        assert depth == 0, u
        assert cu.startswith(f"{s.scheme.lower()}://{host}"), u
        assert f"{host}{host}" not in cu, f"host doubled into path: {cu}"
    assert got["http://example.com"][0] == "http://example.com/"
    assert got["http://Example.COM?b=2&utm_x=1"][0] == "http://example.com/?b=2"
    assert got["http://localhost:8080"] == (
        "http://localhost:8080/", "localhost", "localhost", 0
    )
    assert got["http://localhost"][2] == "localhost"
    assert got["https://www.site-1.example.com"][2] == "site-1.example.com"
