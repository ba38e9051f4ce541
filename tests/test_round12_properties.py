"""Round-12 property tests: the AC-successive-approximation progressive
JPEG class (coefficient law, refinement-path coverage, restart markers,
truncation discipline, targeted corruption) and its decoder seams."""

from __future__ import annotations

import struct

import pytest

from mapreduce__spark.operators.multimodal import (
    JPEG_AC_K,
    JPEG_AC_QUANTIZED,
    _jpeg_ac_law,
    _jpeg_decode_progressive,
    _jpeg_refine_amp,
    decode_jpeg_progressive_pixels,
    synth_jpeg_ac_refine_bytes,
)


def test_ac_refine_coefficients_match_law():
    """Every decoded coefficient plane equals the synthesis law bit-exactly
    across grayscale/color, DC-SA/plain, restart/no-restart docs — the
    full AC-SA reassembly (shifted first scan + correction bits) is
    integer-exact."""
    for d in range(30):
        width, height, coefs, _ = _jpeg_decode_progressive(
            synth_jpeg_ac_refine_bytes(d)
        )
        bw = -(-width // 8)
        gray = d % 3 == 2
        for c in range(1 if gray else 3):
            for m, zz in enumerate(coefs[c]):
                by, bx = divmod(m, bw)
                assert zz[0] == _jpeg_ac_law(d, c, bx, by) - 128, (d, c, m)
                want = (
                    _jpeg_refine_amp(d, bx, by)
                    if c == 0
                    else JPEG_AC_QUANTIZED[c]
                )
                assert zz[JPEG_AC_K] == want, (d, c, m)
                assert all(
                    v == 0 for k, v in enumerate(zz) if k not in (0, JPEG_AC_K)
                ), (d, c, m)


def test_ac_refine_fixture_exercises_all_refinement_paths():
    """The class must genuinely hit every G.1.2.3 path: a color doc with
    several blocks has (a) newly-nonzero refinement placements (|A|=1
    luma blocks and all chroma-1 blocks), (b) history blocks whose
    correction bits ride an EOB run (|A|=2 luma blocks and the whole
    chroma-2 band), and (c) ZRL inside the refinement scan (38
    zero-history positions before zigzag 39). Asserted structurally: the
    amplitude law covers {1,2,-1,-2} and the stream contains >= 8 scans
    (DC [+DC refine] + 3 first + 3 refine)."""
    d = 4  # color, 3x2 blocks, no restarts, no DC-SA
    b = synth_jpeg_ac_refine_bytes(d)
    width, height, _, _ = _jpeg_decode_progressive(b)
    bw, bh = -(-width // 8), -(-height // 8)
    amps = {_jpeg_refine_amp(d, bx, by) for bx in range(bw) for by in range(bh)}
    assert len(amps) >= 3 and {1, 2} <= {abs(a) for a in amps}
    assert b.count(b"\xff\xda") == 7  # DC + 3 first + 3 refine
    d = 1  # DC-SA doc
    assert synth_jpeg_ac_refine_bytes(d).count(b"\xff\xda") == 8


def test_ac_refine_restart_docs_carry_rst_markers():
    """Every fifth doc interleaves cyclic RST0-7 inside progressive
    scans; the decoder resegments, resets DC predictors and EOB runs,
    and still reproduces the law (covered above). Check the markers are
    physically present and cyclic from RST0 per scan."""
    b = synth_jpeg_ac_refine_bytes(10)
    found = [b[i + 1] - 0xD0 for i in range(len(b) - 1)
             if b[i] == 0xFF and 0xD0 <= b[i + 1] <= 0xD7]
    assert found, "restart doc emitted no RST markers"
    # cyclic within each scan; scans restart the counter at 0
    assert found[0] == 0
    b2 = synth_jpeg_ac_refine_bytes(11)
    assert not any(
        b2[i] == 0xFF and 0xD0 <= b2[i + 1] <= 0xD7
        for i in range(len(b2) - 1)
    )


def test_ac_refine_truncation_discipline():
    """Per-byte truncation raises the documented ValueError — never a
    hang, never a silent partial decode."""
    full = synth_jpeg_ac_refine_bytes(5)  # gray + restarts + DC-SA
    assert decode_jpeg_progressive_pixels(full)[0] > 0
    for cut in range(len(full)):
        with pytest.raises(ValueError):
            decode_jpeg_progressive_pixels(full[:cut])


def test_ac_refine_targeted_corruption():
    """Surgical corruptions hit the new rejection seams: an out-of-order
    RST marker, a refinement magnitude category > 1, and a
    non-contiguous Ah/Al ladder."""
    full = synth_jpeg_ac_refine_bytes(10)  # color + restarts
    # out-of-order restart: bump the first RSTn byte
    for i in range(len(full) - 1):
        if full[i] == 0xFF and 0xD0 <= full[i + 1] <= 0xD7:
            mutated = full[:i + 1] + bytes([full[i + 1] + 1]) + full[i + 2:]
            with pytest.raises(ValueError, match="restart"):
                decode_jpeg_progressive_pixels(mutated)
            break
    # non-contiguous refinement ladder on the LAST scan (a refinement):
    # flip AhAl 0x10 -> 0x20
    sos = -1
    for _ in range(full.count(b"\xff\xda")):
        sos = full.find(b"\xff\xda", sos + 1)
    (ln,) = struct.unpack(">H", full[sos + 2 : sos + 4])
    ahal_off = sos + 2 + ln - 1
    assert full[ahal_off] == 0x10
    mutated = full[:ahal_off] + b"\x20" + full[ahal_off + 1 :]
    with pytest.raises(ValueError, match="non-contiguous AC refinement"):
        decode_jpeg_progressive_pixels(mutated)


def test_kendall_concordance_matches_bruteforce(spark, tmp_path):
    """The histogram-self-join counts equal the O(n^2) pairwise
    definition on a small heavy-tie corpus: nc/nd over strict orderings,
    the three tie terms, and the identity nc + nd + n1 + n2 - n3 =
    C(n,2) (pairs tied in BOTH are inside both tie terms)."""
    from mapreduce__spark.plans import REGISTRY

    xs = [3, 3, 5, 5, 5, 8, 8, 9, 3, 5]
    ys = [10, 12, 12, 12, 9, 20, 20, 20, 10, 30]
    rows = [
        (i, " ".join("w" for _ in range(x)), "en", "s0", y)
        for i, (x, y) in enumerate(zip(xs, ys))
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    [r] = REGISTRY["kendall_concordance"].fn(spark, sf_dir).collect()
    n = len(xs)
    nc = nd = n1 = n2 = n3 = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = (xs[i] > xs[j]) - (xs[i] < xs[j])
            dy = (ys[i] > ys[j]) - (ys[i] < ys[j])
            if dx and dy:
                nc += dx == dy
                nd += dx != dy
            if dx == 0:
                n1 += 1
            if dy == 0:
                n2 += 1
            if dx == 0 and dy == 0:
                n3 += 1
    assert (r.n_docs, r.nc, r.nd, r.ties_x, r.ties_y, r.ties_xy) == (
        n, nc, nd, n1, n2, n3,
    ), r
    assert nc + nd + n1 + n2 - n3 == n * (n - 1) // 2


def _winnow_py(text: str, k: int = 5, w: int = 4) -> set[tuple[int, int]]:
    """Independent pure-Python winnowing: k-gram char-fold hashes, per
    window the RIGHTMOST minimum, distinct (1-based idx, hash) pairs."""
    hs = []
    for i in range(len(text) - k + 1):
        h = 0
        for ch in text[i : i + k]:
            h = (h * 31 + ord(ch)) % 2147483647
        hs.append(h)
    out: set[tuple[int, int]] = set()
    for j in range(len(hs) - w + 1):
        win = hs[j : j + w]
        m = min(win)
        # rightmost occurrence
        idx = j + max(p for p, v in enumerate(win) if v == m)
        out.add((idx + 1, m))
    return out


def test_winnowing_matches_independent_reimplementation(spark, tmp_path):
    """The Spark array-expression operator equals the pure-Python
    winnower on crafted texts with forced hash ties and short docs
    (fewer grams than the window -> zero fingerprints)."""
    from mapreduce__spark.plans import REGISTRY

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaa",          # all grams identical: maximal ties
        "abcabcabcabcabc",          # periodic: repeated window minima
        "tiny",                     # < k: zero grams
        "sevench",                  # k..k+w-2: grams but zero windows
        "abab" * 12,
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.doc_id: (r.n_grams, r.n_windows, r.n_fingerprints,
                   r.fp_hash_sum, r.fp_idx_sum)
        for r in REGISTRY["winnowing_fingerprints"].fn(spark, sf_dir).collect()
    }
    for i, t in enumerate(texts):
        fps = _winnow_py(t)
        ng = max(len(t) - 5 + 1, 0)
        want = (
            ng,
            max(ng - 3, 0),
            len(fps),
            sum(h for _i, h in fps),
            sum(ix for ix, _h in fps),
        )
        assert got[i] == want, (i, t, got[i], want)


def test_winnowing_shared_substring_guarantee():
    """The paper's guarantee: two texts sharing any substring of length
    >= k + w - 1 = 8 share at least one fingerprint HASH."""
    base = "zqxjkvbnwpfmrtl"
    shared = "commonrun"  # length 9 >= 8
    a = base + shared + "ydhgu"
    b = "eio" + shared + base[::-1]
    fa = {h for _i, h in _winnow_py(a)}
    fb = {h for _i, h in _winnow_py(b)}
    assert fa & fb, "shared 9-char substring produced no shared fingerprint"
    # and two disjoint-alphabet texts share nothing
    fc = {h for _i, h in _winnow_py("abcde" * 6)}
    fd = {h for _i, h in _winnow_py("vwxyz" * 6)}
    assert not (fc & fd)


def test_funnel_order_semantics(spark, tmp_path):
    """Order matters: a purchase BEFORE the first post-view click must
    not convert; equal timestamps do not advance the stage (strict >);
    a user with no view contributes nothing."""
    from datetime import datetime

    from mapreduce__spark.plans import REGISTRY

    t = lambda m, s: datetime(2024, 1, 1, 0, m, s)  # noqa: E731
    rows = [
        # user 1: view -> click -> purchase (full conversion)
        (1, t(0, 0), 1, "view", 1.0, "{}"),
        (2, t(1, 0), 1, "click", 1.0, "{}"),
        (3, t(2, 0), 1, "purchase", 1.0, "{}"),
        # user 2: purchase BEFORE click -> reaches click only
        (4, t(0, 0), 2, "view", 1.0, "{}"),
        (5, t(0, 30), 2, "purchase", 1.0, "{}"),
        (6, t(1, 0), 2, "click", 1.0, "{}"),
        # user 3: click at the SAME instant as view -> view only
        (7, t(0, 0), 3, "view", 1.0, "{}"),
        (8, t(0, 0), 3, "click", 1.0, "{}"),
        # user 4: no view at all -> not in the funnel
        (9, t(0, 0), 4, "click", 1.0, "{}"),
        (10, t(1, 0), 4, "purchase", 1.0, "{}"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{sf_dir}/events.parquet")
    got = {
        r.stage: (r.users, r.sum_elapsed_us)
        for r in REGISTRY["funnel_conversion"].fn(spark, sf_dir).collect()
    }
    assert got == {
        "1_view": (3, 0),
        "2_click": (2, 120_000_000),  # users 1 (60s) + 2 (60s)
        "3_purchase": (1, 120_000_000),  # user 1 only (120s)
    }, got


def test_ols_fit_exactness(spark, tmp_path):
    """The emitted rationals equal the textbook least-squares fit on a
    corpus with a known exact line: y = 3x + 5 plus a balanced +-1
    perturbation keeps slope_num/slope_den == 3 exactly when the
    perturbation is orthogonal to x, and the fractions reduce to the
    closed form on a hand-checked irregular corpus."""
    from fractions import Fraction

    from mapreduce__spark.plans import REGISTRY

    # x chosen so a (+1, -1) perturbation at equal-x pairs cancels
    data = [(x, 3 * x + 5 + e) for x, e in
            [(2, 1), (2, -1), (5, 1), (5, -1), (9, 0), (13, 0)]]
    rows = [
        (i, " ".join("w" * 1 for _ in range(x)), "en", "s0", y)
        for i, (x, y) in enumerate(data)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    [r] = REGISTRY["ols_fit_per_source"].fn(spark, sf_dir).collect()
    assert Fraction(r.slope_num, r.slope_den) == 3
    assert Fraction(r.intercept_num, r.slope_den) == 5
    assert r.n_docs == 6
    """The general sequential state machine equals the oracle's affine
    reconstruction on every law doc (constant nibble, interior index
    walk), including both sign paths and all law magnitude-bit
    combinations; no sample ever clamps."""
    from mapreduce__spark.operators.adpcm import (
        ADPCM_INDEX_ADJ,
        ADPCM_SAMPLES_PER_BLOCK,
        ADPCM_STEPS,
        _adpcm_law_block,
        decode_wav_adpcm,
        synth_wav_adpcm_bytes,
    )

    for d in range(30):
        got = decode_wav_adpcm(synth_wav_adpcm_bytes(d))
        want = []
        for b in range(d % 3 + 1):
            v, i0, s0 = _adpcm_law_block(d, b)
            adj = ADPCM_INDEX_ADJ[v & 7]
            s = s0
            want.append(s)
            for k in range(16):
                st = ADPCM_STEPS[i0 + k * adj]
                diff = (
                    (st >> 3)
                    + (st if v & 4 else 0)
                    + ((st >> 1) if v & 2 else 0)
                    + ((st >> 2) if v & 1 else 0)
                )
                s += -diff if v & 8 else diff
                assert -32768 < s < 32767, (d, b, k)
                want.append(s)
        assert got == want, d
        assert len(got) == (d % 3 + 1) * ADPCM_SAMPLES_PER_BLOCK


def test_adpcm_clamp_paths():
    """Hand-built blocks drive the clamping branches the law avoids:
    a max-magnitude nibble run from a high predictor clamps samples at
    32767, and from index 88 the step index clamps instead of walking
    off the table; a descending run clamps at -32768."""
    import struct

    from mapreduce__spark.operators.adpcm import decode_wav_adpcm

    def wav(blocks: bytes) -> bytes:
        fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000, 12, 4, 2, 17)
        fact = struct.pack("<I", (len(blocks) // 12) * 17)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(blocks)) + blocks
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    up = struct.pack("<hBB", 30000, 88, 0) + b"\x77" * 8  # nibble 7 run
    s = decode_wav_adpcm(wav(up))
    assert s[0] == 30000 and s[-1] == 32767 and max(s) == 32767
    down = struct.pack("<hBB", -30000, 88, 0) + b"\xff" * 8  # nibble 15
    s = decode_wav_adpcm(wav(down))
    assert s[-1] == -32768
    # index clamp at the bottom: nibble 0 keeps subtracting 1 from the
    # index; from index 2 it must stick at 0, not go negative
    flat = struct.pack("<hBB", 5, 2, 0) + b"\x00" * 8
    s = decode_wav_adpcm(wav(flat))
    assert len(s) == 17  # would IndexError on a missing clamp


def test_adpcm_truncation_and_corruption():
    """Per-byte truncation raises ValueError (RIFF length pins the file
    size, so no cut is silently valid); targeted corruptions hit the
    named seams."""
    import struct

    from mapreduce__spark.operators.adpcm import (
        decode_wav_adpcm,
        synth_wav_adpcm_bytes,
    )

    full = synth_wav_adpcm_bytes(7)
    assert decode_wav_adpcm(full)
    for cut in range(len(full)):
        with pytest.raises(ValueError):
            decode_wav_adpcm(full[:cut])
    with pytest.raises(ValueError, match="format tag"):
        # flip the fmt tag to PCM
        i = full.find(b"fmt ") + 8
        decode_wav_adpcm(full[:i] + struct.pack("<H", 1) + full[i + 2:])
    with pytest.raises(ValueError, match="fact sample count"):
        i = full.find(b"fact") + 8
        decode_wav_adpcm(full[:i] + struct.pack("<I", 999) + full[i + 4:])
    with pytest.raises(ValueError, match="step index"):
        i = full.find(b"data") + 8 + 2  # first block header's index byte
        decode_wav_adpcm(full[:i] + b"\x60" + full[i + 1:])


def test_mann_whitney_u_matches_bruteforce(spark, tmp_path):
    """The doubled-midrank U must equal the pairwise definition
    2U = 2*wins + ties (group value beats / ties a non-group value),
    computed brute-force on a small corpus with heavy ties."""
    from mapreduce__spark.plans import REGISTRY

    vals = [3, 7, 7, 7, 12, 12, 20, 20, 20, 20, 31, 3, 7, 12, 45]
    srcs = ["a", "a", "b", "c", "a", "b", "c", "a", "b", "b", "c",
            "b", "c", "c", "a"]
    rows = [(i, "t", "en", s, v) for i, (v, s) in enumerate(zip(vals, srcs))]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        r.source: (r.n_docs, r.r2, r.u2, r.tie_cubes)
        for r in REGISTRY["mann_whitney_u"].fn(spark, sf_dir).collect()
    }
    from collections import Counter

    c = Counter(vals)
    tie_cubes = sum(k**3 - k for k in c.values())
    for s in set(srcs):
        grp = [v for v, g in zip(vals, srcs) if g == s]
        rest = [v for v, g in zip(vals, srcs) if g != s]
        u2 = sum(
            2 * (gv > rv) + (gv == rv) for gv in grp for rv in rest
        )
        n = len(grp)
        r2 = u2 + n * (n + 1)
        assert got[s] == (n, r2, u2, tie_cubes), (s, got[s], (n, r2, u2))


def test_avro_parser_matches_law_and_hazards():
    """Every law field round-trips across the hazard matrix: rotated
    schema field order, null/deflate codecs (absent key = null),
    negative-count metadata map blocks, multi-block files, negative
    zigzag longs."""
    from mapreduce__spark.sources.archives import (
        parse_avro_records,
        synth_avro_bytes,
    )

    for d in range(30):
        rows = parse_avro_records(synth_avro_bytes(d))
        assert len(rows) == d % 3 + 2
        for rec, vals in rows:
            assert vals["id"] == d * 100 + rec
            assert vals["name"] == (
                f"user-{(d * 7 + rec) % 19}-" + "x" * ((d + rec) % 3)
            )
            assert vals["score"] == (d * 13 + rec * 7) % 1000 - 200
            assert vals["score"] < 0 or vals["score"] >= 0  # zigzag both


def test_avro_truncation_and_corruption():
    """Per-byte truncation either raises ValueError or — ONLY at a
    block-boundary cut, where the spec makes a shorter container
    indistinguishable from a complete one — yields a strict prefix of
    the records; surgical corruptions hit the named seams (magic,
    sync mismatch)."""
    from mapreduce__spark.sources.archives import (
        parse_avro_records,
        synth_avro_bytes,
    )

    for d in (0, 1, 3, 4, 5):  # null+2blocks, deflate, alt-order, negmap
        full = synth_avro_bytes(d)
        want = parse_avro_records(full)
        assert want
        boundary_cuts = 0
        for cut in range(len(full)):
            try:
                got = parse_avro_records(full[:cut])
            except ValueError:
                continue
            # a parse that survived must be a strict record prefix
            # (header+sync alone is a legal zero-record container)
            assert got == want[: len(got)] and len(got) < len(want), cut
            boundary_cuts += 1
        # exactly the block boundaries: header end, plus one interior
        # boundary on multi-block docs
        assert boundary_cuts == (2 if d % 4 == 0 else 1), (d, boundary_cuts)
    full = synth_avro_bytes(2)
    with pytest.raises(ValueError, match="magic"):
        parse_avro_records(b"Obk\x01" + full[4:])
    # flip one byte of the trailing sync marker
    with pytest.raises(ValueError, match="sync"):
        parse_avro_records(full[:-1] + bytes([full[-1] ^ 0xFF]))


def test_avro_parser_against_independent_writer():
    """Hypothesis fuzz: random record values encoded by an INDEPENDENT
    mini-writer (its own varint/zigzag code, single block, explicit
    null codec key) must decode exactly."""
    import json
    import zlib as _zlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mapreduce__spark.sources.archives import parse_avro_records

    def zz(n):
        out = bytearray()
        u = (2 * n) if n >= 0 else (-2 * n - 1)
        while u >= 0x80:
            out.append((u & 0x7F) | 0x80)
            u >>= 7
        out.append(u)
        return bytes(out)

    @given(
        st.lists(
            st.tuples(
                st.integers(-(2**62), 2**62),
                st.text(
                    st.characters(min_codepoint=32, max_codepoint=0x2FFF),
                    max_size=12,
                ),
            ),
            min_size=1,
            max_size=20,
        ),
        st.booleans(),
    )
    @settings(max_examples=40, deadline=None)
    def run(records, deflate):
        schema = json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "a", "type": "long"},
                    {"name": "b", "type": "string"},
                ],
            }
        ).encode()
        meta = [(b"avro.schema", schema),
                (b"avro.codec", b"deflate" if deflate else b"null")]
        out = bytearray(b"Obj\x01")
        out += zz(len(meta))
        for k, v in meta:
            out += zz(len(k)) + k + zz(len(v)) + v
        out += zz(0)
        sync = bytes(range(16))
        out += sync
        body = b"".join(
            zz(a) + zz(len(s.encode())) + s.encode() for a, s in records
        )
        if deflate:
            c = _zlib.compressobj(9, _zlib.DEFLATED, -15)
            body = c.compress(body) + c.flush()
        out += zz(len(records)) + zz(len(body)) + body + sync
        rows = parse_avro_records(bytes(out))
        assert [(v["a"], v["b"]) for _r, v in rows] == records

    run()


def test_png_adam7_pass_table_matches_spec_matrix():
    """The pass tuples must tile the spec's 8x8 Adam7 pattern matrix
    exactly (a transposed or permuted table would still round-trip
    encoder<->decoder, so this literal is the independent pin)."""
    from mapreduce__spark.operators.multimodal import PNG_ADAM7

    spec = [
        [1, 6, 4, 6, 2, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [3, 6, 4, 6, 3, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
    ]
    derived = [[0] * 8 for _ in range(8)]
    for p, (x0, y0, dx, dy) in enumerate(PNG_ADAM7, 1):
        for y in range(y0, 8, dy):
            for x in range(x0, 8, dx):
                assert derived[y][x] == 0, "passes overlap"
                derived[y][x] = p
    assert derived == spec


def test_png_adam7_decode_matches_law_and_hits_empty_passes():
    """Decoded tuples equal the pixel law for 40 docs, and the dims law
    genuinely produces docs with EMPTY passes (width or height <= 4)."""
    import numpy as np

    from mapreduce__spark.operators.multimodal import (
        PNG_ADAM7,
        decode_png_adam7_pixels,
        synth_png_adam7_bytes,
    )

    empty = 0
    for d in range(40):
        w = (3 * d) % 14 + 3
        h = (7 * d) % 13 + 3
        empty += sum(1 for x0, y0, _dx, _dy in PNG_ADAM7 if w <= x0 or h <= y0)
        ys = np.arange(h).reshape(h, 1)
        xs = np.arange(w).reshape(1, w)
        r = (11 * d + 3 * xs + 7 * ys) % 256
        g = (3 * d + 8 * xs + ys) % 256
        b = (9 * d + xs + 4 * ys) % 256
        wgt = xs + 2 * ys + 1
        want = (
            w, h, w * h,
            int(r.sum()), int(g.sum()), int(b.sum()),
            int((wgt * r).sum()), int((wgt * g).sum()), int((wgt * b).sum()),
        )
        assert decode_png_adam7_pixels(synth_png_adam7_bytes(d)) == want, d
    assert empty > 0, "dims law never produced an empty pass"


def test_png_adam7_truncation_and_routing():
    """Per-byte truncation raises ValueError; the interlaced decoder
    rejects non-interlaced files and vice versa (the routing seam), and
    trailing garbage in the scanline stream is caught."""
    from mapreduce__spark.operators.multimodal import (
        decode_png_adam7_pixels,
        decode_png_pixels,
        synth_png_adam7_bytes,
        synth_png_bytes,
    )

    full = synth_png_adam7_bytes(7)
    assert decode_png_adam7_pixels(full)[0] > 0
    for cut in range(len(full)):
        with pytest.raises(ValueError):
            decode_png_adam7_pixels(full[:cut])
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png_adam7_pixels(synth_png_bytes(7))
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png_pixels(full)


def test_lang_id_nb_confusion_matrix_diagonal(spark, tmp_path):
    """The trained char-bigram Naive Bayes must actually discriminate:
    on a corpus whose languages use DISJOINT character alphabets the
    confusion matrix is exactly diagonal (the shared sf corpora draw all
    labels from one vocabulary, so the registry run concentrates on the
    prior by design — this is the discrimination law)."""
    from mapreduce__spark.plans import REGISTRY

    alphabets = {
        "de": "abcde",
        "en": "fghij",
        "es": "klmno",
        "fr": "pqrst",
        "zh": "uvwxy",
    }
    rows = []
    doc_id = 0
    for lang, ab in alphabets.items():
        for i in range(8):
            words = [
                "".join(ab[(i + j + k) % 5] for k in range(3 + j % 3))
                for j in range(12)
            ]
            rows.append((doc_id, " ".join(words), lang))
            doc_id += 1
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r.labeled_lang, r.predicted_lang): r.n_docs
        for r in REGISTRY["lang_id_nb"].fn(spark, sf_dir).collect()
    }
    assert got == {(lg, lg): 8 for lg in alphabets}, got


def test_ac_refine_pixel_sums_match_closed_form():
    """decode_jpeg_progressive_pixels' 9-tuple equals the closed-form
    law the oracle uses (block-constant base +- 7*amp / -11 / +22
    checkerboard), recomputed per pixel in pure Python."""
    sign = (1, -1, -1, 1, 1, -1, -1, 1)
    amp_c = (None, -11, 22)
    for d in (0, 1, 2, 3, 4, 5, 10, 13):
        w = (5 * d) % 15 + 8
        h = (7 * d) % 11 + 8
        gray = d % 3 == 2
        got = decode_jpeg_progressive_pixels(synth_jpeg_ac_refine_bytes(d))
        sums = [0, 0, 0]
        chk = [0, 0, 0]
        for c in range(1 if gray else 3):
            for y in range(h):
                for x in range(w):
                    s = sign[x % 8] * sign[y % 8]
                    base = _jpeg_ac_law(d, c, x // 8, y // 8)
                    a = (
                        7 * _jpeg_refine_amp(d, x // 8, y // 8)
                        if c == 0
                        else amp_c[c]
                    )
                    px = base + s * a
                    sums[c] += px
                    chk[c] += s * px
        assert got == (w, h, w * h, *sums, *chk), d
