"""Round-10 property tests.

Covers the round-9 verdict's hygiene items: the heavy_hitters_exact
candidate broadcast is now size-guarded (broadcast under
HH_BROADCAST_LIMIT candidates, shuffle equi-join past it), and both
recount paths must stay value-identical.
"""

from __future__ import annotations

import os
from collections import Counter


def _write_docs(spark, tmp_path) -> tuple[str, dict[str, int]]:
    words = []
    words += ["alpha"] * 900 + ["beta"] * 700 + ["gamma"] * 500
    words += ["near1"] * 120 + ["near2"] * 110
    # total = 8230; threshold n*64 > 8230 -> n >= 129 > near1's 120
    for i in range(200):
        words += [f"w{i}"] * 30
    docs = [(i, " ".join(words[i::24]), "en", "web", 10) for i in range(24)]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).repartition(8).write.parquet(f"{sf}/documents.parquet")
    cnt = Counter(words)
    total = sum(cnt.values())
    want = {t: c for t, c in cnt.items() if c * 64 > total}
    return sf, want


def test_heavy_hitters_broadcast_and_shuffle_paths_value_equal(spark, tmp_path):
    """The size guard must be a pure plan choice: forcing the shuffle
    recount path (broadcast_limit=0) yields bit-identical output to the
    default broadcast path, and both equal directly computed truth."""
    from mapreduce__spark.plans.tier2 import HH_BROADCAST_LIMIT, _heavy_hitters_exact

    sf, want = _write_docs(spark, tmp_path)

    via_broadcast = {
        r.tok: r.n
        for r in _heavy_hitters_exact(spark, sf, HH_BROADCAST_LIMIT).collect()
    }
    via_shuffle = {
        r.tok: r.n for r in _heavy_hitters_exact(spark, sf, 0).collect()
    }
    assert via_broadcast == via_shuffle == want
    assert set(want) == {"alpha", "beta", "gamma"}


def test_heavy_hitters_shuffle_path_carries_no_broadcast_hint(spark, tmp_path):
    """Past the limit the candidate relation must NOT carry a broadcast
    hint — an unconditional hint is exactly the scale hole the guard
    closes (AQE may still pick a broadcast at runtime from true sizes;
    the guard's job is to stop the plan from FORCING one)."""
    from mapreduce__spark.plans.tier2 import _heavy_hitters_exact

    sf, _ = _write_docs(spark, tmp_path)
    guarded = _heavy_hitters_exact(spark, sf, 0)
    hinted = _heavy_hitters_exact(spark, sf, 10**9)
    # the n_total 1-row crossJoin broadcast is always hinted; the
    # candidate probe adds a SECOND hint only on the under-limit path
    assert str(hinted._jdf.queryExecution().logical()).count("ResolvedHint") == 2
    assert str(guarded._jdf.queryExecution().logical()).count("ResolvedHint") == 1


def test_plans_import_touches_no_filesystem(tmp_path):
    """Round-9 verdict item 6: importing mapreduce__spark.plans must not
    stage the fixture corpora (import side effects trap embedders); the
    first get_oracle_sql() call stages them instead, because the
    binaryfile_ingest ORACLE reads the staged directory."""
    import subprocess
    import sys

    code = """
import os, sys
root = os.environ["SPARK_GRAFT_FIXTURE_DIR"]
import mapreduce__spark.plans as plans
assert not os.path.exists(root), "import staged the fixture corpora"
plans.get_oracle_sql()
assert os.path.isdir(os.path.join(root, "binaryfile", "v1"))
assert os.path.isdir(os.path.join(root, "xml", "v1"))
print("OK")
"""
    env = dict(os.environ, SPARK_GRAFT_FIXTURE_DIR=str(tmp_path / "fx"))
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0 and "OK" in out.stdout, out.stderr[-2000:]


def test_k_core_changed_fraction_guard_is_value_neutral(spark):
    """Round-9 verdict item 7: the adjacency rewrite guard is a pure
    materialization choice. Peeling with always-rewrite (fraction 0),
    the default threshold, and never-rewrite (fraction huge) must
    produce identical (node, layer, residual_degree) rows on a graph
    engineered to peel a large first layer then tiny late layers (the
    case the guard exists for)."""
    from mapreduce__spark.operators.graph import k_core_layers

    # hub clique (0-5 all-pairs: survives k=3), a long chain that peels
    # one-end-at-a-time (tiny late rounds), and pendant leaves (big
    # round 1)
    edges = []
    for i in range(6):
        for j in range(i + 1, 6):
            edges.append((i, j))
    chain = [10, 11, 12, 13, 14, 15]
    edges += list(zip(chain, chain[1:]))
    edges += [(0, 10), (1, 11), (2, 12)]
    edges += [(i, 100 + i) for i in range(6)]  # leaves
    df = spark.createDataFrame(edges, "u bigint, v bigint")

    def run(frac):
        # driver_threshold=0 forces the distributed loop — the rewrite
        # guard under test lives there; the driver fast path has no
        # adjacency rewrite (its equivalence is tested in test_graph.py)
        return {
            (r.node, r.layer, r.residual_degree)
            for r in k_core_layers(
                df, 3, max_rounds=6, rewrite_fraction=frac, driver_threshold=0
            ).collect()
        }

    always = run(0.0)
    default = run(0.05)
    never = run(10.0**9)
    assert always == default == never
    # sanity: the clique survives as the 3-core, leaves fall in layer 1
    assert {(i, 0) for i in range(6)} <= {(n, l) for n, l, _ in always}
    assert all(l == 1 for n, l, _ in always if n >= 100)


def test_ann_bucketed_recall_report_vs_bruteforce(spark, sf_oracle, capsys):
    """ann_topk_buckets declares BUCKETING as its contract (exactly
    oracle-checked); this test carries the recall story: measure top-5
    recall against the exact brute-force answer, REPORT it, and assert
    only the sanity floor that hamming-1 multiprobe still finds a
    nontrivial share of true neighbors on the fixture corpus (each true
    hit requires the neighbor within one bit of the query's bucket)."""
    from mapreduce__spark.plans import REGISTRY

    truth = {}
    for r in REGISTRY["ann_topk_bruteforce"].fn(spark, sf_oracle).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in REGISTRY["ann_topk_buckets"].fn(spark, sf_oracle).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)

    assert set(got) <= set(truth) and len(truth) == 5
    hits = sum(len(got.get(q, set()) & ns) for q, ns in truth.items())
    total = sum(len(ns) for ns in truth.values())
    recall = hits / total
    print(f"\nann_topk_buckets recall@5 vs brute force: {recall:.2f} ({hits}/{total})")
    # hamming-1 multiprobe at 4 bits covers 5/16 of a random corpus and
    # measured 0.44 recall on the fixture (the near-random synthetic
    # embeddings are the hard case for hyperplane LSH). Floor at 0.25 so
    # a broken bucketing (random-coverage recall ~5/16 * 5/499 per
    # neighbor) fails loudly while staying robust to regeneration.
    assert recall >= 0.25, recall
    # every returned neighbor must sit within hamming-1 of the query's
    # bucket (the declared multiprobe semantics, checked end-to-end)
    from mapreduce__spark.operators.similarity import parity_bucket_signature
    from mapreduce__spark.plans.tier0 import load_table

    buckets = {
        r.vec_id: r.bucket
        for r in parity_bucket_signature(
            load_table(spark, sf_oracle, "embeddings")
        ).collect()
    }
    for q, ns in got.items():
        for n in ns:
            assert bin(buckets[n] ^ buckets[q]).count("1") <= 1, (q, n)


def test_jpeg_ac_fixture_pixels_match_law():
    """Per-pixel ground truth for the nonzero-AC class: decoding the
    synthesized file must reproduce law + s(x)s(y)*amp at EVERY pixel
    (the integral-IDCT claim the checker statistic rides on), across
    grayscale/color, restart, and DHT-layout variants."""
    import numpy as np

    from mapreduce__spark.operators.multimodal import (
        _jpeg_ac_law,
        _jpeg_decode_coeff_blocks,
        _JPEG_CHECKER_SIGN,
        _JPEG_IDCT_M,
        JPEG_AC_AMP,
        JPEG_ZIGZAG,
        synth_jpeg_ac_bytes,
    )

    for d in (0, 2, 5, 7, 10, 17, 23):  # covers gray, restart, DHT parity
        b = synth_jpeg_ac_bytes(d)
        width, height, blocks, p = _jpeg_decode_coeff_blocks(b)
        comps = p["frame"][2]
        bw = -(-width // 8)
        for c, (_cid, tq) in enumerate(comps):
            q = np.array(p["qtabs"][tq], dtype=np.float64)
            for m, zz in enumerate(blocks[c]):
                by, bx = divmod(m, bw)
                nat = np.zeros(64)
                for k in range(64):
                    nat[JPEG_ZIGZAG[k]] = zz[k]
                px = _JPEG_IDCT_M.T @ (nat * q).reshape(8, 8) @ _JPEG_IDCT_M
                block = np.clip(np.round(px) + 128, 0, 255).astype(np.int64)
                for y in range(8):
                    for x in range(8):
                        want = _jpeg_ac_law(d, c, bx, by) + (
                            _JPEG_CHECKER_SIGN[x]
                            * _JPEG_CHECKER_SIGN[y]
                            * JPEG_AC_AMP[c]
                        )
                        assert block[y, x] == want, (d, c, bx, by, x, y)


def test_jpeg_ac_checker_statistic_detects_ac_loss():
    """Non-vacuity of the checker columns: the SAME file with the planted
    AC coefficient stripped (DC-only twin) produces identical plain sums
    on full-block images but shifts every checker column by exactly
    amp * n_pixels — so an AC-decode failure cannot hash-match."""
    from mapreduce__spark.operators.multimodal import (
        decode_jpeg_checker_pixels,
        synth_jpeg_ac_bytes,
        synth_jpeg_bytes,
        JPEG_AC_AMP,
    )

    # doc 18: width 24, height 12 — multiple full 8x8 columns; gray=False
    d = 18
    ac = decode_jpeg_checker_pixels(synth_jpeg_ac_bytes(d))
    w, h, n = ac[0], ac[1], ac[2]
    assert w % 8 != 0 or h % 8 != 0 or n == w * h  # sanity on shape math
    dc = decode_jpeg_checker_pixels(synth_jpeg_bytes(d))
    # the DC twin's laws differ ([23,232] squeeze), so compare checkers
    # structurally: DC-only full blocks have zero checker contribution
    # from the law only when blocks are complete; the decisive claim is
    # on the AC file itself — each checker equals law-term + amp*n.
    import numpy as np

    from mapreduce__spark.operators.multimodal import (
        _jpeg_ac_law,
        _JPEG_CHECKER_SIGN,
    )

    sx = np.tile(np.array(_JPEG_CHECKER_SIGN), -(-w // 8))[:w]
    sy = np.tile(np.array(_JPEG_CHECKER_SIGN), -(-h // 8))[:h]
    for c, col in enumerate((6, 7, 8)):
        law_term = sum(
            int(sx[x]) * int(sy[y]) * _jpeg_ac_law(d, c, x // 8, y // 8)
            for x in range(w)
            for y in range(h)
        )
        assert ac[col] == law_term + JPEG_AC_AMP[c] * n, (c, ac[col])
    assert dc[2] == n  # the DC twin decodes the same geometry


def test_ann_bucketed_contract_on_random_embeddings(spark):
    """Random-content contract check for bucketed ANN (the oracle pins
    the fixture; this pins the SEMANTICS on arbitrary vectors): every
    returned neighbor lies within hamming-1 of the query bucket, ranks
    follow (score desc, neighbor_id asc) within the candidate set, and
    the result equals a direct Python recomputation of the declared
    bucketing + rerank."""
    import math
    import random

    from mapreduce__spark.operators.similarity import (
        bucketed_topk,
        parity_bucket_signature,
        parity_plane_sign,
    )

    rng = random.Random(4242)
    dim, nvec, bits, k = 16, 120, 3, 4
    vecs = {
        i: [rng.gauss(0, 1) for _ in range(dim)] for i in range(nvec)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id bigint, embedding array<double>"
    )
    qids = [0, 1, 2]
    got = {}
    for r in bucketed_topk(df, qids, k=k, n_bits=bits, dim=dim).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.score))

    # Python recomputation of the declared semantics
    def bucket(v):
        b = 0
        for j in range(bits):
            d = 0.0
            for i, x in enumerate(v):
                d += x * parity_plane_sign(i + 1, j)
            if d > 0:
                b |= 1 << j
        return b

    buckets = {i: bucket(v) for i, v in vecs.items()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        return -1.0 if da == 0 or db == 0 else num / (da * db)

    for q in qids:
        cands = [
            i
            for i in vecs
            if i != q and bin(buckets[i] ^ buckets[q]).count("1") <= 1
        ]
        # order by RAW score (the operator ranks before rounding); the
        # emitted score is compared with tolerance because Spark rounds
        # HALF_UP on the decimal repr while Python round() is banker's
        scored = sorted(
            ((cos(vecs[q], vecs[i]), i) for i in cands),
            key=lambda t: (-t[0], t[1]),
        )
        want = [(rank + 1, i, s) for rank, (s, i) in enumerate(scored[:k])]
        rows = sorted(got.get(q, []))
        assert [(r, i) for r, i, _ in rows] == [(r, i) for r, i, _ in want], (
            q, rows, want,
        )
        for (_, _, got_s), (_, _, raw_s) in zip(rows, want):
            assert abs(got_s - raw_s) <= 5.1e-5, (q, got_s, raw_s)
