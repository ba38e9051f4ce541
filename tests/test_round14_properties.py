"""Round-14 property tests: CCNet-style perplexity bucketing laws
(round-13 VERDICT item 3) — exact rank terciles per source over the
Kneser-Ney doc NLL, pinned against an independent Python
reimplementation and the population-balance law."""

from __future__ import annotations

import pytest

from mapreduce__spark.plans import REGISTRY


@pytest.fixture(scope="module")
def ppl_corpus_sf(tmp_path_factory) -> str:
    """Three sources exercising the tercile edge cases: 'web' has seven
    docs with distinct perplexities, 'ties' has six IDENTICAL docs (one
    shared nll — only the doc_id tie-break can separate them), and
    'tiny' has two docs (fewer docs than buckets, so one bucket must
    stay empty). Plus a one-token doc that has no bigrams and must be
    absent from the output entirely."""
    from tests.test_round13_advice import _write_documents

    rows, doc_id = [], 0
    corpus = [
        ("we drove to san francisco from san francisco bay", "web"),
        ("san francisco fog rolled over san francisco hills", "web"),
        ("a nice day and a long day and a good day", "web"),
        ("every day some day one day each day", "web"),
        ("the chef cooked while the chef sang", "web"),
        ("day after day the san francisco day began", "web"),
        ("fog over the bay began while we sang", "web"),
        ("solo", "web"),  # one token: no bigrams, must drop out
        ("same text same text same text", "ties"),
        ("same text same text same text", "ties"),
        ("same text same text same text", "ties"),
        ("same text same text same text", "ties"),
        ("same text same text same text", "ties"),
        ("same text same text same text", "ties"),
        ("a nice day in the fog", "tiny"),
        ("san francisco bay fog", "tiny"),
    ]
    for text, source in corpus:
        doc_id += 1
        rows.append((doc_id, text, "en", source, len(text)))
    d = str(tmp_path_factory.mktemp("ppl_corpus"))
    _write_documents(d, rows)
    return d


def _reference_buckets(spark, sf_dir: str) -> dict[int, tuple[str, str]]:
    """Independent bucketing: the round-13 pure-Python KN scorer for the
    nll, then a plain per-source sort by (nll, doc_id) and the exact
    rank-tercile rule b = (3*(rank-1)) // n."""
    import duckdb

    from tests.test_round13_properties import _kn_reference

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text, source FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    nll = _kn_reference([(d, t) for d, t, _ in docs])
    src = {d: s for d, _, s in docs}
    by_source: dict[str, list[tuple[float, int]]] = {}
    for doc_id, (_, score) in nll.items():
        by_source.setdefault(src[doc_id], []).append((score, doc_id))
    out: dict[int, tuple[str, str]] = {}
    names = ("head", "middle", "tail")
    for source, scored in by_source.items():
        scored.sort()
        n = len(scored)
        for rank0, (_, doc_id) in enumerate(scored):
            out[doc_id] = (source, names[(3 * rank0) // n])
    return out


def test_perplexity_buckets_match_pure_python_reference(spark, ppl_corpus_sf):
    want = _reference_buckets(spark, ppl_corpus_sf)
    got = {
        r.doc_id: (r.source, r.ppl_bucket)
        for r in REGISTRY["perplexity_buckets"].fn(spark, ppl_corpus_sf).collect()
    }
    assert got == want
    assert 8 not in got  # the one-token doc has no perplexity


def test_perplexity_buckets_population_and_order_laws(spark, ppl_corpus_sf):
    """The two laws the VERDICT asked for: (1) per-source bucket
    populations differ by at most one — even on the all-ties source,
    where only the doc_id tie-break separates docs; (2) buckets are
    monotone in (nll, doc_id): no head doc outranks a middle doc of the
    same source, etc."""
    rows = REGISTRY["perplexity_buckets"].fn(spark, ppl_corpus_sf).collect()
    order = {"head": 0, "middle": 1, "tail": 2}
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert set(by_source) == {"web", "ties", "tiny"}
    for source, docs in by_source.items():
        pops = [sum(1 for r in docs if r.ppl_bucket == b) for b in order]
        assert max(pops) - min(pops) <= 1, (source, pops)
        ranked = sorted(docs, key=lambda r: (r.nll, r.doc_id))
        buckets = [order[r.ppl_bucket] for r in ranked]
        assert buckets == sorted(buckets), (source, buckets)
    # the ties source: one nll value, six docs, still a 2/2/2 split
    tie_nlls = {r.nll for r in by_source["ties"]}
    assert len(tie_nlls) == 1
    # the tiny source: two docs land in head and middle, tail stays empty
    tiny = sorted((r.nll, r.ppl_bucket) for r in by_source["tiny"])
    assert [b for _, b in tiny] == ["head", "middle"]


def test_perplexity_buckets_match_oracle_on_fixture(spark, ppl_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    q = REGISTRY["perplexity_buckets"]
    ok, msg = compare_with_oracle(q.fn(spark, ppl_corpus_sf), q.oracle, ppl_corpus_sf)
    assert ok, msg


def _scrub_reference(text: str) -> tuple[int, int, int, int, str]:
    """Independent single-pass scrub: consecutive-duplicate-line drop,
    then token runs capped at two — both judged on the ORIGINAL arrays
    (non-cascading), exactly as the query declares."""
    lines = text.split("\n")
    lines_kept = [
        x for i, x in enumerate(lines) if i == 0 or x != lines[i - 1]
    ]
    toks = "\n".join(lines_kept).split(" ")
    toks_kept = [
        x
        for i, x in enumerate(toks)
        if i <= 1 or not (x == toks[i - 1] and toks[i - 1] == toks[i - 2])
    ]
    return (
        len(lines),
        len(lines_kept),
        len(toks),
        len(toks_kept),
        " ".join(toks_kept),
    )


@pytest.fixture(scope="module")
def rep_corpus_sf(tmp_path_factory) -> str:
    """Planted intra-doc repetition: consecutive duplicate lines (must
    drop), the same line NON-consecutively (must keep), token runs of
    exactly 2 (kept), 3 and 5 (capped at 2), a run spanning a line
    boundary, and degenerate shapes (empty text, single token, all-same
    doc)."""
    from tests.test_round13_advice import _write_documents

    rows, doc_id = [], 0
    texts = [
        "copy paste line\ncopy paste line\ncopy paste line\nfresh line",
        "menu bar\ncontent here\nmenu bar\ncontent again",  # non-consecutive: keep
        "ha ha ha ha ha and then ok ok done",  # run of 5 -> 2, run of 2 kept
        "na na batman na na",  # runs of exactly 2: untouched
        "end end\nend start start",  # run crosses a line boundary
        "",  # empty text
        "solo",
        "same same same\nsame same same\nsame same same",
    ]
    for text in texts:
        doc_id += 1
        rows.append((doc_id, text, "en", "web", len(text)))
    d = str(tmp_path_factory.mktemp("rep_corpus"))
    _write_documents(d, rows)
    return d


def test_repetition_scrub_matches_reference_on_planted_corpus(spark, rep_corpus_sf):
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{rep_corpus_sf}/documents.parquet')"
    ).fetchall()
    con.close()
    want = {d: _scrub_reference(t) for d, t in docs}
    got = {
        r.doc_id: (r.n_lines, r.n_lines_kept, r.n_toks, r.n_toks_kept, r.text_clean)
        for r in REGISTRY["repetition_scrub"].fn(spark, rep_corpus_sf).collect()
    }
    assert got == want
    # the removal branches really fired: consecutive dup lines dropped...
    assert got[1][:2] == (4, 2)
    assert got[1][4] == "copy paste line\nfresh line"
    # ...non-consecutive repeats kept...
    assert got[2][:2] == (4, 4)
    # ...runs capped at two, runs of two untouched
    assert got[3][4] == "ha ha and then ok ok done"
    assert got[4][4] == "na na batman na na"
    # the all-same doc: line dedup first, then the token cap inside it
    assert got[8][4] == "same same"


def _stats_rows(df) -> set[tuple]:
    return {
        (r.left_tok, r.right_tok, r.c12, r.c1x, r.a1, r.b2)
        for r in df.collect()
    }


def _direct_stats(spark, texts: list[str]):
    from mapreduce__spark.plans.tier2_pipeline import (
        _bigram_instances,
        _kn_stats_from_bigrams,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    big = (
        _bigram_instances(docs)
        .groupBy("left_tok", "right_tok")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    return _kn_stats_from_bigrams(big)


def test_kn_stats_merge_law_on_random_shard_splits(spark):
    """The mergeable-stats law: counting bigrams per shard, merging the
    partials by keyed addition, and re-deriving (c1x, a1, b2) equals the
    direct unsharded computation — for EVERY shard assignment. Randomized
    splits (seeded) over a corpus built to make naive addition of the
    type counts wrong: the same bigram appears in multiple shards, so
    additive a1/b2/T would double-count types."""
    import random

    from mapreduce__spark.plans.tier2_pipeline import (
        _bigram_instances,
        _kn_stats_from_bigrams,
    )
    from pyspark.sql import functions as F

    texts = [
        "san francisco fog over san francisco",
        "san francisco bay fog",
        "a day and a day and a day",
        "fog over the bay every day",
        "the chef and the fog",
        "solo",
    ]
    want = _stats_rows(_direct_stats(spark, texts))
    rng = random.Random(1404)
    for n_shards in (2, 3, 5):
        assign = [rng.randrange(n_shards) for _ in texts]
        docs = spark.createDataFrame(
            [(i + 1, t, assign[i]) for i, t in enumerate(texts)],
            "doc_id long, text string, shard int",
        )
        partials = [
            _bigram_instances(docs.filter(F.col("shard") == s).drop("shard"))
            .groupBy("left_tok", "right_tok")
            .agg(F.count(F.lit(1)).alias("c12"))
            for s in range(n_shards)
        ]
        merged = partials[0]
        for p in partials[1:]:
            merged = merged.unionByName(p)
        merged = merged.groupBy("left_tok", "right_tok").agg(
            F.sum("c12").alias("c12")
        )
        got = _stats_rows(_kn_stats_from_bigrams(merged))
        assert got == want, (n_shards, assign)
        # T re-derives as |merged|, and the shared-bigram trap is real:
        # summing per-shard type counts over-counts whenever shards share
        # a bigram type
        t_direct = len({(l, r) for (l, r, *_s) in want})
        assert merged.count() == t_direct
        t_additive = sum(p.count() for p in partials)
        if any(
            assign[0] != a for a in assign
        ):  # split is non-trivial for this corpus
            assert t_additive >= t_direct


def test_kn_stats_incremental_two_batch_scenario(spark):
    """The 100 TB operating mode: stats stand on batch A; batch B
    arrives; merging B's partial into A's stored bigram table and
    re-deriving equals a full recompute over A+B — no historical
    rescan. Also pins that the DERIVED columns genuinely change (B
    introduces new continuations for old words, so a1/b2 move)."""
    from mapreduce__spark.plans.tier2_pipeline import (
        _bigram_instances,
        _kn_stats_from_bigrams,
    )
    from pyspark.sql import functions as F

    batch_a = ["the fog rolled in", "the bay was cold"]
    batch_b = ["the chef rolled out", "fog over the chef"]

    def counts(texts, start_id):
        docs = spark.createDataFrame(
            [(start_id + i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        return (
            _bigram_instances(docs)
            .groupBy("left_tok", "right_tok")
            .agg(F.count(F.lit(1)).alias("c12"))
        )

    stored = counts(batch_a, 1)  # the persisted stats store after batch A
    incoming = counts(batch_b, 100)
    merged = (
        stored.unionByName(incoming)
        .groupBy("left_tok", "right_tok")
        .agg(F.sum("c12").alias("c12"))
    )
    got = _stats_rows(_kn_stats_from_bigrams(merged))
    want = _stats_rows(_direct_stats(spark, batch_a + batch_b))
    assert got == want
    # 'the' gains continuations in batch B: its a1 must exceed batch A's
    a1_a = {r.left_tok: r.a1 for r in _kn_stats_from_bigrams(stored).collect()}
    a1_ab = {l: a for (l, _r, _c, _cx, a, _b) in got}
    assert a1_ab["the"] > a1_a["the"]


def test_incremental_kn_stats_matches_oracle_on_fixture(spark, ppl_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    q = REGISTRY["incremental_kn_stats"]
    ok, msg = compare_with_oracle(q.fn(spark, ppl_corpus_sf), q.oracle, ppl_corpus_sf)
    assert ok, msg


def _ks_reference(xs: list[int], ys: list[int]) -> tuple[int, int]:
    """Brute-force two-sample KS as the exact rational (d_num, d_den):
    evaluate |n_b*F_a(v) - n_a*F_b(v)| at every observed value."""
    vals = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    d = 0
    for v in vals:
        fa = sum(1 for x in xs if x <= v)
        fb = sum(1 for y in ys if y <= v)
        d = max(d, abs(nb * fa - na * fb))
    return d, na * nb


@pytest.fixture(scope="module")
def ks_corpus_sf(tmp_path_factory):
    """Four sources with known relationships: 'same_a'/'same_b' have
    IDENTICAL length distributions (D must be 0), 'low' and 'high' have
    DISJOINT length supports (D must be n_a*n_b), and the seeded random
    lengths pin the general case against the brute-force reference.
    Returns (sf_dir, lengths-per-source)."""
    import random

    from tests.test_round13_advice import _write_documents

    rng = random.Random(1414)
    lengths = {
        "same_a": [10, 20, 20, 30, 40],
        "same_b": [10, 20, 20, 30, 40],
        "low": [1, 2, 2, 3],
        "high": [100, 101, 102],
    }
    lengths["rand_a"] = [rng.randrange(1, 25) for _ in range(37)]
    lengths["rand_b"] = [rng.randrange(5, 40) for _ in range(23)]
    rows, doc_id = [], 0
    for source, ls in lengths.items():
        for n in ls:
            doc_id += 1
            rows.append((doc_id, "x " * 3, "en", source, n))
    d = str(tmp_path_factory.mktemp("ks_corpus"))
    _write_documents(d, rows)
    return d, lengths


def test_ks_test_lengths_laws_and_reference(spark, ks_corpus_sf):
    sf_dir, lengths = ks_corpus_sf
    got = {
        (r.source_a, r.source_b): (r.n_a, r.n_b, r.d_num, r.d_den)
        for r in REGISTRY["ks_test_lengths"].fn(spark, sf_dir).collect()
    }
    names = sorted(lengths)
    assert set(got) == {
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
    }
    for (a, b), (n_a, n_b, d_num, d_den) in got.items():
        assert (n_a, n_b) == (len(lengths[a]), len(lengths[b]))
        assert d_den == n_a * n_b
        ref = _ks_reference(lengths[a], lengths[b])
        assert (d_num, d_den) == ref, (a, b)
        assert 0 <= d_num <= d_den
    # identical distributions: D = 0; disjoint supports: D = 1 exactly
    assert got[("same_a", "same_b")][2] == 0
    assert got[("high", "low")][2] == got[("high", "low")][3]


def test_ks_test_lengths_matches_oracle_on_fixture(spark, ks_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    sf_dir, _ = ks_corpus_sf
    q = REGISTRY["ks_test_lengths"]
    ok, msg = compare_with_oracle(q.fn(spark, sf_dir), q.oracle, sf_dir)
    assert ok, msg


def _novelty_reference(docs: list[tuple[int, str]]) -> dict[int, tuple[int, int]]:
    """Independent novelty scorer: distinct 3-grams per doc, first_doc =
    min doc_id per gram, novel = grams whose first_doc is this doc."""
    grams = {
        doc_id: {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        for doc_id, toks in ((d, t.split(" ")) for d, t in docs)
    }
    first: dict[str, int] = {}
    for doc_id in sorted(grams):
        for gm in grams[doc_id]:
            first.setdefault(gm, doc_id)
            first[gm] = min(first[gm], doc_id)
    return {
        d: (len(gs), sum(1 for gm in gs if first[gm] == d))
        for d, gs in grams.items()
        if gs
    }


@pytest.fixture(scope="module")
def novelty_corpus_sf(tmp_path_factory):
    from tests.test_round13_advice import _write_documents

    texts = [
        "the fog rolled over the bay tonight",        # 1: all novel
        "the fog rolled over the bay tonight",        # 2: exact dup -> 0 novel
        "fog rolled over the hills at dawn",          # 3: partial overlap
        "a completely different sentence entirely here",  # 4: all novel
        "the fog rolled over the bay tonight again",  # 5: one novel gram
        "too short",                                   # 6: no 3-grams, absent
        "rep rep rep rep",                             # 7: ONE distinct gram
    ]
    rows = [
        (i + 1, t, "en", "web", len(t)) for i, t in enumerate(texts)
    ]
    d = str(tmp_path_factory.mktemp("novelty_corpus"))
    _write_documents(d, rows)
    return d, [(i + 1, t) for i, t in enumerate(texts)]


def test_doc_ngram_novelty_matches_reference_and_laws(spark, novelty_corpus_sf):
    sf_dir, docs = novelty_corpus_sf
    want = _novelty_reference(docs)
    got = {
        r.doc_id: (r.n_grams, r.n_novel)
        for r in REGISTRY["doc_ngram_novelty"].fn(spark, sf_dir).collect()
    }
    assert got == want
    assert got[1] == (5, 5)          # first doc: everything is novel
    assert got[2] == (5, 0)          # exact duplicate: nothing is novel
    assert got[5][1] == 1            # one appended token -> one new gram
    assert 6 not in got              # <3 tokens: no grams, absent
    assert got[7] == (1, 1)          # within-doc repeats count ONCE
    for n_grams, n_novel in got.values():
        assert 0 <= n_novel <= n_grams


def test_doc_ngram_novelty_first_seen_merges_by_min(spark, novelty_corpus_sf):
    """The incremental state law: the gram -> first_doc table for A+B
    equals the keyed MIN of the tables computed on A and B separately —
    new-batch ingest never rescans history (incremental_kn_stats'
    additive-state story, with min for sum)."""
    from mapreduce__spark.functions.text import tokenize, word_ngrams
    from pyspark.sql import functions as F

    _, docs = novelty_corpus_sf

    def first_seen(batch):
        df = spark.createDataFrame(batch, "doc_id long, text string")
        g = df.select(
            "doc_id",
            F.explode(word_ngrams(tokenize(F.col("text")))).alias("gram"),
        )
        return g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))

    merged = (
        first_seen(docs[:3])
        .unionByName(first_seen(docs[3:]))
        .groupBy("gram")
        .agg(F.min("first_doc").alias("first_doc"))
    )
    direct = first_seen(docs)
    assert {(r.gram, r.first_doc) for r in merged.collect()} == {
        (r.gram, r.first_doc) for r in direct.collect()
    }


def test_doc_ngram_novelty_matches_oracle_on_fixture(spark, novelty_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    sf_dir, _ = novelty_corpus_sf
    q = REGISTRY["doc_ngram_novelty"]
    ok, msg = compare_with_oracle(q.fn(spark, sf_dir), q.oracle, sf_dir)
    assert ok, msg


def _jsd_reference(
    a: dict[str, int], b: dict[str, int]
) -> tuple[int, int, int, int, int]:
    """Brute-force JSD micro-nat sums exactly as declared: per token one
    IEEE division, floor(ln(x)*1e6 + 0.5), weighted by the exact count."""
    import math

    na, nb = sum(a.values()), sum(b.values())
    toks = set(a) | set(b)
    jp = jq = 0
    for w in toks:
        aw, bw = a.get(w, 0), b.get(w, 0)
        den = float(aw * nb + bw * na)
        if aw > 0:
            jp += aw * int(math.floor(math.log(2 * aw * nb / den) * 1e6 + 0.5))
        if bw > 0:
            jq += bw * int(math.floor(math.log(2 * bw * na / den) * 1e6 + 0.5))
    return na, nb, len(toks), jp, jq


@pytest.fixture(scope="module")
def jsd_corpus_sf(tmp_path_factory):
    """Sources with known lexical relationships: 'twin_a'/'twin_b' have
    IDENTICAL token multisets (JSD exactly 0), 'alien' shares no token
    with anyone (per-occurrence ln 2 against each), and 'mix' overlaps
    partially; seeded random texts pin the general case."""
    import random

    from tests.test_round13_advice import _write_documents

    rng = random.Random(1424)
    vocab = ["fog", "bay", "chef", "day", "hill", "rolled", "over", "the"]
    sources = {
        "twin_a": ["fog bay fog chef", "day day over the"],
        "twin_b": ["fog bay fog chef", "day day over the"],
        "alien": ["zyx wvu zyx", "qqq zyx wvu"],
        "mix": ["fog zyx day", "the chef qqq"],
        "rand": [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 9)))
            for _ in range(5)
        ],
    }
    rows, doc_id = [], 0
    for source, texts in sources.items():
        for t in texts:
            doc_id += 1
            rows.append((doc_id, t, "en", source, len(t)))
    d = str(tmp_path_factory.mktemp("jsd_corpus"))
    _write_documents(d, rows)
    counts = {
        s: {
            w: sum(t.split(" ").count(w) for t in texts)
            for w in set(" ".join(texts).split(" "))
        }
        for s, texts in sources.items()
    }
    return d, counts


def test_jsd_source_divergence_reference_and_laws(spark, jsd_corpus_sf):
    sf_dir, counts = jsd_corpus_sf
    got = {
        (r.source_a, r.source_b): (r.n_a, r.n_b, r.n_types, r.jsd_p_micro, r.jsd_q_micro)
        for r in REGISTRY["jsd_source_divergence"].fn(spark, sf_dir).collect()
    }
    names = sorted(counts)
    assert set(got) == {
        (x, y) for i, x in enumerate(names) for y in names[i + 1 :]
    }
    ln2_micro = 693147  # floor(ln(2)*1e6 + 0.5)
    for (x, y), row in got.items():
        assert row == _jsd_reference(counts[x], counts[y]), (x, y)
        n_a, n_b, _, jp, jq = row
        # JSD is bounded by ln 2: each side's mean micro-nat <= ln2
        assert jp <= n_a * ln2_micro and jq <= n_b * ln2_micro
        # KL to the mixture is non-negative (quantization slack: one
        # half-ulp of 1e-6 nat per token occurrence)
        assert jp >= -(n_a // 2 + 1) and jq >= -(n_b // 2 + 1)
    # identical distributions: exactly zero on both sides
    assert got[("twin_a", "twin_b")][3:] == (0, 0)
    # disjoint vocabularies: exactly ln2 per occurrence on both sides
    n_a, n_b, _, jp, jq = got[("alien", "twin_a")]
    assert (jp, jq) == (n_a * ln2_micro, n_b * ln2_micro)


def test_jsd_source_divergence_matches_oracle_on_fixture(spark, jsd_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    sf_dir, _ = jsd_corpus_sf
    q = REGISTRY["jsd_source_divergence"]
    ok, msg = compare_with_oracle(q.fn(spark, sf_dir), q.oracle, sf_dir)
    assert ok, msg


def _hill_reference(counts: dict[str, int], k_cap: int = 50):
    """Brute-force Hill emission: ranks by (count desc, token), pivot at
    k+1, per-term floor-quantized micro-log ratio."""
    import math

    ranked = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
    if len(ranked) < 2:
        return None
    k = min(k_cap, len(ranked) - 1)
    f_k1 = ranked[k][1]
    s = sum(
        int(math.floor(math.log(c / f_k1) * 1e6 + 0.5))
        for _, c in ranked[:k]
    )
    return k, f_k1, s


@pytest.fixture(scope="module")
def zipf_corpus_sf(tmp_path_factory):
    """Token frequencies planted as exact geometric series (ln ratios
    are known multiples of ln 2), a single-type source that must be
    ABSENT (no pivot exists), and a small-vocab source where k truncates
    to vocab-1."""
    from tests.test_round13_advice import _write_documents

    def rep(freqs: dict[str, int]) -> str:
        return " ".join(w for w, c in sorted(freqs.items()) for _ in range(c))

    sources = {
        "geo": {"a": 16, "b": 8, "c": 4, "d": 2, "e": 1},
        "flat": {"u": 3, "v": 3, "w": 3, "x": 3},
        "lone": {"only": 7},
        "duo": {"p": 5, "q": 1},
    }
    rows, doc_id = [], 0
    for source, freqs in sources.items():
        doc_id += 1
        text = rep(freqs)
        rows.append((doc_id, text, "en", source, len(text)))
    d = str(tmp_path_factory.mktemp("zipf_corpus"))
    _write_documents(d, rows)
    return d, sources


def test_zipf_tail_index_reference_and_laws(spark, zipf_corpus_sf):
    import math

    sf_dir, sources = zipf_corpus_sf
    got = {
        r.source: (r.k, r.f_k1, r.hill_micro_sum)
        for r in REGISTRY["zipf_tail_index"].fn(spark, sf_dir).collect()
    }
    assert "lone" not in got  # single type: no pivot, absent
    for s, freqs in sources.items():
        ref = _hill_reference(freqs)
        if ref is None:
            continue
        assert got[s] == ref, s
    # geometric series: pivot is the count-1 type, terms are exact
    # multiples of ln 2 -> sum = (4+3+2+1) * micro-ln2 with per-term
    # floor rounding
    want = sum(int(math.floor(i * math.log(2) * 1e6 + 0.5)) for i in (4, 3, 2, 1))
    assert got["geo"] == (4, 1, want)
    # an all-equal-frequency source: every ratio is 1, the sum is 0
    # (alpha diverges -> maximally non-Zipfian, and exactly representable)
    assert got["flat"] == (3, 3, 0)
    # k truncates to vocab-1 when the vocabulary is small
    assert got["duo"][0] == 1


def test_zipf_tail_index_scale_invariance(spark, zipf_corpus_sf, tmp_path_factory):
    """Hill reads frequency RATIOS: writing every document 3x multiplies
    every count by 3 and must leave (k, hill_micro_sum) unchanged (the
    pivot count itself scales)."""
    from tests.test_round13_advice import _write_documents

    sf_dir, sources = zipf_corpus_sf
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    rows = []
    for i in range(3):
        rows += [(d + 100 * i, t, l, s, n) for d, t, l, s, n in docs]
    d3 = str(tmp_path_factory.mktemp("zipf_x3"))
    _write_documents(d3, rows)
    base = {
        r.source: (r.k, r.hill_micro_sum)
        for r in REGISTRY["zipf_tail_index"].fn(spark, sf_dir).collect()
    }
    tripled = {
        r.source: (r.k, r.hill_micro_sum)
        for r in REGISTRY["zipf_tail_index"].fn(spark, d3).collect()
    }
    assert tripled == base


def test_zipf_tail_index_matches_oracle_on_fixture(spark, zipf_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    sf_dir, _ = zipf_corpus_sf
    q = REGISTRY["zipf_tail_index"]
    ok, msg = compare_with_oracle(q.fn(spark, sf_dir), q.oracle, sf_dir)
    assert ok, msg


def test_repetition_scrub_idempotent_and_matches_oracle(spark, rep_corpus_sf):
    """Scrubbing a scrubbed corpus is a fixpoint (both rules only ever
    REMOVE a repeat that the first pass would also have removed), and
    the planted corpus passes the engine differential."""
    from tests.oracle_harness import compare_with_oracle

    rows = REGISTRY["repetition_scrub"].fn(spark, rep_corpus_sf).collect()
    for r in rows:
        twice = _scrub_reference(r.text_clean)
        assert twice[4] == r.text_clean, r.doc_id
    q = REGISTRY["repetition_scrub"]
    ok, msg = compare_with_oracle(q.fn(spark, rep_corpus_sf), q.oracle, rep_corpus_sf)
    assert ok, msg


# --------------------------------------------------------------------------
# knn_graph_mutual: independent pure-Python reimplementation + graph laws
# --------------------------------------------------------------------------


def _mutual_knn_reference(sf_dir: str, k: int, n_bits: int):
    """Pure-Python mutual-kNN twin of operators.similarity.
    mutual_knn_edges, reproducing Spark's EXACT float chains: bucket
    dots and cosine folds are sequential left-folds over IEEE doubles
    in dimension order, so every comparison below sees the same bits
    the engine computed."""
    import duckdb
    import math

    from mapreduce__spark.operators.similarity import parity_plane_sign

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    vecs = {int(vid): [float(x) for x in e] for vid, e in rows}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    buckets = {}
    for vid, v in vecs.items():
        bucket = 0
        for j in range(n_bits):
            acc = 0.0
            for i, x in enumerate(v, start=1):
                acc = acc + x * parity_plane_sign(i, j)
            if acc > 0:
                bucket += 1 << j
        buckets[vid] = bucket

    def cos_micro(a, b):
        na = math.sqrt(fold_dot(a, a))
        nb = math.sqrt(fold_dot(b, b))
        denom = na * nb
        c = -1.0 if denom == 0.0 else fold_dot(a, b) / denom
        return int(math.floor(c * 1000000.0 + 0.5))

    topk = {}
    for qid in vecs:
        cands = [
            (-cos_micro(vecs[qid], vecs[nid]), nid)
            for nid in vecs
            if nid != qid and buckets[nid] == buckets[qid]
        ]
        cands.sort()
        topk[qid] = {nid: -neg for neg, nid in cands[:k]}

    edges = set()
    for qid, nbrs in topk.items():
        for nid, sm in nbrs.items():
            if qid < nid and qid in topk.get(nid, {}):
                edges.add((qid, nid, sm))
    return edges


def test_knn_graph_mutual_matches_pure_python_reference(spark, sf_small):
    from mapreduce__spark.plans.tier2_embedding import (
        ANN_BUCKET_BITS,
        KNN_GRAPH_K,
    )

    got = {
        (int(r.src_id), int(r.dst_id), int(r.score_micro))
        for r in REGISTRY["knn_graph_mutual"].fn(spark, sf_small).collect()
    }
    want = _mutual_knn_reference(sf_small, k=KNN_GRAPH_K, n_bits=ANN_BUCKET_BITS)
    assert got == want
    assert got, "sf0.001 graph must be non-empty for attestation to mean anything"


def test_knn_graph_mutual_graph_laws(spark, sf_small):
    """Canonical orientation, no duplicate pairs, and the mutual-degree
    bound: a node can appear in at most k surviving edges."""
    from collections import Counter

    from mapreduce__spark.plans.tier2_embedding import KNN_GRAPH_K

    rows = REGISTRY["knn_graph_mutual"].fn(spark, sf_small).collect()
    pairs = [(int(r.src_id), int(r.dst_id)) for r in rows]
    assert all(s < d for s, d in pairs)
    assert len(pairs) == len(set(pairs))
    deg = Counter()
    for s, d in pairs:
        deg[s] += 1
        deg[d] += 1
    assert all(c <= KNN_GRAPH_K for c in deg.values()), deg.most_common(3)


# --------------------------------------------------------------------------
# dsir_importance_weights: zero-law, pure-Python reference, oracle fixture
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dsir_corpus_sf(tmp_path_factory) -> str:
    """Mixed corpus: three gate-passing docs (20+ tokens, no digits),
    two gate-failing ones (a 6-token short doc and a digit-heavy doc),
    and a 1-token doc that has no bigrams and must drop out."""
    from tests.test_round13_advice import _write_documents

    passing = [
        "the quick brown fox jumps over the lazy dog and runs back home "
        "to rest under the old oak tree near the river",
        "a clean well lighted place was all he wanted on a cold night "
        "when the wind blew hard across the empty square outside",
        "we sailed along the coast for three days and saw many small "
        "islands covered in pine trees and white sand beaches there",
    ]
    failing = [
        "short doc fails the gate",
        "4531 9921 8402 1177 3390 5512 8876 2214 9903 4411 7788 1122 "
        "3344 5566 7788 9900 1234 5678 9012 3456 7890 1357",
    ]
    rows = []
    for i, text in enumerate(passing + failing + ["solo"], start=1):
        rows.append((i, text, "en", "web" if i <= 3 else "crawl", len(text)))
    d = str(tmp_path_factory.mktemp("dsir_corpus"))
    _write_documents(d, rows)
    return d


@pytest.fixture(scope="module")
def dsir_allpass_sf(tmp_path_factory) -> str:
    """Every doc passes the quality gate => target == raw."""
    from tests.test_round13_advice import _write_documents

    base = (
        "every document in this corpus passes the quality gate because "
        "it has enough words and not a single digit anywhere in sight "
    )
    rows = [
        (i, base + f"variant {'x' * i}", "en", "web", 1) for i in range(1, 5)
    ]
    d = str(tmp_path_factory.mktemp("dsir_allpass"))
    _write_documents(d, rows)
    return d


def _dsir_reference(sf_dir: str, buckets: int):
    """Pure-Python DSIR twin: hashlib md5 buckets, add-1 smoothed
    bucket frequencies, floor(ln * 1e6 + 0.5) per bucket, exact int
    sums per doc."""
    import duckdb
    import hashlib
    import math

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    inst = []  # (doc_id, keep, bucket)
    for doc_id, text in rows:
        toks = text.split(" ")
        digits = sum(ch.isdigit() for ch in text)
        keep = (
            20 <= len(toks) <= 2000
            and len(text) > 0
            and digits / len(text) < 0.3
        )
        for a, b in zip(toks, toks[1:]):
            h = hashlib.md5((a + " " + b + "#dsir").encode()).hexdigest()
            inst.append((int(doc_id), keep, int(h[:8], 16) % buckets))
    c_r, c_t = {}, {}
    for _d, keep, b in inst:
        c_r[b] = c_r.get(b, 0) + 1
        if keep:
            c_t[b] = c_t.get(b, 0) + 1
    n_r = sum(c_r.values())
    n_t = sum(c_t.values())
    lr = {
        b: math.floor(
            math.log(
                ((c_t.get(b, 0) + 1) * (n_r + buckets))
                / ((c_r[b] + 1) * (n_t + buckets))
            )
            * 1000000
            + 0.5
        )
        for b in c_r
    }
    out = {}
    for d, _keep, b in inst:
        n, s = out.get(d, (0, 0))
        out[d] = (n + 1, s + lr[b])
    return {(d, n, s) for d, (n, s) in out.items()}


def test_dsir_matches_pure_python_reference(spark, dsir_corpus_sf):
    from mapreduce__spark.plans.tier2_pipeline import DSIR_BUCKETS

    got = {
        (int(r.doc_id), int(r.n_grams), int(r.dsir_micro_sum))
        for r in REGISTRY["dsir_importance_weights"].fn(spark, dsir_corpus_sf).collect()
    }
    want = _dsir_reference(dsir_corpus_sf, DSIR_BUCKETS)
    assert got == want
    # the 1-token doc must be absent; gate-passing docs must outweigh
    # the digit-heavy crawl doc
    ids = {d for d, _n, _s in got}
    assert 6 not in ids
    by_id = {d: s for d, _n, s in got}
    assert by_id[1] > by_id[5]


def test_dsir_all_pass_means_zero_weights(spark, dsir_allpass_sf):
    """target == raw => (c_t+1)(N_r+B) == (c_r+1)(N_t+B) bucket-wise,
    so every quantized log-ratio — and every doc weight — is exactly 0."""
    rows = REGISTRY["dsir_importance_weights"].fn(spark, dsir_allpass_sf).collect()
    assert rows
    assert all(int(r.dsir_micro_sum) == 0 for r in rows)


def test_dsir_matches_oracle_on_fixture(spark, dsir_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    q = REGISTRY["dsir_importance_weights"]
    ok, msg = compare_with_oracle(q.fn(spark, dsir_corpus_sf), q.oracle, dsir_corpus_sf)
    assert ok, msg


# --------------------------------------------------------------------------
# readability_fk: pure-Python reference, sentence-split monotonicity law
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fk_corpus_sf(tmp_path_factory) -> str:
    """Punctuated fixture exercising every heuristic branch: multi-
    sentence docs, '!?' runs counting as ONE terminator, vowel-less
    tokens (acronyms, numbers), and an unpunctuated doc floored to one
    sentence."""
    from tests.test_round13_advice import _write_documents

    corpus = [
        "the cat sat on the mat. it was a big fluffy cat! was it not?",
        "reading scores depend on syllable counts. vowel groups are the proxy.",
        "no punctuation here just a long flat run of simple words going on",
        "the committee on information technology convened. 42 pdf xml bzz files arrived?!",
        "a. b. c. d.",
    ]
    rows = [
        (i, text, "en", "web", len(text))
        for i, text in enumerate(corpus, start=1)
    ]
    d = str(tmp_path_factory.mktemp("fk_corpus"))
    _write_documents(d, rows)
    return d


def _fk_reference(sf_dir: str):
    import duckdb
    import math
    import re

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    out = set()
    for doc_id, text in rows:
        toks = text.split(" ")
        w = len(toks)
        s = max(1, len(re.findall(r"[.!?]+", text)))
        low = text.lower()
        syl = len(re.findall(r"[aeiouy]+", low)) + sum(
            1 for t in low.split(" ") if not re.search(r"[aeiouy]", t)
        )
        fk = math.floor(39.0 * w / s + 1180.0 * syl / w - 1559.0 + 0.5)
        out.add((int(doc_id), w, s, syl, fk))
    return out


def test_readability_fk_matches_pure_python_reference(spark, fk_corpus_sf):
    got = {
        (
            int(r.doc_id),
            int(r.n_words),
            int(r.n_sentences),
            int(r.n_syllables),
            int(r.fk_centi),
        )
        for r in REGISTRY["readability_fk"].fn(spark, fk_corpus_sf).collect()
    }
    assert got == _fk_reference(fk_corpus_sf)
    # branch coverage: the '?!' run in doc 4 counts once; doc 3 floors
    # to one sentence; doc 4 has vowel-less tokens (42, pdf, xml, bzz)
    by_id = {t[0]: t for t in got}
    assert by_id[3][2] == 1
    assert by_id[4][2] == 2  # the '.' and the single '?!' run
    assert by_id[1][2] == 3


def test_readability_fk_more_sentences_never_raise_grade(
    spark, fk_corpus_sf, tmp_path_factory
):
    """Splitting a doc into more sentences (same words, same syllables)
    can only lower the words-per-sentence term, so fk_centi is
    non-increasing — checked by replacing every token boundary after
    the midpoint with a period-suffixed token, which leaves W and the
    vowel structure intact and raises S."""
    import duckdb

    from tests.test_round13_advice import _write_documents

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{fk_corpus_sf}/documents.parquet')"
    ).fetchall()
    split_rows = []
    for doc_id, text in rows:
        toks = text.split(" ")
        mid = len(toks) // 2
        toks[mid] = toks[mid] + "."
        split_rows.append((int(doc_id), " ".join(toks), "en", "web", 1))
    d = str(tmp_path_factory.mktemp("fk_split"))
    _write_documents(d, split_rows)
    base = {
        int(r.doc_id): (int(r.fk_centi), int(r.n_sentences))
        for r in REGISTRY["readability_fk"].fn(spark, fk_corpus_sf).collect()
    }
    split = {
        int(r.doc_id): (int(r.fk_centi), int(r.n_sentences))
        for r in REGISTRY["readability_fk"].fn(spark, d).collect()
    }
    for doc_id, (fk0, s0) in base.items():
        fk1, s1 = split[doc_id]
        assert s1 >= s0, doc_id
        if s1 > s0:
            assert fk1 <= fk0, doc_id


def test_readability_fk_matches_oracle_on_fixture(spark, fk_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    q = REGISTRY["readability_fk"]
    ok, msg = compare_with_oracle(q.fn(spark, fk_corpus_sf), q.oracle, fk_corpus_sf)
    assert ok, msg


# --------------------------------------------------------------------------
# session_window_agg: exact-gap boundary semantics, oracle fixture
# --------------------------------------------------------------------------


def _write_events_ns(d: str, rows: list[tuple]) -> None:
    """Single-file events.parquet with TIMESTAMP(NANOS) — the real
    testdata's physical type, so the loader's nanosAsLong path is the
    one under test — plus symlinks for every other table."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce__spark.sources.tables import TABLES
    from tests.conftest import SF_SMALL

    cols = list(zip(*rows))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("ns")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, f"{d}/events.parquet", store_schema=False)
    for t in TABLES:
        if t != "events":
            os.symlink(f"{SF_SMALL}/{t}.parquet", f"{d}/{t}.parquet")


@pytest.fixture(scope="module")
def session_gap_sf(tmp_path_factory) -> str:
    """User 1 fires events exactly 1800s apart (the boundary), user 2
    at 1799s gaps (inside), user 3 at 1801s gaps (outside)."""
    base = 1_700_000_000_000_000_000  # ns epoch
    rows = []
    eid = 0
    for user, gap_s in ((1, 1800), (2, 1799), (3, 1801)):
        for i in range(3):
            eid += 1
            rows.append(
                (eid, base + i * gap_s * 10**9, user, "click", 1.25, "{}")
            )
    d = str(tmp_path_factory.mktemp("session_gap"))
    _write_events_ns(d, rows)
    return d


def test_session_window_exact_gap_merges_inclusively(spark, session_gap_sf):
    """The native operator's merge boundary is INCLUSIVE: an event
    arriving EXACTLY gap after its predecessor merges (user 1, 1800s
    gaps -> ONE session), 1801s splits (user 3), and the lag-based
    sessionization query agrees on every session count — this fixture
    is what falsified the first draft's `>=` oracle, so it stays as
    the regression pin for the off-by-one a port would reintroduce."""
    native = REGISTRY["session_window_agg"].fn(spark, session_gap_sf).collect()
    manual = REGISTRY["sessionization"].fn(spark, session_gap_sf).collect()
    native_counts = {}
    for r in native:
        native_counts[int(r.user_id)] = native_counts.get(int(r.user_id), 0) + 1
    manual_counts = {}
    for r in manual:
        manual_counts[int(r.user_id)] = manual_counts.get(int(r.user_id), 0) + 1
    assert native_counts == {1: 1, 2: 1, 3: 3}
    assert manual_counts == native_counts
    # native end = last event + gap; manual end = last event
    for user, gap_s in ((1, 1800), (2, 1799)):
        sess = [r for r in native if int(r.user_id) == user]
        assert len(sess) == 1
        delta = sess[0].session_end - sess[0].session_start
        assert delta.total_seconds() == 2 * gap_s + 1800, user


def test_session_window_agg_matches_oracle_on_fixture(spark, session_gap_sf):
    from tests.oracle_harness import compare_with_oracle

    q = REGISTRY["session_window_agg"]
    ok, msg = compare_with_oracle(q.fn(spark, session_gap_sf), q.oracle, session_gap_sf)
    assert ok, msg


# --------------------------------------------------------------------------
# keyness_llr: pure-Python reference, duplication-doubling law
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def keyness_corpus_sf(tmp_path_factory) -> str:
    """Two sources with planted signatures: 'legal' says 'hereby' and
    'party' far above base rate, 'chat' says 'lol'; shared filler words
    are near-independent and must not outrank the signatures."""
    from tests.test_round13_advice import _write_documents

    corpus = [
        ("the party shall hereby agree that the party may hereby act", "legal"),
        ("hereby the party notes the terms and the party signs", "legal"),
        ("the terms are the terms and that is that", "legal"),
        ("lol that was fun lol see you soon", "chat"),
        ("we went out and lol it rained on us lol", "chat"),
        ("see you at the party lol", "chat"),
    ]
    rows = [
        (i, text, "en", src, len(text))
        for i, (text, src) in enumerate(corpus, start=1)
    ]
    d = str(tmp_path_factory.mktemp("keyness_corpus"))
    _write_documents(d, rows)
    return d


def _keyness_reference(sf_dir: str, top_k: int):
    import duckdb
    import math

    rows = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    xy, rowt, colt = {}, {}, {}
    for source, text in rows:
        for tok in text.split(" "):
            xy[(source, tok)] = xy.get((source, tok), 0) + 1
            rowt[source] = rowt.get(source, 0) + 1
            colt[tok] = colt.get(tok, 0) + 1
    n = sum(rowt.values())

    def q(num, den):
        return math.floor(math.log(num / den) * 1000000 + 0.5)

    per_source = {}
    for (source, tok), a in xy.items():
        ns, ct = rowt[source], colt[tok]
        if a * n <= ns * ct:
            continue
        b, c = ct - a, ns - a
        d = n - ns - b
        g2 = 2 * (
            (a * q(a * n, ns * ct) if a else 0)
            + (b * q(b * n, (n - ns) * ct) if b else 0)
            + (c * q(c * n, ns * (n - ct)) if c else 0)
            + (d * q(d * n, (n - ns) * (n - ct)) if d else 0)
        )
        per_source.setdefault(source, []).append((-g2, tok, a))
    out = set()
    for source, terms in per_source.items():
        terms.sort()
        for rnk, (neg_g2, tok, a) in enumerate(terms[:top_k], start=1):
            out.add((source, tok, a, -neg_g2, rnk))
    return out


def test_keyness_llr_matches_pure_python_reference(spark, keyness_corpus_sf):
    from mapreduce__spark.plans.tier2_text import KEYNESS_TOP_K

    got = {
        (r.source, r.tok, int(r.n_in_source), int(r.g2_micro), int(r.rnk))
        for r in REGISTRY["keyness_llr"].fn(spark, keyness_corpus_sf).collect()
    }
    assert got == _keyness_reference(keyness_corpus_sf, KEYNESS_TOP_K)
    # the planted signatures surface: 'lol' is chat's #1 and 'hereby'
    # makes legal's list (the filler 'the' can legitimately outrank it
    # on raw count — keyness is count-weighted)
    top = {r[0]: r[1] for r in got if r[4] == 1}
    assert top["chat"] == "lol"
    legal_terms = {r[1] for r in got if r[0] == "legal"}
    assert "hereby" in legal_terms and "party" in legal_terms


def test_keyness_llr_duplication_doubles_g2(
    spark, keyness_corpus_sf, tmp_path_factory
):
    """Uniformly duplicating the corpus doubles every contingency cell,
    leaves every ln ratio bit-identical (the quantized per-cell terms
    are ratio functions), and therefore exactly doubles g2_micro with
    ranks preserved."""
    import duckdb

    from tests.test_round13_advice import _write_documents

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{keyness_corpus_sf}/documents.parquet')"
    ).fetchall()
    doubled = []
    for doc_id, text, lang, source in rows:
        doubled.append((int(doc_id), text, lang, source, 1))
        doubled.append((int(doc_id) + 1000, text, lang, source, 1))
    d = str(tmp_path_factory.mktemp("keyness_doubled"))
    _write_documents(d, doubled)
    base = {
        (r.source, r.tok): (int(r.g2_micro), int(r.rnk))
        for r in REGISTRY["keyness_llr"].fn(spark, keyness_corpus_sf).collect()
    }
    twice = {
        (r.source, r.tok): (int(r.g2_micro), int(r.rnk))
        for r in REGISTRY["keyness_llr"].fn(spark, d).collect()
    }
    assert set(base) == set(twice)
    for key, (g2, rnk) in base.items():
        assert twice[key] == (2 * g2, rnk), key


def test_keyness_llr_matches_oracle_on_fixture(spark, keyness_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    q = REGISTRY["keyness_llr"]
    ok, msg = compare_with_oracle(
        q.fn(spark, keyness_corpus_sf), q.oracle, keyness_corpus_sf
    )
    assert ok, msg


# --------------------------------------------------------------------------
# temporal_split_events: boundary-ordering law, exact-count law, oracle
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def temporal_split_sf(tmp_path_factory) -> str:
    """Users with n = 1, 4 (floor(n/5)=0: all train), 5 (1/1/3), 10
    (2/2/6), and 11 (2/2/7) — the integer-rule edge cases."""
    base = 1_700_000_000_000_000_000
    rows, eid = [], 0
    for user, n in ((1, 1), (2, 4), (3, 5), (4, 10), (5, 11)):
        for i in range(n):
            eid += 1
            rows.append((eid, base + i * 60 * 10**9, user, "click", 1.0, "{}"))
    d = str(tmp_path_factory.mktemp("temporal_split"))
    _write_events_ns(d, rows)
    return d


def test_temporal_split_counts_and_ordering(spark, temporal_split_sf):
    rows = REGISTRY["temporal_split_events"].fn(spark, temporal_split_sf).collect()
    counts = {}
    spans = {}
    for r in rows:
        counts[(int(r.user_id), r.split)] = int(r.n_events)
        spans[(int(r.user_id), r.split)] = (r.first_ts, r.last_ts)
    assert counts == {
        (1, "train"): 1,
        (2, "train"): 4,
        (3, "train"): 3, (3, "val"): 1, (3, "test"): 1,
        (4, "train"): 6, (4, "val"): 2, (4, "test"): 2,
        (5, "train"): 7, (5, "val"): 2, (5, "test"): 2,
    }
    # leakage-free boundary law within every user
    for user in (3, 4, 5):
        assert spans[(user, "train")][1] < spans[(user, "val")][0]
        assert spans[(user, "val")][1] < spans[(user, "test")][0]


def test_temporal_split_matches_oracle_on_fixture(spark, temporal_split_sf):
    from tests.oracle_harness import compare_with_oracle

    q = REGISTRY["temporal_split_events"]
    ok, msg = compare_with_oracle(
        q.fn(spark, temporal_split_sf), q.oracle, temporal_split_sf
    )
    assert ok, msg


def test_temporal_split_boundary_law_on_real_data(spark, sf_small):
    """On the real sf0.001 events: per user, every train ts <= every
    val ts <= every test ts (ties across the cut are legal when equal
    timestamps straddle it — the event_id tiebreak orders them)."""
    rows = REGISTRY["temporal_split_events"].fn(spark, sf_small).collect()
    spans = {}
    for r in rows:
        spans[(int(r.user_id), r.split)] = (r.first_ts, r.last_ts)
    users = {u for u, _s in spans}
    assert users
    for u in users:
        tr, va, te = (
            spans.get((u, "train")),
            spans.get((u, "val")),
            spans.get((u, "test")),
        )
        if tr and va:
            assert tr[1] <= va[0], u
        if va and te:
            assert va[1] <= te[0], u
        if tr and te and not va:
            assert tr[1] <= te[0], u


# --------------------------------------------------------------------------
# temperature_resample: reference, monotonicity + allocation laws
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def temp_corpus_sf(tmp_path_factory) -> str:
    """Skewed source sizes: 64 / 16 / 4 / 1 docs — powers so the
    temperature compression is visible (64:1 raw becomes ~18:1 at
    alpha 0.7)."""
    from tests.test_round13_advice import _write_documents

    rows, doc_id = [], 0
    for source, n in (("big", 64), ("mid", 16), ("small", 4), ("tiny", 1)):
        for _ in range(n):
            doc_id += 1
            rows.append((doc_id, f"doc number {doc_id} from {source}", "en", source, 1))
    d = str(tmp_path_factory.mktemp("temp_corpus"))
    _write_documents(d, rows)
    return d


def _temperature_reference(sf_dir: str, alpha: float):
    import duckdb
    import math

    counts = dict(
        duckdb.sql(
            f"SELECT source, count(*) FROM "
            f"read_parquet('{sf_dir}/documents.parquet') GROUP BY 1"
        ).fetchall()
    )
    q = {s: math.floor(math.pow(n, alpha) * 1000000 + 0.5) for s, n in counts.items()}
    qq, total = sum(q.values()), sum(counts.values())
    return {
        s: (counts[s], q[s], q[s] * 1000000 // qq, total * q[s] // qq)
        for s in counts
    }


def test_temperature_resample_matches_reference_and_laws(spark, temp_corpus_sf):
    from mapreduce__spark.plans.tier2_pipeline import TEMP_ALPHA

    rows = REGISTRY["temperature_resample"].fn(spark, temp_corpus_sf).collect()
    got = {
        r.source: (int(r.n_docs), int(r.q_micro), int(r.share_ppm), int(r.budget_docs))
        for r in rows
    }
    assert got == _temperature_reference(temp_corpus_sf, TEMP_ALPHA)
    # temperature compresses: tiny's share exceeds its raw proportion,
    # big's share falls below it (the whole point of the knob)
    total = sum(v[0] for v in got.values())
    assert got["tiny"][2] > 1_000_000 * got["tiny"][0] // total
    assert got["big"][2] < 1_000_000 * got["big"][0] // total
    # monotone in n_docs; shares sum to <= 1e6 with < n_sources slack;
    # budgets under-allocate the total by < n_sources
    ordered = sorted(got.values())
    for (n1, _q1, s1, b1), (n2, _q2, s2, b2) in zip(ordered, ordered[1:]):
        assert n1 <= n2 and s1 <= s2 and b1 <= b2
    share_sum = sum(v[2] for v in got.values())
    assert 1_000_000 - len(got) < share_sum <= 1_000_000
    budget_sum = sum(v[3] for v in got.values())
    assert total - len(got) < budget_sum <= total


def test_temperature_resample_matches_oracle_on_fixture(spark, temp_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    q = REGISTRY["temperature_resample"]
    ok, msg = compare_with_oracle(q.fn(spark, temp_corpus_sf), q.oracle, temp_corpus_sf)
    assert ok, msg


# --------------------------------------------------------------------------
# passage_chunk_overlap: coverage/overlap laws, pure-Python reference
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def chunk_corpus_sf(tmp_path_factory) -> str:
    """Docs at the windowing edge cases: shorter than one window,
    exactly one window (32), one stride + 1 (33 -> two chunks), a
    multiple of the stride (72 -> starts 1/25/49), and a long doc."""
    from tests.test_round13_advice import _write_documents

    def doc(n):
        return " ".join(f"w{i}" for i in range(1, n + 1))

    rows = [
        (i, doc(n), "en", "web", n)
        for i, n in enumerate((5, 32, 33, 72, 200), start=1)
    ]
    d = str(tmp_path_factory.mktemp("chunk_corpus"))
    _write_documents(d, rows)
    return d


def _chunk_reference(sf_dir: str, w: int, s: int):
    import duckdb
    import hashlib

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    out = set()
    for doc_id, text in rows:
        toks = text.split(" ")
        n = len(toks)
        for idx, start in enumerate(range(1, n + 1, s)):
            chunk = toks[start - 1 : start - 1 + w]
            out.add(
                (
                    int(doc_id),
                    idx,
                    start,
                    min(w, n - start + 1),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )
            )
    return out


def test_passage_chunks_match_pure_python_reference(spark, chunk_corpus_sf):
    from mapreduce__spark.plans.tier2_text import CHUNK_S, CHUNK_W

    got = {
        (int(r.doc_id), int(r.chunk_idx), int(r.start_tok),
         int(r.n_chunk_toks), r.chunk_md5)
        for r in REGISTRY["passage_chunk_overlap"].fn(spark, chunk_corpus_sf).collect()
    }
    assert got == _chunk_reference(chunk_corpus_sf, CHUNK_W, CHUNK_S)
    per_doc = {}
    for doc_id, idx, _s, _n, _h in got:
        per_doc[doc_id] = max(per_doc.get(doc_id, 0), idx + 1)
    assert per_doc == {1: 1, 2: 2, 3: 2, 4: 3, 5: 9}


def test_passage_chunks_cover_every_token_with_declared_overlap(
    spark, chunk_corpus_sf
):
    """Coverage law: the union of [start, start + n_chunk_toks) spans
    [1, n] with no gaps, and consecutive FULL chunks overlap by exactly
    CHUNK_W - CHUNK_S tokens."""
    from mapreduce__spark.plans.tier2_text import CHUNK_S, CHUNK_W

    rows = REGISTRY["passage_chunk_overlap"].fn(spark, chunk_corpus_sf).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(int(r.doc_id), []).append(
            (int(r.start_tok), int(r.n_chunk_toks))
        )
    for doc_id, spans in per_doc.items():
        spans.sort()
        covered_until = 0
        for start, ln in spans:
            assert start <= covered_until + 1, (doc_id, start)
            covered_until = max(covered_until, start + ln - 1)
        for (s1, l1), (s2, _l2) in zip(spans, spans[1:]):
            if l1 == CHUNK_W:
                assert s1 + l1 - s2 == CHUNK_W - CHUNK_S, doc_id


def test_passage_chunks_match_oracle_on_fixture(spark, chunk_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    q = REGISTRY["passage_chunk_overlap"]
    ok, msg = compare_with_oracle(q.fn(spark, chunk_corpus_sf), q.oracle, chunk_corpus_sf)
    assert ok, msg


# --------------------------------------------------------------------------
# matryoshka_overlap: reference, bounds + nesting laws
# --------------------------------------------------------------------------


def _mrl_reference(sf_dir: str, prefixes, k: int, query_ids):
    """Pure-Python twin with Spark's exact left-fold float chains."""
    import duckdb
    import math

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    vecs = {int(vid): [float(x) for x in e] for vid, e in rows}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def topk(dim):
        out = {}
        for qid in query_ids:
            qe = vecs[qid][:dim] if dim else vecs[qid]
            scored = []
            for nid, e in vecs.items():
                if nid == qid:
                    continue
                ne = e[:dim] if dim else e
                denom = math.sqrt(fold_dot(qe, qe)) * math.sqrt(fold_dot(ne, ne))
                c = -1.0 if denom == 0.0 else fold_dot(qe, ne) / denom
                scored.append((-math.floor(c * 1000000.0 + 0.5), nid))
            scored.sort()
            out[qid] = {nid for _s, nid in scored[:k]}
        return out

    full = topk(None)
    want = set()
    for p in prefixes:
        t = topk(p)
        for qid in query_ids:
            want.add((qid, p, len(full[qid] & t[qid])))
    return want


def test_matryoshka_overlap_matches_reference_and_laws(spark, sf_small):
    from mapreduce__spark.plans.tier2_embedding import (
        ANN_QUERY_IDS,
        MRL_K,
        MRL_PREFIXES,
    )

    rows = REGISTRY["matryoshka_overlap"].fn(spark, sf_small).collect()
    got = {
        (int(r.query_id), int(r.prefix_dims), int(r.n_overlap)) for r in rows
    }
    assert got == _mrl_reference(sf_small, MRL_PREFIXES, MRL_K, ANN_QUERY_IDS)
    # shape: one row per (query, prefix); overlaps bounded by k
    assert len(got) == len(ANN_QUERY_IDS) * len(MRL_PREFIXES)
    assert all(0 <= n <= MRL_K for _q, _p, n in got)


def test_matryoshka_full_prefix_is_identity(spark, sf_small, monkeypatch):
    """Evaluating the 'truncation' at the full 64 dims must retain all
    k neighbors for every query — the sanity anchor that the overlap
    join and the rank contract line up."""
    import mapreduce__spark.plans.tier2_embedding as te

    monkeypatch.setattr(te, "MRL_PREFIXES", (64,))
    rows = REGISTRY["matryoshka_overlap"].fn(spark, sf_small).collect()
    assert rows
    assert all(int(r.n_overlap) == te.MRL_K for r in rows)


# --------------------------------------------------------------------------
# lang_id_confusion: consistency with lang_id, marginal laws
# --------------------------------------------------------------------------


def test_lang_id_confusion_consistent_with_per_doc_predictions(spark, sf_small):
    """The matrix is exactly the per-doc lang_id output aggregated —
    same argmax, same tie order — and the marginals are internally
    consistent (row/col sums, diagonal bounded by both marginals)."""
    from collections import Counter

    per_doc = REGISTRY["lang_id"].fn(spark, sf_small).collect()
    want_cells = Counter(
        (r.labeled_lang, r.predicted_lang) for r in per_doc
    )
    rows = REGISTRY["lang_id_confusion"].fn(spark, sf_small).collect()
    got_cells = {
        (r.labeled_lang, r.predicted_lang): int(r.n_docs) for r in rows
    }
    assert got_cells == dict(want_cells)
    row_tot, col_tot = {}, {}
    for r in rows:
        row_tot.setdefault(r.labeled_lang, set()).add(int(r.n_labeled))
        col_tot.setdefault(r.predicted_lang, set()).add(int(r.n_predicted))
        assert int(r.n_docs) <= int(r.n_labeled)
        assert int(r.n_docs) <= int(r.n_predicted)
    # each label/prediction carries ONE consistent marginal everywhere
    assert all(len(v) == 1 for v in row_tot.values())
    assert all(len(v) == 1 for v in col_tot.values())
    # marginals really are the cell sums
    for lang, (tot,) in ((k, tuple(v)) for k, v in row_tot.items()):
        assert tot == sum(
            n for (ll, _pl), n in got_cells.items() if ll == lang
        )
    assert sum(n for n in got_cells.values()) == len(per_doc)
