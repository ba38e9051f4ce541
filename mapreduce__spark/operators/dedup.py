"""Deduplication operators — exact, exact-Jaccard, MinHash LSH, SimHash.

The scale story (the whole point at 100 TB):

* exact dedup — one hash-aggregate on a fingerprint column; the shuffle
  key is the fingerprint, uniformly distributed by construction.
* exact n-gram Jaccard — correct but quadratic in the worst case: the
  gram self-join blows up on common grams. Usable up to modest corpora
  and as the ORACLE for the approximate methods.
* MinHash + LSH — the scale path: per-doc signature (explode distinct
  grams, min-aggregate the whole hash family in one codegen'd
  hash-aggregate — num_hashes longs per doc shuffle after map-side
  combine), band → bucket equi-join (only docs sharing a band bucket
  ever meet), exact-Jaccard verification of the candidates only.
  Shuffle volume is O(docs × (hashes + bands)), not O(docs²).
* SimHash — constant-size fingerprint whose hamming distance tracks
  similarity; pairs by bucketing fingerprint chunks.

All hash functions are deterministic Catalyst expressions (md5 /
xxhash64) — no RNG, no Python in the distributed path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce__spark.functions.text import tokenize, word_ngrams
from mapreduce__spark.sources.tables import ensure_parallelism

NGRAM_N = 3


def exact_duplicate_groups(docs: DataFrame) -> DataFrame:
    """Exact dedup: group by content fingerprint, keep the min doc_id as
    canonical. md5 over the raw text — byte-identical duplicates only."""
    return (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper"))
    )


def _doc_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, gram) with distinct word-3-grams exploded."""
    return ensure_parallelism(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(word_ngrams(tokenize(F.col("text")), NGRAM_N)).alias("gram")
    )


def exact_jaccard_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Exact word-3-gram Jaccard over all pairs sharing >=1 gram.

    The classic exact algorithm: explode distinct grams, self-join on the
    gram, count common grams per pair, |A∪B| = |A|+|B|-common. Correct and
    oracle-friendly; the gram join is the quadratic hazard that motivates
    LSH below.
    """
    grams = _doc_grams(docs)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = grams.alias("a")
    b = grams.alias("b")
    common = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("n_grams").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("n_grams").alias("n2"))
    jac = F.col("common") / (F.col("n1") + F.col("n2") - F.col("common"))
    return (
        common.join(s1, "id1")
        .join(s2, "id2")
        .where(jac >= threshold)
        .select("id1", "id2", F.round(jac, 4).alias("jaccard"))
    )


def exact_containment_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Exact word-3-gram CONTAINMENT over all pairs sharing >=1 gram:
    C(A in B) = |A ∩ B| / |A|, the asymmetric twin of Jaccard. A short
    doc quoted inside a long one scores near-zero Jaccard (the union is
    dominated by the long doc) but containment ~1 — the partial-copy /
    quote / doc-plus-boilerplate-superset signal a symmetric metric
    cannot see. Emits every pair where EITHER direction reaches the
    threshold, with both directions reported for triage.

    Same gram-join shape (and the same quadratic hazard) as
    :func:`exact_jaccard_pairs` — this is the oracle baseline. The scale
    path is :func:`chunk_containment_pairs`: a fixed-chunk ⋈ stride-1-
    window span join with linear shuffle volume, which recalls exactly
    the high-containment/low-Jaccard pairs (tiny A inside huge B) that
    MinHash banding cannot; paragraph_dedup and boilerplate_removal
    cover the same shape at paragraph/chunk granularity.
    """
    grams = _doc_grams(docs)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = grams.alias("a")
    b = grams.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("n_grams").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("n_grams").alias("n2"))
    c12 = F.col("common") / F.col("n1")  # doc1's grams found in doc2
    c21 = F.col("common") / F.col("n2")
    return (
        common.join(s1, "id1")
        .join(s2, "id2")
        .where(F.greatest(c12, c21) >= threshold)
        .select(
            "id1",
            "id2",
            # raw int/int divisions — bit-identical on every engine;
            # round(·, 4) would sit on decimal half-ties (the
            # events_ewma lesson, see plans/registry.py header)
            c12.alias("containment_12"),
            c21.alias("containment_21"),
        )
    )


def chunk_containment_pairs(
    docs: DataFrame,
    threshold: float,
    chunk_tokens: int = 8,
    hash_keys: bool = False,
) -> DataFrame:
    """Chunk-level containment — the LINEAR scale path
    :func:`exact_containment_pairs` points at (round-7 verdict item 5).

    Score: the fraction of A's non-overlapping `chunk_tokens`-token
    chunks whose exact text occurs ANYWHERE in B (as a stride-1 window).
    A doc verbatim-embedded in another scores 1.0 at ANY token offset —
    the asymmetric B-side is stride-1 precisely so A's fixed chunking
    never misses an unaligned copy — while MinHash banding cannot recall
    these pairs at all (a tiny A inside a huge B has near-zero Jaccard).

    SCALE, vs the gram-join baseline: candidate pairs form only between
    docs sharing a FULL chunk_tokens-token span — a far more selective
    join key than a single 3-gram, so the pair space tracks real copying
    instead of vocabulary overlap. Work is O(corpus tokens) rows on the
    window side (the substring_dedup_windows working set; the published
    suffix-array formulation holds the same bytes), one
    map-side-combinable distinct per side, one equi-join on the span
    key, one bounded per-pair agg. The skew hazard is a boilerplate span
    shared by many docs — the same hot-key class `_cap_hot_buckets`
    handles for LSH; corpora with that shape run boilerplate_removal
    FIRST (the operators compose: strip shared chunks, then contain).

    `hash_keys=True` is the 100 TB variant: both sides shuffle
    (doc_id, xxhash64(span)) 8-byte keys instead of span STRINGS —
    ~chunk_tokens*wordlen-fold byte cut with the usual 64-bit collision
    caveat. The raw default is the bit-exact oracle path (pinned equal
    in tests).

    Output: (id_a, id_b, n_chunks, n_found, containment) for every
    ordered pair with containment >= threshold; docs shorter than
    chunk_tokens tokens have no chunks and never appear as A or B.
    Containment is a raw int/int division (bit-identical cross-engine;
    round() would sit on decimal half-ties — the events_ewma lesson).
    """
    t = tokenize(F.col("text"))
    base = docs.select("doc_id", t.alias("t")).where(
        F.size("t") >= chunk_tokens
    )
    # A-side: non-overlapping FULL chunks (the partial tail is dropped —
    # it can never equal a full-width window), distinct per doc.
    a_chunks = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    (F.size("t") / chunk_tokens).cast("int") - 1,
                ),
                lambda i: F.array_join(
                    F.slice("t", i * chunk_tokens + 1, F.lit(chunk_tokens)),
                    " ",
                ),
            )
        ).alias("chunk"),
    ).distinct()
    # B-side: every stride-1 window, distinct per doc (a chunk of A is
    # "in B" if it occurs at least once — multiplicity is irrelevant).
    b_wins = (
        base.select(
            "doc_id",
            "t",
            F.explode(
                F.sequence(F.lit(0), F.size("t") - chunk_tokens)
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.array_join(
                F.slice("t", F.col("i") + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk"),
        )
        .distinct()
    )
    if hash_keys:
        a_chunks = a_chunks.select("doc_id", F.xxhash64("chunk").alias("chunk"))
        b_wins = b_wins.select("doc_id", F.xxhash64("chunk").alias("chunk"))
    na = a_chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks")
    )
    a = a_chunks.alias("a")
    b = b_wins.alias("b")
    m = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_found"))
    )
    score = F.col("n_found") / F.col("n_chunks")
    return (
        m.join(na.select(F.col("doc_id").alias("id_a"), "n_chunks"), "id_a")
        .where(score >= threshold)
        .select("id_a", "id_b", "n_chunks", "n_found", score.alias("containment"))
    )


def minhash_fold_expr(grams_col: Column, num_hashes: int, hash_fn: str = "xxhash64") -> Column:
    """MinHash signature of a gram-array column as one array expression.

    Perf-critical structure: the gram set is traversed ONCE and ALL hash
    family members are folded in ONE `aggregate` pass (running
    elementwise-min via `zip_with`). Building each minhash as its own
    `array_min(transform(word_ngrams(...)))` column re-constructs the
    ~|doc| gram array per hash (lambda ids differ per column, so codegen
    subexpression elimination cannot share them) — measured 16x slower at
    sf0.1. ``hash_fn``:
    * 'xxhash64' — the engine family xxhash64(xxhash64(gram), i), kept
      BIT-IDENTICAL to :func:`minhash_signature`'s aggregate form so fold
      signatures and aggregate signatures can be joined/compared (e.g. a
      persisted incremental signature table);
    * 'md5'      — hex-string hash reproducible in DuckDB (oracle path).
    """
    if hash_fn == "md5":
        # '~' sorts above every hex digit, so empty docs keep the sentinel.
        init = F.array(*[F.lit("~") for _ in range(num_hashes)])
        return F.aggregate(
            grams_col,
            init,
            lambda acc, g: F.zip_with(
                acc,
                F.array(*[F.md5(F.concat(g, F.lit(f"#{i}"))) for i in range(num_hashes)]),
                lambda a, b: F.least(a, b),
            ),
        )
    init = F.array(*[F.lit(2**63 - 1).cast("long") for _ in range(num_hashes)])
    return F.aggregate(
        grams_col,
        init,
        lambda acc, g: F.zip_with(
            acc,
            F.array(
                *[F.xxhash64(F.xxhash64(g), F.lit(i)) for i in range(num_hashes)]
            ),
            lambda a, b: F.least(a, b),
        ),
    )


def minhash_signature(docs: DataFrame, num_hashes: int, hash_fn: str = "xxhash64") -> DataFrame:
    """Per-doc MinHash signature as one `mh` array column of length
    `num_hashes`.

    The engine (xxhash64) path explodes distinct grams and min-aggregates
    all hash family members in ONE codegen'd hash-aggregate: higher-order
    array functions (`aggregate`/`zip_with`) run on Catalyst's
    interpreted path and allocate a fresh signature array per gram, which
    made the single-pass fold ~1.6x slower than explode+groupBy at sf0.1
    despite touching the same data. The added shuffle is num_hashes longs
    per doc AFTER map-side partial aggregation — word-count scaling. The
    engine family is xxhash64(xxhash64(gram), i) — one string hash, then
    fixed-width mixes (the fold's per-gram string family costs num_hashes
    string traversals) — and empty-gram docs keep the MAX_LONG sentinel
    via an explode_outer NULL guard.

    The md5 path keeps the :func:`minhash_fold_expr` fold — it exists for
    DuckDB-oracle reproducibility, where hex-string min semantics (not
    speed) are the contract."""
    if hash_fn == "md5":
        with_grams = ensure_parallelism(docs.select("doc_id", "text")).select(
            "doc_id", word_ngrams(tokenize(F.col("text")), NGRAM_N).alias("grams")
        )
        return with_grams.select(
            "doc_id", minhash_fold_expr(F.col("grams"), num_hashes, hash_fn).alias("mh")
        )
    sentinel = F.lit(2**63 - 1).cast("long")
    # Hash the VARIABLE-LENGTH gram string ONCE, then derive the whole
    # hash family from the resulting long: per-gram hashing drops from
    # num_hashes string traversals to one string traversal + num_hashes
    # fixed-width mixes. At sf0.1 this is ~6% (the explode, not the
    # hashing, bounds the stage there); the hashing share grows with gram
    # length and corpus size, which is when it matters. The family stays
    # independent enough for banding, and the exact-verify step downstream
    # makes the operator's OUTPUT equal to the exact operator's under ANY
    # family (tests pin lsh == exact).
    exploded = ensure_parallelism(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode_outer(word_ngrams(tokenize(F.col("text")), NGRAM_N)).alias("gram"),
    ).select(
        "doc_id",
        # NULL gram (explode_outer's empty-array marker) stays NULL here,
        # and the when-guards below keep it out of every min.
        F.when(F.col("gram").isNotNull(), F.xxhash64("gram")).alias("g64"),
    )
    aggs = [
        F.coalesce(
            F.min(F.when(F.col("g64").isNotNull(), F.xxhash64("g64", F.lit(i)))),
            sentinel,
        ).alias(f"_mh{i}")
        for i in range(num_hashes)
    ]
    return (
        exploded.groupBy("doc_id")
        .agg(*aggs)
        .select(
            "doc_id",
            F.array(*[F.col(f"_mh{i}") for i in range(num_hashes)]).alias("mh"),
        )
    )


def _band_buckets(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band_idx, band_hash) — one row per LSH band, the hash
    folding that band's signature slice. Docs equal on ANY band share a
    (band_idx, band_hash) bucket key.

    Gramless docs (fewer than NGRAM_N tokens: empty pages, boilerplate
    stubs) keep the all-sentinel signature and are DROPPED here: they can
    never reach a positive Jaccard threshold (0 grams → jaccard NULL at
    verify), but all of them share identical band hashes, so a corpus
    with many of them would otherwise meet in a single bucket and emit a
    quadratic candidate cross-product that verification then discards.
    mh[0] == sentinel ⟺ the whole signature is the sentinel (every
    member is a min over the same empty gram set)."""
    sentinel = F.lit(2**63 - 1).cast("long")
    sig = sig.where(F.col("mh")[0] != sentinel)
    r = num_hashes // bands
    band_cols = [
        F.xxhash64(*[F.col("mh")[b * r + i] for i in range(r)]).alias(f"band{b}")
        for b in range(bands)
    ]
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"), band_cols[b].alias("band_hash")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_hash")


def _check_text_source_covers(cand_ids: DataFrame, cand_grams: DataFrame) -> None:
    """Fail loudly if the caller's text_source does not cover the
    candidate ids exactly 1:1 (row count AND distinct count, one action —
    two counter rows by construction, bound-enforced)."""
    from mapreduce__spark.operators.staging import bounded_collect

    stats = {
        r["side"]: r
        for r in bounded_collect(
            cand_ids.select(
                F.lit("ids").alias("side"),
                F.count(F.lit(1)).alias("n"),
                F.count(F.lit(1)).alias("nd"),
            ).unionAll(
                cand_grams.select(
                    F.lit("txt").alias("side"),
                    F.count(F.lit(1)).alias("n"),
                    F.countDistinct("doc_id").alias("nd"),
                )
            ),
            2,
            "lsh text_source coverage counters",
        )
    }
    n_ids = stats["ids"]["n"]
    if (stats["txt"]["n"], stats["txt"]["nd"]) != (n_ids, n_ids):
        raise ValueError(
            f"lsh_near_duplicate_pairs: text_source covers "
            f"{stats['txt']['nd']} distinct / {stats['txt']['n']} rows of "
            f"{n_ids} candidate doc_ids (must be an exact 1:1 superset "
            "with the same text values as `docs`)"
        )


def _cap_hot_buckets(banded: DataFrame, max_bucket_size: int) -> DataFrame:
    """Drop band buckets larger than `max_bucket_size` before the
    candidate self-join — the skew fallback for boilerplate-heavy corpora.

    A corpus where many docs share a large common slice (license headers,
    page templates) can hash a constant fraction of its minhashes from
    the shared grams: buckets then collect docs whose TRUE Jaccard is far
    below threshold, and the self-join inside one hot bucket emits
    O(bucket²) candidates that verification must fetch texts for and
    discard — the quadratic blowup banding exists to avoid. (Salting the
    band key does NOT fix this: a band bucket is a same-key equi-join
    with itself, so salt groups would have to be recombined pairwise —
    the same quadratic, shuffled twice.)

    Capping trades bounded recall for bounded work: a TRUE pair is lost
    only if EVERY band it collides on is oversized; at the default
    b=8/r=2 a j≥0.8 pair collides on ~5 of 8 bands in expectation, so
    only pairs whose similarity IS the boilerplate lose all their
    buckets. The cap is opt-in (None = exact semantics, the
    oracle-checked default)."""
    sizes = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("_bsz")
    )
    return (
        banded.join(sizes, ["band_idx", "band_hash"])
        .where(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )


# Above this many candidate-id rows the verify stage's id probe must not
# broadcast: a hashed relation costs ~40-60 bytes/row on every executor
# (plus the driver collect), so a duplicate-heavy corpus whose candidate
# set approaches corpus size would OOM exactly like the eval-gram
# broadcast the round-6 verdict flagged. 5M ids ≈ a few hundred MB —
# comfortably shippable; beyond it a shuffle equi-join is the right plan
# anyway (both sides are large).
BROADCAST_ID_LIMIT = 5_000_000


def _probe_ids(corpus: DataFrame, ids: DataFrame, n_ids_bound: int) -> DataFrame:
    """Join a corpus scan to a candidate id set: broadcast when the ids
    are provably small (the normal case — candidates are bounded by the
    banding), shuffle equi-join otherwise. The guard is EXPLICIT because
    the id relation is a localCheckpoint with no stats: Catalyst once
    inverted the build side here (broadcast the TEXT table), and an
    unconditional broadcast hint is a scale hole on duplicate-heavy
    corpora. `n_ids_bound` is any cheap upper bound on the id count —
    the callers use 2x the materialized candidate-pair row count."""
    if n_ids_bound <= BROADCAST_ID_LIMIT:
        return corpus.join(F.broadcast(ids), "doc_id")
    return corpus.join(ids, "doc_id")


def lsh_near_duplicate_pairs(
    docs: DataFrame,
    threshold: float,
    num_hashes: int = 16,
    bands: int = 8,
    text_source: DataFrame | None = None,
    max_bucket_size: int | None = None,
    staging_dir: str | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified — the 100 TB dedup plan.

    1. signatures: num_hashes minhashes per doc (scan-stage expressions);
    2. banding: `bands` buckets of rows_per_band hashes each; docs equal
       on ANY band meet in an equi-join keyed (band_idx, band_hash) —
       P(candidate) = 1-(1-j^r)^b; with 16 hashes / 8 bands / r=2, j=0.8
       → 0.9997, so recall at the threshold is effectively exact;
    3. candidates are exact-verified with :func:`exact_jaccard_pairs`
       semantics via a semi-join back to the gram table — false positives
       die here, so the output EQUALS the exact operator's output and is
       hash-checkable against the same SQL oracle.

    `text_source` (default: `docs`) is where the verification step fetches
    candidate TEXTS. When `docs` carries an expensive lineage (the
    pipelines pass their quality-filtered / decontaminated relation), the
    verify pass would re-execute that whole pipeline just to read a few
    texts — pass a cheap superset relation with the SAME (doc_id, text)
    values (the raw scan, or the scan-stage scrubbed projection) and the
    verify pass costs one map-side table scan instead. Candidate ids are
    always a subset of `docs`' ids, so any superset source is equivalent.

    `max_bucket_size` (default None = exact semantics) engages the
    hot-bucket skew fallback for boilerplate-heavy corpora — see
    :func:`_cap_hot_buckets` for the recall/work tradeoff.

    `staging_dir` (default None = executor-memory checkpoint) durably
    stages the SIGNATURE table — the one corpus-proportional
    materialization here (~num_hashes longs per doc; ~12 TB at 100 B
    docs) — as parquet via :func:`operators.staging.stage`. The
    candidate-sized materializations below stay in executor memory at
    every scale (bounded by the banding, not the corpus).
    """
    from mapreduce__spark.operators.staging import stage

    assert num_hashes % bands == 0
    # Materialize ONLY the signatures — num_hashes longs per doc, ~128B/doc
    # at the default 16 — never the gram arrays. An earlier layout
    # checkpointed (grams, mh) together so verification could reuse the
    # gram arrays; that checkpoint is corpus-sized (every 3-gram of every
    # doc), and several live copies (bench loop, flagship + standalone
    # query) evicted each other out of executor memory — measured up to 4x
    # run-to-run noise on the downstream pipeline. Signatures are the only
    # thing read more than once per scan; grams are recomputed at verify
    # time for CANDIDATE docs only (see below).
    sig = stage(minhash_signature(docs, num_hashes), staging_dir, "lsh_signatures")
    banded = _band_buckets(sig, num_hashes, bands)
    if max_bucket_size is not None:
        banded = _cap_hot_buckets(banded, max_bucket_size)

    ba = banded.alias("ba")
    bb = banded.alias("bb")
    candidates = (
        ba.join(
            bb,
            (F.col("ba.band_idx") == F.col("bb.band_idx"))
            & (F.col("ba.band_hash") == F.col("bb.band_hash"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("id1"), F.col("bb.doc_id").alias("id2"))
        .distinct()
    )

    # Exact verification of candidates only (candidate count << n²), with
    # every step candidate-sized — the corpus appears exactly once, as a
    # map-side scan probing a broadcast id set:
    #   1. distinct candidate doc ids (tiny — bounded by the banding)
    #      broadcast against the corpus scan → texts of candidate docs
    #      only; no corpus shuffle, no corpus-sized gram storage;
    #   2. gram arrays recomputed for THOSE docs, materialized once
    #      (read by both sides of the pair join);
    #   3. pair ⋈ grams ⋈ grams + in-row intersect.
    # An earlier layout materialized the gram arrays of the WHOLE corpus
    # for this join; several live copies of that corpus-sized checkpoint
    # evicted each other out of executor memory (up to 4x run-to-run
    # noise downstream), and letting AQE pick the join order instead
    # inverted the build side (the checkpointed candidate RDD has no size
    # stats, so Spark broadcast the TEXT side). Explicit size-guarded
    # id-broadcast (_probe_ids) + candidate-gram materialization pins the
    # right shape at every scale, including the duplicate-heavy corpus
    # whose candidate set is too big to ship.
    # LAZY checkpoint + count(): the count action IS the materialization
    # job (localCheckpoint persists the computed partitions on first
    # execution and truncates lineage), so the size bound for the id
    # probe below costs zero extra jobs. An eager checkpoint followed by
    # a separate count() ran TWO jobs over the candidate table — measured
    # ~0.6s/run at sf0.1, the round-7 bench regression (BENCH_r07
    # dedup_lsh_minhash 2.22x; bisected to exactly this seam). 2x rows is
    # an upper bound on distinct candidate ids (see _probe_ids).
    candidates = candidates.localCheckpoint(eager=False)
    n_cand_pairs = candidates.count()
    cand_ids = (
        candidates.select(F.col("id1").alias("doc_id"))
        .unionAll(candidates.select(F.col("id2").alias("doc_id")))
        .distinct()
    )
    cand_grams = (
        _probe_ids(
            text_source if text_source is not None else docs,
            cand_ids,
            2 * n_cand_pairs,
        )
        .select("doc_id", word_ngrams(tokenize(F.col("text")), NGRAM_N).alias("grams"))
        .localCheckpoint(eager=True)
    )
    # Contract guard (round-2 advice): a CALLER-provided `text_source`
    # must carry every candidate id exactly once — a non-superset
    # silently DROPS pairs through the inner joins below and duplicate
    # ids silently MULTIPLY them, both wrong-results failures with no
    # error. Comparing row AND distinct-id counts closes the offsetting
    # case (one id duplicated, another missing, same total); everything
    # reads candidate-sized materialized data and rides ONE action. When
    # no text_source is passed, candidate texts come from `docs` itself
    # and the 1:1 property holds by construction (candidate ids ARE doc
    # ids) — the guard job is skipped.
    if text_source is not None:
        _check_text_source_covers(cand_ids, cand_grams)
    ga1 = cand_grams.select(F.col("doc_id").alias("gid1"), F.col("grams").alias("g1"))
    ga2 = cand_grams.select(F.col("doc_id").alias("gid2"), F.col("grams").alias("g2"))
    paired = (
        candidates.join(ga1, F.col("id1") == F.col("gid1"))
        .join(ga2, F.col("id2") == F.col("gid2"))
    )
    common = F.size(F.array_intersect(F.col("g1"), F.col("g2")))
    jac = common / (F.size("g1") + F.size("g2") - common)
    return (
        paired.where(jac >= threshold)
        .select("id1", "id2", F.round(jac, 4).alias("jaccard"))
    )


def _check_ref_corpus_covers(candidates: DataFrame, gr: DataFrame) -> None:
    """Fail loudly if a caller-provided ref_signatures snapshot is out of
    sync with ref_docs. Two silent wrong-results modes are closed here
    (round-3 advice — the incremental twin of _check_text_source_covers):

    * ref_signatures carries doc_ids absent from ref_docs (stale snapshot)
      → those candidates vanish through the inner verify join;
    * a doc_id appears in BOTH the new batch and the reference (the
      documented disjointness contract) → its pairs are self-comparisons.

    All inputs are candidate-sized materialized checkpoints; the whole
    check rides ONE action."""
    ref_ids = candidates.select(F.col("ref_id").alias("doc_id")).distinct()
    overlap = (
        candidates.select("new_id")
        .distinct()
        .join(candidates.select(F.col("ref_id").alias("new_id")).distinct(), "new_id")
    )
    from mapreduce__spark.operators.staging import bounded_collect

    stats = {
        r["side"]: r
        for r in bounded_collect(
            ref_ids.select(
                F.lit("ids").alias("side"),
                F.count(F.lit(1)).alias("n"),
                F.count(F.lit(1)).alias("nd"),
            )
            .unionAll(
                gr.select(
                    F.lit("txt").alias("side"),
                    F.count(F.lit(1)).alias("n"),
                    F.countDistinct("doc_id").alias("nd"),
                )
            )
            .unionAll(
                overlap.select(
                    F.lit("ovl").alias("side"),
                    F.count(F.lit(1)).alias("n"),
                    F.count(F.lit(1)).alias("nd"),
                )
            ),
            3,
            "incremental ref-corpus coverage counters",
        )
    }
    n_ids = stats["ids"]["n"]
    if (stats["txt"]["n"], stats["txt"]["nd"]) != (n_ids, n_ids):
        raise ValueError(
            f"lsh_incremental_pairs: ref_docs covers {stats['txt']['nd']} "
            f"distinct / {stats['txt']['n']} rows of {n_ids} candidate "
            "ref doc_ids — the caller-provided ref_signatures snapshot is "
            "stale or mismatched with ref_docs (must be an exact 1:1 "
            "superset with the same texts the signatures were built from)"
        )
    if stats["ovl"]["n"] > 0:
        raise ValueError(
            f"lsh_incremental_pairs: {stats['ovl']['n']} doc_ids appear in "
            "BOTH new_docs and ref_docs candidates — the corpora must have "
            "disjoint doc_ids"
        )


def lsh_incremental_pairs(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    threshold: float,
    num_hashes: int = 16,
    bands: int = 8,
    ref_signatures: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup detection: NEW-batch docs against an existing
    REFERENCE corpus — the shape a production pipeline runs on every
    crawl increment (dedup the day's documents against everything already
    ingested, never re-pairing the reference against itself).

    Same banding + exact-verify scheme as :func:`lsh_near_duplicate_pairs`
    with one structural difference that is the whole point at scale: the
    candidate join is NEW-bands ⋈ REF-bands, so its cost is
    O(new × bands) probe rows against the reference's bucket table.
    Reference-side signatures are recomputed per call by default; a
    production deployment PERSISTS them (num_hashes longs per doc,
    ~1/1000th of the corpus) and appends each increment's — pass that
    table as `ref_signatures` (schema: doc_id, mh array<bigint> from
    :func:`minhash_signature` or the bit-identical fold form) and the
    reference corpus is never re-scanned for signatures, only probed for
    candidate verify TEXTS. Output: (new_id, ref_id, jaccard) for every
    verified pair ≥ threshold; dropping the contaminated increment is a
    left_anti on new_id.

    `new_docs` and `ref_docs` must have disjoint doc_ids and (doc_id,
    text) schemas.
    """
    assert num_hashes % bands == 0
    sig_new = minhash_signature(new_docs, num_hashes).localCheckpoint(eager=True)
    sig_ref = (
        ref_signatures
        if ref_signatures is not None
        else minhash_signature(ref_docs, num_hashes).localCheckpoint(eager=True)
    )
    if ref_signatures is not None:
        # A snapshot persisted under a different num_hashes would index
        # past the array end inside _band_buckets (an unhelpful ANSI
        # error deep in the band join) or, with ANSI off, fold NULL
        # slots into constant band hashes — silently gutting banding
        # recall while _check_ref_corpus_covers still passes. Signatures
        # are uniform-width by construction, so one bounded probe row
        # pins the whole snapshot.
        from mapreduce__spark.operators.staging import bounded_collect

        probe = bounded_collect(
            sig_ref.select(F.size("mh").alias("w")).limit(1),
            1,
            "ref_signatures width probe",
        )
        if probe and probe[0].w != num_hashes:
            raise ValueError(
                f"lsh_incremental_pairs: ref_signatures width {probe[0].w} "
                f"!= num_hashes {num_hashes} — the snapshot was built with "
                "a different signature size; rebuild it (or call with the "
                "matching num_hashes)"
            )
    bn = _band_buckets(sig_new, num_hashes, bands).alias("bn")
    br = _band_buckets(sig_ref, num_hashes, bands).alias("br")
    candidates = (
        bn.join(
            br,
            (F.col("bn.band_idx") == F.col("br.band_idx"))
            & (F.col("bn.band_hash") == F.col("br.band_hash")),
        )
        .select(
            F.col("bn.doc_id").alias("new_id"), F.col("br.doc_id").alias("ref_id")
        )
        .distinct()
        # lazy: the count() below is the materialization action — one job
        # for checkpoint + size bound, not two (see the identical seam in
        # lsh_near_duplicate_pairs).
        .localCheckpoint(eager=False)
    )

    # Exact verification, candidate-sized on BOTH sides (size-guarded id
    # probes into each corpus scan — the corpora never shuffle unless
    # the candidate set itself is too big to ship; see _probe_ids).
    n_cand_pairs = candidates.count()
    gn = (
        _probe_ids(
            new_docs,
            candidates.select(F.col("new_id").alias("doc_id")).distinct(),
            n_cand_pairs,
        )
        .select("doc_id", word_ngrams(tokenize(F.col("text")), NGRAM_N).alias("grams"))
        .localCheckpoint(eager=True)
    )
    gr = (
        _probe_ids(
            ref_docs,
            candidates.select(F.col("ref_id").alias("doc_id")).distinct(),
            n_cand_pairs,
        )
        .select("doc_id", word_ngrams(tokenize(F.col("text")), NGRAM_N).alias("grams"))
        .localCheckpoint(eager=True)
    )
    # Contract guard (round-3 advice): only a CALLER-provided signature
    # snapshot can drift out of sync with ref_docs — the default path
    # derives signatures FROM ref_docs, so coverage holds by construction
    # and no guard job is spent on it.
    if ref_signatures is not None:
        _check_ref_corpus_covers(candidates, gr)
    paired = candidates.join(
        gn.select(F.col("doc_id").alias("new_id"), F.col("grams").alias("g1")), "new_id"
    ).join(
        gr.select(F.col("doc_id").alias("ref_id"), F.col("grams").alias("g2")), "ref_id"
    )
    common = F.size(F.array_intersect(F.col("g1"), F.col("g2")))
    jac = common / (F.size("g1") + F.size("g2") - common)
    return paired.where(jac >= threshold).select(
        "new_id", "ref_id", F.round(jac, 4).alias("jaccard")
    )


def ml_minhash_pairs(docs: DataFrame, threshold: float, num_features: int = 1 << 18) -> DataFrame:
    """Spark ML MinHashLSH variant of near-dup pair finding (API-breadth
    twin of :func:`lsh_near_duplicate_pairs`; the expression-based one is
    the engine's default — deterministic hashes, no feature-hashing
    collisions, oracle-checkable).

    grams → HashingTF sparse set vectors → MinHashLSH(seed) →
    approxSimilarityJoin at Jaccard distance (1 - threshold). The
    distance ML reports is the EXACT Jaccard over hashed gram indices, so
    up to HashingTF collisions this equals the exact operator's output.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    grams = docs.select(
        "doc_id", word_ngrams(tokenize(F.col("text")), NGRAM_N).alias("grams")
    ).where(F.size("grams") > 0)
    tf = HashingTF(inputCol="grams", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(grams)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 1.0 - threshold, distCol="dist")
    return (
        joined.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id1"),
            F.col("datasetB.doc_id").alias("id2"),
            F.round(1.0 - F.col("dist"), 4).alias("jaccard"),
        )
    )


def simhash_fingerprint(docs: DataFrame, bits: int = 32) -> DataFrame:
    """Per-doc SimHash fingerprint (bit-majority over token hashes).

    Explode tokens → 64-bit xxhash per token → per-bit ±1 votes summed in
    ONE aggregation (bit tests are shifted-AND expressions, all JVM-side)
    → reassemble the fingerprint as sum of (vote>0) << b. Near-duplicate
    docs land at small hamming distance; bucketing fingerprint bytes gives
    an LSH-style candidate join. Scales like a word count.
    """
    toks = ensure_parallelism(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    hashed = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    voted = hashed.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else (fp + term)
    return voted.select("doc_id", fp.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two long fingerprints via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def prefix_filter_jaccard_pairs(
    docs: DataFrame, t_num: int, t_den: int
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering — the
    exact counterpart of the LSH scale path (AllPairs, Bayardo et al.
    WWW'07; prefix principle per PPJoin, Xiao et al. WWW'08): identical
    output to `exact_jaccard_pairs` at threshold t = t_num/t_den,
    WITHOUT the full gram self-join.

    Prefix principle: fix any total order over grams; if
    J(A, B) >= t then their intersection has at least
    ceil(t/(1+t) * (|A|+|B|)) >= ceil(t*|A|) elements, so the first
    |A| - ceil(t*|A|) + 1 grams of A (in that order) and the first
    |B| - ceil(t*|B|) + 1 grams of B cannot both miss it — every
    qualifying pair shares a PREFIX gram. Ordering by ascending
    document frequency makes prefixes the RAREST grams of each doc, so
    prefix postings are short and the candidate join touches pairs that
    share rare content, not pairs that share stopword grams. Exact
    intersection counts are then recomputed for candidates only (the
    incremental-dedup idiom) — losslessness is a theorem, not a recall
    target, and is property-tested against the quadratic form.

    Scale shape: one gram scan, one V-row document-frequency aggregate,
    one per-doc (partitioned) window to take prefixes, a candidate
    equi-join on prefix grams, and a candidate-restricted intersection
    recount. No global window, no corpus self-join. Skew hazard: a
    boilerplate gram that is simultaneously FREQUENT and still inside
    many docs' prefixes (only possible when docs are near-duplicates of
    each other en masse) — the `_cap_hot_buckets` class; corpora with
    that shape run exact dedup / boilerplate_removal first.

    Returns (id1, id2, n_common, size_a, size_b) — exact BIGINTs only
    (the registry's rounding policy: no derived float ratios in hashed
    output); J >= t_num/t_den is enforced as
    (t_den + t_num) * n_common >= t_num * (size_a + size_b).
    """
    from pyspark.sql.window import Window

    grams = _doc_grams(docs)
    sizes = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    dfreq = grams.groupBy("gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("gram_df")
    )
    # ceil(t*n) = (t_num*n + t_den - 1) div t_den — integer, exact
    ceil_tn = F.expr(f"({t_num} * sz + {t_den} - 1) div {t_den}")
    w = Window.partitionBy("doc_id").orderBy("gram_df", "gram")
    prefix = (
        grams.join(dfreq, "gram")
        .join(sizes, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("sz") - ceil_tn + F.lit(1))
        .select("doc_id", "gram")
    )
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    cands = (
        pa.join(
            pb,
            (F.col("pa.gram") == F.col("pb.gram"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(
            F.col("pa.doc_id").alias("id1"), F.col("pb.doc_id").alias("id2")
        )
        .distinct()
    )
    ga = grams.select(F.col("doc_id").alias("id1"), "gram")
    gb = grams.select(F.col("doc_id").alias("id2"), "gram")
    common = (
        cands.join(ga, "id1")
        .join(gb, ["id2", "gram"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("sz").alias("size_a"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("sz").alias("size_b"))
    return (
        common.join(s1, "id1")
        .join(s2, "id2")
        .where(
            F.lit(t_den + t_num) * F.col("n_common")
            >= F.lit(t_num) * (F.col("size_a") + F.col("size_b"))
        )
        .select("id1", "id2", "n_common", "size_a", "size_b")
    )
