"""Regression tests for the round-1 ADVICE findings: short-doc minhash
oracle parity, as-of tiebreak determinism, CLI directory-skip behavior,
NULL-safe distributed cumsum, and the grouped cumsum used by the flagship
pipeline's per-split packing."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mapreduce__spark.operators.asof import asof_join
from mapreduce__spark.operators.windows import (
    distributed_cumsum,
    distributed_cumsum_grouped,
)
from mapreduce__spark.plans import REGISTRY
from mapreduce__spark.search_cli import listings_df


def test_minhash_signatures_short_docs_match_oracle(spark, tmp_path):
    """ADVICE (medium): docs with <3 tokens have NO 3-grams — the Spark
    fold keeps the '~' sentinel and the oracle's list_min over an empty
    list is NULL unless coalesced. Pin parity on exactly that corpus."""
    rows = [
        (0, ""),                      # empty text -> 1 empty token, 0 grams
        (1, "one"),                   # 1 token
        (2, "one two"),               # 2 tokens -> still 0 grams
        (3, "one two three"),         # exactly 1 gram
        (4, "one two three four five six seven"),  # normal doc
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(f"{sf_dir}/documents.parquet")

    q = REGISTRY["minhash_signatures"]
    s_rows = {r.doc_id: (r.mh0, r.mh1, r.mh2, r.mh3) for r in q.fn(spark, sf_dir).collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    o_rows = {r[0]: tuple(r[1:]) for r in con.execute(q.oracle).fetchall()}
    con.close()

    assert s_rows == o_rows
    assert s_rows[0] == ("~", "~", "~", "~")  # sentinel, not NULL
    assert s_rows[2] == ("~", "~", "~", "~")


def test_asof_join_tiebreak_deterministic(spark):
    """ADVICE (low): two right rows with identical (key, ts) must resolve
    deterministically — max tiebreak value wins."""
    left = spark.createDataFrame(
        [(1, 100, 10)], "event_id bigint, user_id bigint, ts bigint"
    )
    right = spark.createDataFrame(
        [(7, 100, 5), (9, 100, 5), (8, 100, 5)],
        "click_id bigint, user_id bigint, ts bigint",
    )
    out = asof_join(
        left.withColumn("_j_ts", F.col("ts")),
        right.withColumn("_j_ts", F.col("ts")).select(
            "click_id", "user_id", F.col("ts").alias("click_ts"), "_j_ts"
        ),
        on=["user_id"],
        ts="_j_ts",
        right_cols=["click_id", "click_ts"],
        tiebreak="click_id",
    ).collect()
    assert len(out) == 1 and out[0].click_id == 9


def test_listings_df_skips_unreadable_dirs(spark, tmp_path):
    """ADVICE (low): the reference silently skips directories whose
    opendir fails (Search.cpp:210); a missing argv dir must not crash."""
    good = tmp_path / "good"
    good.mkdir()
    (good / "hit_a").touch()
    (good / "hit_b").touch()
    rows = listings_df(
        spark, [str(good), str(tmp_path / "does_not_exist"), str(good / "hit_a")]
    ).collect()
    assert sorted(r.name for r in rows) == ["hit_a", "hit_b"]


def test_distributed_cumsum_null_values(spark):
    """ADVICE (low): a range bucket whose values are all NULL must
    contribute 0 to downstream offsets, not crash the driver loop."""
    rows = [(i, None if i < 50 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    out = distributed_cumsum(df, "k", "v", "cum", num_partitions=8).collect()
    by_k = {r.k: r.cum for r in out}
    assert by_k[49] is None or by_k[49] == 0  # SUM-over-nulls semantics
    assert by_k[99] == 50


def test_distributed_cumsum_grouped_matches_window(spark):
    """The grouped two-phase cumsum must equal the single-task
    Window.partitionBy(group) form bit-for-bit."""
    from pyspark.sql.window import Window

    rows = [(i, "train" if i % 10 < 8 else "holdout", (i * 37) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k bigint, grp string, v bigint")
    got = {
        (r.grp, r.k): r.cum
        for r in distributed_cumsum_grouped(df, ["grp"], "k", "v", "cum", num_partitions=8).collect()
    }
    w = Window.partitionBy("grp").orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.grp, r.k): r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_pii_scrub_redacts_planted_pii(spark, tmp_path):
    """The corpus has no PII, so the registered query is a verified no-op
    there; this planted fixture proves the redaction actually fires and
    still matches the DuckDB oracle bit-for-bit."""
    rows = [
        (0, "contact bob.smith+spam@example.co.uk for details"),
        (1, "server at 192.168.10.254 timed out"),
        (2, "call +1 415 555-0100 now"),
        (3, "mixed a@b.io and 10.0.0.1 and +44 20 7946 0958 here"),
        (4, "clean text with no identifiers at all"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(f"{sf_dir}/documents.parquet")

    q = REGISTRY["pii_scrub"]
    got = {r.doc_id: (r.clean_text, r.n_pii) for r in q.fn(spark, sf_dir).collect()}
    assert got[0] == ("contact <EMAIL> for details", 1)
    assert got[1] == ("server at <IP> timed out", 1)
    assert got[2] == ("call <PHONE> now", 1)
    assert got[3][1] == 3 and "<EMAIL>" in got[3][0] and "<IP>" in got[3][0]
    assert got[4] == ("clean text with no identifiers at all", 0)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle = {r[0]: (r[1], r[2]) for r in con.execute(q.oracle).fetchall()}
    con.close()
    assert got == oracle


def test_decontamination_flags_duplicated_eval_doc(spark, tmp_path):
    """A training doc sharing a 5-gram window with an eval doc must be
    flagged; unrelated docs must not."""
    eval_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, eval_text),                                   # eval (0 % 50 == 0)
        (1, "prefix words then alpha beta gamma delta epsilon trailing"),
        (2, "completely different tokens nothing shared here at all"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(f"{sf_dir}/documents.parquet")
    out = {
        (r.train_id, r.eval_id): r.n_shared_grams
        for r in REGISTRY["decontaminate_eval_overlap"].fn(spark, sf_dir).collect()
    }
    assert out == {(1, 0): 1}  # one shared 5-gram window, doc 2 clean


def test_grouped_cumsum_plan_parallelism(spark):
    """The flagship's packing stage must partition its window by
    (group, bucket), never by the 2-value split alone."""
    df = spark.createDataFrame(
        [(i, "train" if i % 2 == 0 else "holdout", 1) for i in range(100)],
        "k bigint, grp string, v bigint",
    )
    plan = distributed_cumsum_grouped(
        df, ["grp"], "k", "v", "cum", num_partitions=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "_pid" in plan  # bucket key present in the window partitioning


def test_lsh_text_source_contract_violation_fails_loudly(spark, sf_small):
    """Round-2 advice: a text_source that is NOT a 1:1 superset of the
    candidate ids must raise, not silently drop/multiply pairs. A
    half-missing source violates coverage; the default (no text_source)
    path must stay guard-free and succeed."""
    import pytest as _pytest

    from mapreduce__spark.operators.dedup import lsh_near_duplicate_pairs
    from mapreduce__spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    bad_source = docs.where(F.col("doc_id") % 2 == 0)  # misses odd-id candidates
    with _pytest.raises(ValueError, match="text_source covers"):
        lsh_near_duplicate_pairs(docs, 0.8, text_source=bad_source).collect()
    assert lsh_near_duplicate_pairs(docs, 0.8).collect()


def test_incremental_ref_signatures_contract_violations_fail_loudly(spark, sf_small):
    """Round-3 advice: with a CALLER-provided ref_signatures snapshot,
    (a) ref_docs missing a candidate ref id (stale snapshot) must raise,
    not silently drop pairs through the verify join, and (b) overlapping
    new/ref doc_ids on the candidate set must raise, not emit
    self-comparisons. The default (derived-signature) path stays
    guard-free."""
    import pytest as _pytest

    from mapreduce__spark.operators.dedup import (
        lsh_incremental_pairs,
        minhash_signature,
    )
    from mapreduce__spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    is_new = F.col("doc_id") % 5 == 0
    new, ref = docs.where(is_new), docs.where(~is_new)
    sigs = minhash_signature(ref, 16)

    stale_ref = ref.where(F.col("doc_id") % 2 == 0)  # misses odd-id candidates
    with _pytest.raises(ValueError, match="stale or mismatched"):
        lsh_incremental_pairs(
            new, stale_ref, 0.8, ref_signatures=sigs
        ).collect()

    # ref side = FULL corpus, so every new doc also sits in ref → its
    # identical bands meet themselves → overlap on the candidate set.
    with _pytest.raises(ValueError, match="disjoint doc_ids"):
        lsh_incremental_pairs(
            new, docs, 0.8, ref_signatures=minhash_signature(docs, 16)
        ).collect()

    # (c) a snapshot persisted under a DIFFERENT num_hashes must raise up
    # front: mismatched width would either throw an opaque array-index
    # error mid-join (ANSI) or fold NULL slots into constant band hashes
    # (silent recall loss) — and the coverage guard can't see either.
    with _pytest.raises(ValueError, match="ref_signatures width"):
        lsh_incremental_pairs(
            new, ref, 0.8, num_hashes=16, bands=8,
            ref_signatures=minhash_signature(ref, 8),
        ).collect()

    assert lsh_incremental_pairs(new, ref, 0.8, ref_signatures=sigs).collect()


def test_dialect_boundary_guards(spark):
    """Cross-engine dialect hazards on data the fixtures lack (empty
    text, zero-norm embeddings, NULL timestamps, empty arrays): the
    Spark side must neither crash under default ANSI mode nor diverge
    from the DuckDB conventions the oracles state."""
    import pytest as _pytest  # noqa: F401
    from pyspark.sql import functions as F

    from mapreduce__spark.functions.text import digit_ratio_expr, quality_keep_expr
    from mapreduce__spark.functions.vectors import as_double_vec, cosine_sim
    from mapreduce__spark.operators.asof import asof_join

    # empty text: DuckDB division by zero is NULL; ANSI Spark would have
    # thrown DIVIDE_BY_ZERO and aborted the whole quality pass.
    df = spark.createDataFrame([("",), ("hello world 123",)], "text string")
    rows = df.select(
        digit_ratio_expr(F.col("text")).alias("r"),
        quality_keep_expr(F.col("text")).alias("keep"),
    ).collect()
    assert rows[0].r is None and rows[0].keep in (None, False)
    assert rows[1].r is not None

    # zero-norm vector: -1.0 (DuckDB list_cosine_similarity convention,
    # ranks failed-embed vectors last), not an ANSI 0/0 crash.
    vdf = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>")
    got = vdf.select(cosine_sim(as_double_vec(F.col("a")), as_double_vec(F.col("b"))).alias("s")).first()
    assert got.s == -1.0

    # NULL-ts right rows can never be a "most recent match" — without the
    # filter Spark's NULLS FIRST window carried them to every left row.
    left = spark.createDataFrame([(1, 5, "L")], "k int, ts int, tag string")
    right = spark.createDataFrame([(1, None, 9.0)], "k int, ts int, px double")
    out = asof_join(left, right, ["k"], "ts", ["px"]).collect()
    assert [(r.tag, r.px) for r in out] == [("L", None)]

    # empty-array element access: NULL (DuckDB embedding[1]), not an
    # ANSI INVALID_ARRAY_INDEX error.
    adf = spark.createDataFrame([([],)], "v array<double>")
    assert adf.select(F.get("v", 0).alias("x")).first().x is None
