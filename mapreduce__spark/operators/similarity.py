"""Similarity search over embedding columns.

Two tiers, per the standard ANN playbook:

* brute-force top-k cosine — the exact baseline: broadcast the (small)
  query set against the full corpus, score with codegen'd vector
  expressions, take top-k per query with a rank-pushdown window. Exact,
  oracle-checkable, and the right plan whenever |queries| is small: the
  corpus is scanned ONCE, never shuffled (scores reduce to k rows per
  query per partition before the window shuffle).
* random-hyperplane LSH bucketing — the scale path: a deterministic
  signature per vector (sign bits of dot products with fixed hyperplanes),
  candidates restricted to same-bucket (+ multiprobe neighbors), exact
  re-scoring of candidates only. Recall is asserted against brute force in
  tests rather than hash-matched (approximate by design).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce__spark.functions.vectors import as_double_vec, cosine_sim
from mapreduce__spark.sources.tables import ensure_parallelism

LSH_SEED = 42


def brute_force_topk(
    emb: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).

    Output: (query_id, neighbor_id, score, rank) — rank is deterministic
    (score desc, neighbor_id asc).
    """
    vecs = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    q = vecs.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        vecs.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim(F.col("qv"), F.col("v")).alias("s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("s"), 4).alias("score"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes (seeded, driver-side constants that
    ship with the plan — no RNG on executors)."""
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_signature(emb: DataFrame, dim: int = 64, n_planes: int = 8) -> DataFrame:
    """Sign-bit signature: bucket = Σ (dot(v, plane_p) > 0) << p."""
    vecs = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    planes = _hyperplanes(dim, n_planes)
    sig = None
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col("v"),
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = term if sig is None else (sig + term)
    return vecs.select("vec_id", "v", sig.alias("bucket"))


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: exact re-scoring restricted to LSH-bucket candidates.

    At 100 TB: signatures are scan-stage expressions; the candidate join
    is an equi-join on `bucket` (≈ n/2^planes candidates per query probe),
    and only candidates are scored. Multiprobe explodes each query into
    its own bucket PLUS the n_planes hamming-1 neighbors — recall rises
    steeply for (n_planes+1)x the candidates, still an equi-join (never a
    hamming-distance theta join, which would be a nested loop).
    """
    sig = lsh_bucket_signature(emb, dim=dim, n_planes=n_planes)
    q = sig.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[F.col("qbucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
    else:
        probes = F.array(F.col("qbucket"))
    q_probed = q.select("query_id", "qv", F.explode(probes).alias("pbucket"))
    cand = sig.join(F.broadcast(q_probed), F.col("bucket") == F.col("pbucket")).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_sim(F.col("qv"), F.col("v")).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("s"), 4).alias("score"), "rank")
    )


def embedding_near_dup_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1<id2, cosine ≥ threshold).

    Written as the exact all-pairs form for oracle parity; the scale path
    is the same computation restricted to LSH-bucket candidates (swap the
    crossJoin for the bucket equi-join above).
    """
    vecs = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    a = vecs.select(F.col("vec_id").alias("id1"), F.col("v").alias("v1"))
    b = vecs.select(F.col("vec_id").alias("id2"), F.col("v").alias("v2"))
    s = cosine_sim(F.col("v1"), F.col("v2"))
    return (
        a.crossJoin(b)
        .where(F.col("id1") < F.col("id2"))
        .where(s >= threshold)
        .select("id1", "id2", F.round(s, 4).alias("cosine"))
    )
