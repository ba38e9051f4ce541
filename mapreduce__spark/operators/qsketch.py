"""Mergeable quantile sketches for unbounded-cardinality double measures.

The exact percentile machinery elsewhere in this repo
(incremental_percentiles, stream_quantile_histogram, equidepth_deciles)
rides a (value -> count) histogram, whose state is bounded only when the
MEASURE's cardinality is bounded. A high-cardinality DOUBLE measure
(latencies, losses, model scores) needs a sketch whose size is bounded
by something data-independent. Two mergeable constructions live here,
both pure DataFrame expressions (JVM-side, one bounded shuffle, no UDF):

1. **Log-gamma relative-error sketch** (:func:`dd_sketch`) — the
   DDSketch construction (Masson, Rim & Lee, "DDSketch: A Fast and
   Fully-Mergeable Quantile Sketch with Relative-Error Guarantees",
   PVLDB 12(12), 2019): bucket a value x>0 into index ceil(log_g(x))
   with g = (1+alpha)/(1-alpha). Bucket COUNTS are exact, so the bucket
   chosen for quantile q is exactly the one containing the rank-q value,
   and the bucket's midpoint estimate 2*g^i/(g+1) is within relative
   error alpha of it — a hard guarantee, not a statistical one. The
   bucket-index universe is FIXED by the double range (|idx| <=
   ceil(ln(DBL_MAX)/ln(g)) ~ 3.6e4 at alpha=0.01), so sketch size is
   data-independent: counts per (sign-section, index), mergeable by
   plain addition — sketch(A ++ B) EQUALS merge(sketch(A), sketch(B))
   row-for-row, the monoid law the streaming twin and partition-parallel
   build both lean on.

2. **Dyadic integer sketch** (:func:`dyadic_sketch`) — power-of-two
   buckets over an integer measure via the bit length of the value
   (length(bin(n))), <= 64 buckets for ANY bigint: integer-exact in
   every engine, so unlike the log-gamma form it is cross-engine
   hash-checkable (the oracle-attested face of the same mergeable-
   bounded-state design; relative error <= 1 i.e. factor-2 brackets,
   with exact [lo, hi] bucket bounds emitted).

Scale: the build is a scan-stage projection plus one groupBy over
bounded-cardinality keys (map-side partial aggregation shrinks every
partition to <= universe-size rows before the shuffle); quantile reads
are windows PARTITIONED BY the group key over the bounded bucket rows.
Nothing is collected; nothing grows with row count or value cardinality.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gamma_for_alpha(alpha: float) -> float:
    """DDSketch bucket base for a relative-error target alpha."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    return (1.0 + alpha) / (1.0 - alpha)


def _bucket_cols(value: Column, gamma: float) -> tuple[Column, Column]:
    """(sgn, idx) bucket key for a double measure.

    sgn in {-1, 0, 1} splits the line into the three DDSketch sections
    (mirrored negative store, exact-zero bucket, positive store); idx is
    ceil(log_gamma(|x|)) within a section, 0 in the zero section. Rows
    ordered by (sgn, sgn*idx) are in value order: negatives descend in
    magnitude as sgn*idx = -idx ascends, then zero, then positives.
    """
    lg = math.log(gamma)
    sgn = F.when(value > 0, F.lit(1)).when(value < 0, F.lit(-1)).otherwise(F.lit(0))
    idx = F.when(
        value != 0, F.ceil(F.log(F.abs(value)) / F.lit(lg)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return sgn.cast("int"), idx


def dd_sketch(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    alpha: float = 0.01,
) -> DataFrame:
    """Build the log-gamma sketch: one row per (keys..., sgn, idx) with
    the exact count n. The returned DataFrame IS the sketch — bounded by
    the fixed index universe per key, mergeable via :func:`dd_merge`."""
    keys = keys or []
    gamma = gamma_for_alpha(alpha)
    v = F.col(value_col)
    sgn, idx = _bucket_cols(v, gamma)
    return (
        df.where(v.isNotNull())
        .select(*keys, sgn.alias("sgn"), idx.alias("idx"))
        .groupBy(*keys, "sgn", "idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def dd_merge(a: DataFrame, b: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Merge two sketches over the same keys: bucket-wise count addition
    (the commutative-monoid merge — associative, exact)."""
    keys = keys or []
    return (
        a.unionAll(b)
        .groupBy(*keys, "sgn", "idx")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def dd_quantiles(
    sketch: DataFrame,
    qs: list[tuple[int, int]],
    keys: list[str] | None = None,
    alpha: float = 0.01,
) -> DataFrame:
    """Read discrete quantiles off a sketch: for each q = num/den the
    estimate for the bucket containing the rank-ceil(q*n) value
    (percentile_disc semantics on the bucketed line). Quantile targets
    are exact fractions so rank arithmetic stays integer-exact.

    Returns one row per key group: (keys..., n_rows, q_<num>_<den> ...).
    The cumulative scan is a window PARTITIONED BY the keys over the
    bounded bucket rows — never a one-task global window."""
    from pyspark.sql import Window

    keys = keys or []
    gamma = gamma_for_alpha(alpha)
    # value-order walk within each key group (bounded rows per group)
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        if keys
        else Window.partitionBy(F.lit(1))
    )
    order = [F.col("sgn").asc(), (F.col("sgn") * F.col("idx")).asc()]
    cum = sketch.select(
        *keys,
        "sgn",
        "idx",
        "n",
        F.sum("n").over(w.orderBy(*order)).alias("cum"),
        F.sum("n").over(w).alias("total"),
    )
    # midpoint estimate of the bucket (gamma^(i-1), gamma^i]: within
    # alpha of every value in it (0 for the exact-zero bucket)
    est = F.when(F.col("sgn") == 0, F.lit(0.0)).otherwise(
        F.col("sgn")
        * (2.0 * F.pow(F.lit(gamma), F.col("idx")) / F.lit(gamma + 1.0))
    )
    aggs = [F.max("total").cast("bigint").alias("n_rows")]
    for num, den in qs:
        # percentile_disc picks the smallest value with cum >= ceil(q*n);
        # for integer cum that is exactly cum*den >= num*total — pure
        # bigint arithmetic, no float rank to lose precision on
        qualifies = F.col("cum") * F.lit(den) >= F.lit(num) * F.col("total")
        aggs.append(F.min(F.when(qualifies, est)).alias(f"q_{num}_{den}"))
    # F.min over the conditional estimate picks the FIRST qualifying
    # bucket in value order because est is monotone in the walk order
    return cum.groupBy(*keys).agg(*aggs)


def dyadic_sketch(
    df: DataFrame, int_col: Column, keys: list[str] | None = None
) -> DataFrame:
    """Power-of-two sketch over a non-negative integer measure: bucket =
    bit length of the value (length(bin(n)); 0 keeps bucket 0), <= 64
    buckets for any bigint. Integer-exact in both Spark and DuckDB, so
    queries over it are fully oracle-checkable."""
    keys = keys or []
    bl = F.when(int_col > 0, F.length(F.bin(int_col))).otherwise(F.lit(0))
    return (
        df.select(*keys, bl.cast("bigint").alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
