"""As-of (most-recent-match) join — a time-series operator Spark lacks as
a primitive.

Semantics: for each left row, attach the columns of the LATEST right row
with the same key and right.ts <= left.ts (the standard trades⋈quotes /
events⋈snapshots join).

Spark-first plan — the union-and-carry-forward encoding, NOT a range
self-join: tag both inputs, union, and run ONE window pass per key ordered
by (ts, side) where right rows sort before left rows at equal timestamps
(so `>=` matches inclusively); `last(right_payload, ignorenulls)` carries
the most recent right row forward; keep left rows.

Scale: one shuffle on the key + a sort within partitions — the same cost
as a sort-merge join, with no range-explosion. A naive BETWEEN theta join
is quadratic per key; this is O(n log n) per key and streams through the
window operator. Skewed keys salt the same way any window would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join; right_cols are carried from the matched right row
    (NULLs when no right row precedes). `tiebreak` orders rows at equal
    (ts, side) deterministically — give a unique column when inputs can
    tie."""
    carry = F.struct(*[F.col(c) for c in right_cols]).alias("_carry")
    null_carry = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_cols) + ">"
    ).alias("_carry")

    # Equi-join semantics for NULL keys: a NULL never equals anything, so
    # a NULL-keyed right row matches NO left row. Window.partitionBy
    # groups NULLs into one partition — without this filter a NULL-keyed
    # left row would receive a NULL-keyed right row's payload, a phantom
    # match no keyed join (or the DuckDB ASOF oracle) would produce.
    # NULL-keyed LEFT rows stay: they keep their own partition, no right
    # rows remain in it, and they surface with NULL carried columns —
    # exactly a left join's treatment of an unmatchable key.
    for k in on:
        right = right.where(F.col(k).isNotNull())
    # A NULL-timestamped right row can never be anyone's "most recent
    # match" (right.ts <= left.ts is never true for NULL) — but Spark's
    # ASC window default puts NULLs FIRST, so it would be carried forward
    # to EVERY left row in its key as a phantom match. NULL-ts left rows
    # are fine: they sort before every real right row and surface with
    # NULL carried columns, the no-match answer the semantics require.
    right = right.where(F.col(ts).isNotNull())

    left_cols = [c for c in left.columns]
    l_tagged = left.select(
        *on, F.col(ts).alias("_ts"), F.lit(1).alias("_side"), null_carry,
        F.struct(*[F.col(c) for c in left_cols]).alias("_left"),
    )
    r_tagged = right.select(
        *on, F.col(ts).alias("_ts"), F.lit(0).alias("_side"), carry,
        F.lit(None).cast(l_tagged.schema["_left"].dataType.simpleString()).alias("_left"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    order = [F.col("_ts"), F.col("_side")]
    if tiebreak is not None:
        # orders equal-(ts) RIGHT rows among themselves; left rows already
        # sort after right via _side, so their (null) tiebreak is inert
        order.append(F.col(f"_carry.{tiebreak}"))
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn("_match", F.last("_carry", ignorenulls=True).over(w))
    return matched.where(F.col("_side") == 1).select(
        *[F.col(f"_left.{c}").alias(c) for c in left_cols],
        *[F.col(f"_match.{c}").alias(c) for c in right_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Nearest-match as-of join (pandas merge_asof direction='nearest'):
    each left row gets the right row minimizing |right.ts - left.ts|
    within its key, ties toward the EARLIER (backward) candidate — the
    sensor-alignment / snapshot-reconciliation mode where "most recent"
    is the wrong default because the closest reading may be just ahead.

    Same union-and-carry idiom as :func:`asof_join`, run in BOTH
    directions over the one shuffled partition: the ascending pass
    carries the latest right row at-or-before each left row, a second
    window over the SAME partitioning sorted descending carries the
    earliest right row at-or-after it (right rows order before left rows
    at equal ts in both passes, so an equal-ts right is the backward
    match with distance zero), and a scan-stage pick compares the two
    integer-microsecond distances. Cost: one shuffle on the key + two
    in-partition sorts — still no range explosion, still O(n log n) per
    key. NULL keys and NULL right timestamps follow asof_join's
    equi-join discipline (filtered from the right, unmatched on the
    left)."""
    carry = F.struct(
        *[F.col(c) for c in right_cols], F.col(ts).alias("_rts")
    ).alias("_carry")
    null_carry = F.lit(None).cast(
        "struct<"
        + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_cols)
        + f",_rts:{dict(right.dtypes)[ts]}>"
    ).alias("_carry")
    for k in on:
        right = right.where(F.col(k).isNotNull())
    right = right.where(F.col(ts).isNotNull())

    left_cols = [c for c in left.columns]
    l_tagged = left.select(
        *on, F.col(ts).alias("_ts"), F.lit(1).alias("_side"), null_carry,
        F.struct(*[F.col(c) for c in left_cols]).alias("_left"),
    )
    r_tagged = right.select(
        *on, F.col(ts).alias("_ts"), F.lit(0).alias("_side"), carry,
        F.lit(None)
        .cast(l_tagged.schema["_left"].dataType.simpleString())
        .alias("_left"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    back_order = [F.col("_ts").asc(), F.col("_side").asc()]
    fwd_order = [F.col("_ts").desc(), F.col("_side").asc()]
    if tiebreak is not None:
        # ASC in BOTH passes: `last` carries the latest row in walk
        # order, so among equal-ts right rows both directions resolve to
        # the MAX tiebreak — the same convention asof_join pins
        back_order.append(F.col(f"_carry.{tiebreak}").asc())
        fwd_order.append(F.col(f"_carry.{tiebreak}").asc())
    frame = (Window.unboundedPreceding, 0)
    wb = Window.partitionBy(*on).orderBy(*back_order).rowsBetween(*frame)
    wf = Window.partitionBy(*on).orderBy(*fwd_order).rowsBetween(*frame)
    matched = unioned.withColumn(
        "_back", F.last("_carry", ignorenulls=True).over(wb)
    ).withColumn("_fwd", F.last("_carry", ignorenulls=True).over(wf))
    # timestamp subtraction yields a DayTimeInterval — directly
    # comparable and timezone-free, so this works for TIMESTAMP and
    # TIMESTAMP_NTZ alike (unix_micros rejects NTZ)
    db = F.col("_ts") - F.col("_back._rts")
    df_ = F.col("_fwd._rts") - F.col("_ts")
    pick_back = F.col("_back").isNotNull() & (
        F.col("_fwd").isNull() | (db <= df_)
    )
    best = F.when(pick_back, F.col("_back")).otherwise(F.col("_fwd"))
    return (
        matched.where(F.col("_side") == 1)
        .withColumn("_best", best)
        .select(
            *[F.col(f"_left.{c}").alias(c) for c in left_cols],
            *[F.col(f"_best.{c}").alias(c) for c in right_cols],
        )
    )
