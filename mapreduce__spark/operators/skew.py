"""Skew-handling joins: salting.

AQE's skew-join splitting (on by default in the engine session) handles
most skew at runtime by splitting oversized shuffle partitions. Salting is
the explicit fallback for the pathological case AQE can't fix: a SINGLE
join key so hot that one task would own it entirely (a null-key flood, a
celebrity user, an empty-string document).

`salted_join` replicates the build side `salt` times and scatters the
probe side across the replicas, so a hot key's rows land on `salt` tasks
instead of one:

    probe:  key, salt_i = pmod(hash(unique_col), salt)
    build:  key × explode(sequence(0, salt-1))
    join on (key, salt_i)

Semantics are identical to the inner equi-join (each probe row still meets
each build row exactly once). Cost: build side inflated `salt`x — use for
skewed fact⋈dim-ish joins where the build side is the smaller one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the build side salted `salt` ways.

    `how` supports 'inner' and 'left' (probe-preserving); the probe side
    keeps one row per original row in all cases.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    salt_col = "_salt"
    # Scatter probe rows deterministically but uniformly: hash ALL probe
    # columns (monotonically_increasing_id would break retried-task
    # determinism).
    probe_s = probe.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(salt))
    )
    build_s = build.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    joined = probe_s.join(build_s, on + [salt_col], how)
    return joined.drop(salt_col)
