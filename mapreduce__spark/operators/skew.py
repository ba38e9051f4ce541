"""Skew-handling joins: salting.

AQE's skew-join splitting (on by default in the engine session) handles
most skew at runtime by splitting oversized shuffle partitions. Salting is
the explicit fallback for the pathological case AQE can't fix: a SINGLE
join key so hot that one task would own it entirely (a null-key flood, a
celebrity user, an empty-string document).

`salted_join` replicates the build side `salt` times and scatters the
probe side across the replicas, so a hot key's rows land on `salt` tasks
instead of one:

    probe:  key, salt_i = pmod(xxhash64(unique_col | all columns), salt)
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
    unique_col: str | None = None,
) -> DataFrame:
    """Equi-join with the build side salted `salt` ways.

    `how` supports 'inner' and 'left' (probe-preserving); the probe side
    keeps one row per original row in all cases.

    `unique_col` names a (near-)unique probe column to derive the salt
    from — pass it whenever one exists. The fallback hashes ALL probe
    columns, which stays deterministic under task retries (a rand()
    salt is the classic nondeterministic-repartition hazard: a partial
    stage retry can re-salt rows into different reduce partitions) but
    CANNOT scatter byte-identical duplicate probe rows — they hash
    alike, so a hot key whose rows are full duplicates (a null-key
    flood of empty records) still funnels one task. With a unique id
    column the scatter is uniform even then.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    salt_col = "_salt"
    if salt_col in probe.columns or salt_col in build.columns:
        raise ValueError(
            "salted_join: '_salt' is reserved; rename the existing column "
            "(silently clobbering it would corrupt the caller's data)"
        )
    src = (
        [F.col(unique_col)]
        if unique_col is not None
        else [F.col(c) for c in probe.columns]
    )
    probe_s = probe.withColumn(salt_col, F.pmod(F.xxhash64(*src), F.lit(salt)))
    build_s = build.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    joined = probe_s.join(build_s, on + [salt_col], how)
    return joined.drop(salt_col)
