"""asof_join unit semantics: inclusive matching, no-match NULLs, equal-ts
ordering, tiebreak determinism."""

from __future__ import annotations

import datetime as dt

from mapreduce__spark.operators.asof import asof_join


def ts(s):
    return dt.datetime.fromisoformat(s)


def run(spark, left_rows, right_rows, tiebreak=None):
    left = spark.createDataFrame(left_rows, "k int, t timestamp, lid int")
    right = spark.createDataFrame(right_rows, "k int, t timestamp, rid int")
    out = asof_join(left, right, on=["k"], ts="t", right_cols=["rid"], tiebreak=tiebreak)
    return {r.lid: r.rid for r in out.collect()}


def test_basic_most_recent_and_nulls(spark):
    got = run(
        spark,
        [(1, ts("2024-01-01T10:00"), 100), (1, ts("2024-01-01T08:00"), 101),
         (2, ts("2024-01-01T10:00"), 102)],
        [(1, ts("2024-01-01T09:00"), 200), (1, ts("2024-01-01T09:30"), 201),
         (3, ts("2024-01-01T00:00"), 202)],
    )
    assert got == {100: 201, 101: None, 102: None}


def test_equal_timestamp_matches_inclusively(spark):
    """right row at EXACTLY the left ts must match (>= semantics)."""
    got = run(
        spark,
        [(1, ts("2024-01-01T09:00"), 100)],
        [(1, ts("2024-01-01T09:00"), 200)],
    )
    assert got == {100: 200}


def test_tiebreak_orders_equal_right_rows(spark):
    """two right rows at the same ts: the tiebreak column decides (max
    sorts last -> wins the carry-forward)."""
    got = run(
        spark,
        [(1, ts("2024-01-01T10:00"), 100)],
        [(1, ts("2024-01-01T09:00"), 201), (1, ts("2024-01-01T09:00"), 205),
         (1, ts("2024-01-01T09:00"), 203)],
        tiebreak="rid",
    )
    assert got == {100: 205}


def test_phase_timer_write(tmp_path):
    from mapreduce__spark.metrics import PhaseTimer

    t = PhaseTimer()
    with t.phase("map_shuffle"):
        pass
    p = tmp_path / "engine.log"
    t.write(str(p))
    t.write(str(p))  # append semantics like the reference log
    lines = p.read_text().strip().splitlines()
    assert len(lines) == 2 and all("map_shuffle took" in l for l in lines)


def test_null_keys_never_match(spark):
    """Equi-join semantics: NULL keys equal nothing. A NULL-keyed left
    row must surface with NULL carried columns — not receive a
    NULL-keyed right row's payload through the shared window partition."""
    from mapreduce__spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, 5, "L1"), (1, 5, "L2")], "k int, ts int, tag string"
    )
    right = spark.createDataFrame(
        [(None, 3, 100.0), (1, 3, 200.0)], "k int, ts int, px double"
    )
    out = {
        r.tag: r.px
        for r in asof_join(left, right, ["k"], "ts", ["px"]).collect()
    }
    assert out == {"L1": None, "L2": 200.0}


def run_nearest(spark, left_rows, right_rows, tiebreak=None):
    from mapreduce__spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(left_rows, "k int, t timestamp, lid int")
    right = spark.createDataFrame(right_rows, "k int, t timestamp, rid int")
    out = asof_join_nearest(
        left, right, on=["k"], ts="t", right_cols=["rid"], tiebreak=tiebreak
    )
    return {r.lid: r.rid for r in out.collect()}


def test_nearest_picks_closest_in_either_direction(spark):
    got = run_nearest(
        spark,
        [(1, ts("2024-01-01T10:00"), 100),   # 9:58 is closer than 10:05
         (1, ts("2024-01-01T10:04"), 101),   # 10:05 is closer than 9:58
         (2, ts("2024-01-01T10:00"), 102)],  # only a FUTURE right exists
        [(1, ts("2024-01-01T09:58"), 200), (1, ts("2024-01-01T10:05"), 201),
         (2, ts("2024-01-01T12:00"), 202)],
    )
    assert got == {100: 200, 101: 201, 102: 202}


def test_nearest_tie_resolves_backward(spark):
    """Equal |delta| before and after -> the EARLIER right row wins (the
    merge_asof 'nearest' convention this operator declares)."""
    got = run_nearest(
        spark,
        [(1, ts("2024-01-01T10:00"), 100)],
        [(1, ts("2024-01-01T09:55"), 200), (1, ts("2024-01-01T10:05"), 201)],
    )
    assert got == {100: 200}


def test_nearest_equal_ts_and_no_match_nulls(spark):
    got = run_nearest(
        spark,
        [(1, ts("2024-01-01T10:00"), 100), (3, ts("2024-01-01T10:00"), 103),
         (None, ts("2024-01-01T10:00"), 104)],
        [(1, ts("2024-01-01T10:00"), 200),   # exact hit, distance zero
         (None, ts("2024-01-01T09:59"), 201),  # NULL key: matches nobody
         (1, None, 202)],                      # NULL ts: matches nobody
    )
    assert got == {100: 200, 103: None, 104: None}


def test_nearest_tiebreak_on_equal_right_rows(spark):
    """Duplicate right rows at one ts resolve to the MAX tiebreak in
    both directions — asof_join's convention."""
    got = run_nearest(
        spark,
        [(1, ts("2024-01-01T10:00"), 100), (1, ts("2024-01-01T09:00"), 101)],
        [(1, ts("2024-01-01T09:30"), 200), (1, ts("2024-01-01T09:30"), 205)],
        tiebreak="rid",
    )
    # 10:00 -> backward to 09:30; 09:00 -> forward to 09:30; both pick 205
    assert got == {100: 205, 101: 205}


def test_nearest_matches_bruteforce_on_random_rows(spark):
    """Property gate: on random (key, ts) layouts — duplicate
    timestamps, keys with only-before / only-after / no right rows —
    the two-pass window operator must equal a Python argmin reference
    implementing the declared rule (min |delta|, ties backward, right
    rows pre-deduped to max tiebreak per ts)."""
    import random

    rng = random.Random(1107)
    for trial in range(4):
        left_rows, right_rows = [], []
        lid = iter(range(10_000))
        rid = iter(range(10_000, 20_000))
        for k in range(1, 6):
            for _ in range(rng.randint(1, 8)):
                left_rows.append(
                    (k, ts("2024-01-01T00:00") + dt.timedelta(
                        minutes=rng.randint(0, 120)), next(lid))
                )
            for _ in range(rng.randint(0, 6)):
                right_rows.append(
                    (k, ts("2024-01-01T00:00") + dt.timedelta(
                        minutes=rng.randint(0, 120)), next(rid))
                )
        # pre-dedup rights: max rid per (k, ts) — the query convention
        dedup: dict = {}
        for k, t, r in right_rows:
            key = (k, t)
            dedup[key] = max(dedup.get(key, -1), r)
        rdedup = [(k, t, r) for (k, t), r in dedup.items()]

        def ref(k, t):
            cands = [(abs((rt - t).total_seconds()),
                      0 if rt <= t else 1, rt, r)
                     for (rk, rt, r) in rdedup if rk == k]
            return min(cands)[3] if cands else None

        expect = {l: ref(k, t) for (k, t, l) in left_rows}
        got = run_nearest(spark, left_rows, rdedup)
        assert got == expect, f"trial {trial}"
