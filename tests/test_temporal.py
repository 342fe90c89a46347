"""As-of / range join semantics and plan shapes.

Oracle parity (DuckDB ASOF JOIN / inequality join) is covered by
test_oracle_parity; here: boundary inclusivity, no-match NULLs,
tolerance, bucket-boundary crossing, and the no-nested-loop plan
guarantees.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from datetime import datetime

from pyspark.sql import functions as F

from chinook_music_database_analysis_spark.operators.temporal import asof_join, range_join


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),
            (2, 10, _ts("2024-01-01 11:00:00")),
            (3, 20, _ts("2024-01-01 09:00:00")),
        ],
        "lid long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 09:30:00")),
            (101, 10, _ts("2024-01-01 10:00:00")),  # == left lid=1 ts (inclusive)
            (102, 10, _ts("2024-01-01 10:59:00")),
            (103, 20, _ts("2024-01-01 09:30:00")),  # after left lid=3 -> no match
        ],
        "rid long, user_id long, ts timestamp",
    )
    return left, right


def test_asof_inclusive_latest_and_null(spark):
    left, right = _frames(spark)
    rows = {r.lid: r for r in asof_join(left, right, key="user_id").collect()}
    assert rows[1].r_rid == 101  # ts == left ts matches (inclusive), beats 100
    assert rows[2].r_rid == 102  # latest of {100,101,102}
    assert rows[3].r_rid is None and rows[3].r_ts is None  # nothing at-or-before


def test_asof_tolerance_voids_stale_matches(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, key="user_id", tolerance_us=60_000_000)
    rows = {r.lid: r for r in out.collect()}
    assert rows[1].r_rid == 101  # gap 0 <= 60s
    assert rows[2].r_rid == 102  # gap 60s, inclusive
    assert rows[3].r_rid is None


def test_asof_plan_is_single_exchange_no_join(spark):
    left, right = _frames(spark)
    p = _plan(asof_join(left, right, key="user_id"))
    assert p.count("Exchange") == 1
    assert "Join" not in p and "CartesianProduct" not in p


def test_range_join_band_and_bucket_crossing(spark):
    w_us = 600_000_000  # 10 min
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:09:00"))], "lid long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (200, 10, _ts("2024-01-01 10:09:00")),  # == left ts: excluded (strict >)
            (201, 10, _ts("2024-01-01 10:11:00")),  # next bucket, in band
            (202, 10, _ts("2024-01-01 10:19:00")),  # == left ts + W: included
            (203, 10, _ts("2024-01-01 10:19:00.000001")),  # just past W: excluded
            (204, 99, _ts("2024-01-01 10:11:00")),  # other key
        ],
        "rid long, user_id long, ts timestamp",
    )
    got = sorted(
        r.rid_r for r in range_join(left, right, key="user_id", width_us=w_us).collect()
    )
    assert got == [201, 202]


def test_range_join_no_nested_loop(spark):
    left, right = _frames(spark)
    p = _plan(range_join(left, right, key="user_id", width_us=600_000_000))
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p


def test_range_join_pairs_unique_despite_replication(spark):
    # A pair whose band lies inside one bucket must not appear twice
    # (left is replicated to 2 buckets; the right row lives in exactly
    # one, so each pair joins exactly once).
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:30"))], "lid long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(300, 10, _ts("2024-01-01 10:00:45"))], "rid long, user_id long, ts timestamp"
    )
    out = range_join(left, right, key="user_id", width_us=600_000_000).collect()
    assert len(out) == 1


# ---------------------------------------------------------------------------
# Randomized brute-force equivalence (seeded, deterministic)
# ---------------------------------------------------------------------------


def _random_frames(spark, seed: int, n_left: int = 60, n_right: int = 80):
    import random

    rng = random.Random(seed)
    base = 1_700_000_000_000_000  # epoch micros
    left = [
        (i, rng.randrange(5), base + rng.randrange(0, 3_600_000_000))
        for i in range(n_left)
    ]
    right = [
        (100 + i, rng.randrange(5), base + rng.randrange(0, 3_600_000_000))
        for i in range(n_right)
    ]
    ldf = spark.createDataFrame(
        [(i, k, u) for i, k, u in left], "lid long, user_id long, us long"
    ).select("lid", "user_id", F.timestamp_micros("us").alias("ts"))
    rdf = spark.createDataFrame(
        [(i, k, u) for i, k, u in right], "rid long, user_id long, us long"
    ).select("rid", "user_id", F.timestamp_micros("us").alias("ts"))
    return left, right, ldf, rdf


def test_asof_matches_bruteforce_on_random_data(spark):
    for seed in (7, 23, 99):
        left, right, ldf, rdf = _random_frames(spark, seed)
        got = {
            r.lid: r.r_rid for r in asof_join(ldf, rdf, key="user_id").collect()
        }
        for lid, k, lu in left:
            cands = [(ru, rid) for rid, rk, ru in right if rk == k and ru <= lu]
            want = max(cands)[1] if cands else None
            assert got[lid] == want, (seed, lid)


def test_range_join_matches_bruteforce_on_random_data(spark):
    w = 600_000_000
    for seed in (11, 42):
        left, right, ldf, rdf = _random_frames(spark, seed)
        pairs = range_join(ldf, rdf, key="user_id", width_us=w).collect()
        got = {(r.lid, r.rid_r) for r in pairs}
        want = {
            (lid, rid)
            for lid, lk, lu in left
            for rid, rk, ru in right
            if rk == lk and lu < ru <= lu + w
        }
        assert got == want, seed


def test_scd2_intervals_partition_each_users_timeline(spark):
    """SCD2 invariants the oracle's hash can't state directly: versions
    are dense from 1, intervals are contiguous (valid_to == next
    valid_from), consecutive states actually differ (compression
    worked), exactly one open current row per user, and the history
    starts at the user's first event."""
    from chinook_music_database_analysis_spark.operators.temporal import scd2_history
    from chinook_music_database_analysis_spark.sources import load_tables

    from conftest import SF_TEST_DIR

    ev = load_tables(spark, SF_TEST_DIR)["events"]
    first_ts = {
        r.user_id: r.m
        for r in ev.groupBy("user_id").agg(F.min("ts").alias("m")).collect()
    }
    by_user = {}
    for r in scd2_history(ev).collect():
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user and set(by_user) == set(first_ts)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        assert rows[0].valid_from == first_ts[uid]
        assert [r.is_current for r in rows].count(True) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from, uid
            assert a.state != b.state, uid


def test_asof_join_carries_whole_row_not_mixed_columns(spark):
    """r10 review: per-column last(ignorenulls) substituted a STALE
    value for a NULL inside the matched right row — fabricating a row
    that never existed and wrongly passing the tolerance gate.  The
    right side now travels as one struct: the matched row's NULL stays
    NULL."""
    import datetime as dt

    from chinook_music_database_analysis_spark.operators.temporal import asof_join

    t = lambda h: dt.datetime(2024, 1, 1, h)
    right = spark.createDataFrame(
        [(1, t(9), 10.0), (1, t(10), None)], "user_id long, ts timestamp, price double"
    )
    left = spark.createDataFrame([(1, t(11))], "user_id long, ts timestamp")
    row = asof_join(left, right, key="user_id").collect()[0]
    assert row["r_ts"] == t(10)
    assert row["r_price"] is None  # NOT the stale 10.0
    # tolerance path: the matched row is fresh, its NULL still carries
    row2 = asof_join(
        left, right, key="user_id", tolerance_us=2 * 3600 * 1_000_000
    ).collect()[0]
    assert row2["r_price"] is None and row2["r_ts"] == t(10)
    # a genuinely stale match is voided entirely
    row3 = asof_join(
        left, right, key="user_id", tolerance_us=30 * 60 * 1_000_000
    ).collect()[0]
    assert row3["r_ts"] is None and row3["r_price"] is None


def test_resample_ffill_refuses_multi_unit_steps(spark):
    """r10 review: '30 minutes' returned silently-empty output and
    '2 hour' dropped odd-grain buckets — both now refuse loudly; the
    plural form of a valid single-unit step normalizes."""
    import pytest

    from chinook_music_database_analysis_spark.operators.temporal import (
        resample_ffill,
    )
    from chinook_music_database_analysis_spark.sources import load_tables

    from conftest import SF_TEST_DIR

    ev = load_tables(spark, SF_TEST_DIR)["events"]
    for bad in ("30 minutes", "2 hour", "fortnight"):
        with pytest.raises(ValueError, match="step"):
            resample_ffill(ev, step=bad)
    assert resample_ffill(ev.limit(50), step="1 hours").count() > 0


def test_range_join_guards_internal_column(spark):
    import pytest

    from chinook_music_database_analysis_spark.operators.temporal import range_join

    left = spark.range(1).selectExpr(
        "id AS user_id", "current_timestamp() AS ts", "id AS __rj_b"
    )
    with pytest.raises(ValueError, match="__rj_b"):
        range_join(left, left.drop("__rj_b"), key="user_id", width_us=1)
