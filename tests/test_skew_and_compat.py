"""Salting equivalence tests + calendar-arithmetic boundary goldens
(SURVEY §7.4.2: TIMESTAMPDIFF month semantics on month-end/leap dates).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from chinook_music_database_analysis_spark.functions import money_sum, month_diff
from chinook_music_database_analysis_spark.operators.skew import salted_agg, salted_join

from conftest import SF_TEST_DIR


def test_salted_agg_equals_plain_agg(spark):
    orders = spark.read.parquet(f"{SF_TEST_DIR}/orders.parquet")
    plain = (
        orders.groupBy("o_custkey")
        .agg(money_sum("o_totalprice").alias("spend"), F.count(F.lit(1)).alias("n"))
        .toPandas()
        .set_index("o_custkey")
        .sort_index()
    )
    salted = (
        salted_agg(
            orders,
            ["o_custkey"],
            {"spend": money_sum("o_totalprice"), "n": F.count(F.lit(1))},
        )
        .toPandas()
        .set_index("o_custkey")
        .sort_index()
    )
    # Decimal sums are exact, so the two-phase result is bit-identical.
    assert (plain.spend == salted.spend).all()
    assert (plain.n == salted.n).all()


def test_salted_join_equals_plain_join(spark):
    orders = spark.read.parquet(f"{SF_TEST_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_TEST_DIR}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").count()
    salted = salted_join(orders, customer, "o_custkey").count()
    assert plain == salted


# MySQL TIMESTAMPDIFF(MONTH, a, b) golden cases (complete months,
# day-of-month anchored), incl. month-end and leap-February boundaries.
_MONTH_GOLDENS = [
    ("2020-01-15", "2020-02-14", 0),
    ("2020-01-15", "2020-02-15", 1),
    ("2020-01-31", "2020-02-29", 0),   # leap Feb: day 29 < day 31
    ("2020-01-31", "2020-03-31", 2),
    ("2020-02-29", "2020-03-29", 1),
    ("2020-02-29", "2021-02-28", 11),  # non-leap Feb: day 28 < 29
    ("2019-12-31", "2020-01-31", 1),
    ("2020-01-01", "2021-01-01", 12),
    # reversed direction (newer < older): truncate toward zero like
    # MySQL — the r11 review found the completion adjustment was only
    # applied forward, turning -1 cases into -2
    ("2021-03-15", "2021-01-20", -1),  # 1 complete month back + 26 days
    ("2021-03-15", "2021-01-10", -2),
    ("2021-03-15", "2021-03-10", 0),
    ("2021-03-15", "2021-02-15", -1),
    ("2020-02-29", "2020-01-31", 0),   # 29 days back, not a month
    ("2021-01-01", "2020-01-01", -12),
]


def test_month_diff_sql_text_agrees_on_goldens():
    """The DuckDB transcription must stay in lockstep with the Column
    form on every golden, both directions."""
    import duckdb

    from chinook_music_database_analysis_spark.functions.compat import (
        sql_month_diff,
    )

    con = duckdb.connect()
    try:
        for a, b, want in _MONTH_GOLDENS:
            expr = sql_month_diff(f"DATE '{a}'", f"DATE '{b}'")
            got = con.sql(f"SELECT {expr} AS d").fetchone()[0]
            assert got == want, (a, b, got, want)
    finally:
        con.close()


def test_month_diff_boundary_goldens(spark):
    rows = [
        (datetime.date.fromisoformat(a), datetime.date.fromisoformat(b), want)
        for a, b, want in _MONTH_GOLDENS
    ]
    df = spark.createDataFrame(rows, "a date, b date, want int")
    got = df.select(month_diff(F.col("a"), F.col("b")).alias("got"), "want").collect()
    for r in got:
        assert r.got == r.want, f"month_diff mismatch: got {r.got} want {r.want}"


def _add_months_clamped(d, n):
    y, m = divmod(d.month - 1 + n, 12)
    y, m = d.year + y, m + 1
    import calendar
    return d.replace(year=y, month=m, day=min(d.day, calendar.monthrange(y, m)[1]))


def test_month_diff_property_vs_counting_reference(spark):
    """Non-circular reference: complete months = largest n with
    a + n months <= b.  Restricted to anchor days <= 28, where the
    day-clamped counting reference coincides with MySQL's
    day-of-month-anchored TIMESTAMPDIFF; the clamp boundaries (day
    29-31 anchors) are pinned separately by the explicit golden table
    above, which encodes MySQL's documented outputs (0 for
    Jan31->Feb29, etc.)."""
    import datetime as dt
    import random

    rng = random.Random(7)
    base = dt.date(2018, 1, 1)
    cases = []
    for _ in range(200):
        a = base + dt.timedelta(days=rng.randrange(0, 1500))
        a = a.replace(day=min(a.day, 28))
        b = a + dt.timedelta(days=rng.randrange(0, 1500))
        n = 0
        while _add_months_clamped(a, n + 1) <= b:
            n += 1
        cases.append((a, b, n))
    df = spark.createDataFrame(cases, "a date, b date, want int")
    got = df.select(month_diff(F.col("a"), F.col("b")).alias("got"), "want").collect()
    bad = [(r.got, r.want) for r in got if r.got != r.want]
    assert not bad, bad[:10]


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's skew-join handling must engage on a pathologically skewed
    join once the skew thresholds are scaled to test-size data: the
    final adaptive SMJ shows skew=true — the runtime half of the skew
    story (operators/skew.py salting is the explicit-plan half)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 200k-row left side, 95% of rows on one hot key.
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        joined = left.join(right, "k").select(F.sum("payload").alias("s"), F.sum("rv").alias("r"))
        joined.collect()  # adaptive plan finalizes after execution
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_not_in_anti_three_valued_semantics(spark, ddb):
    """not_in_anti must reproduce SQL NOT IN exactly, including the
    two NULL traps: a NULL anywhere in the subquery empties the
    result, and a NULL probe key never qualifies.  Pinned against
    DuckDB running literal NOT IN on the same rows."""
    from chinook_music_database_analysis_spark.plans.parity import not_in_anti

    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "d")], "k int, tag string"
    )
    for sub_rows, label in [
        ([(2,), (9,)], "null_free"),
        ([(2,), (None,)], "has_null"),
        ([], "empty_list"),
    ]:
        sub = spark.createDataFrame(sub_rows, "x int")
        got = sorted(
            r.tag for r in not_in_anti(left, "k", sub, "x").collect()
        )
        vals = ", ".join("NULL" if r[0] is None else str(r[0]) for r in sub_rows)
        want_sql = f"""
            WITH l(k, tag) AS (VALUES (1,'a'),(2,'b'),(3,'c'),(NULL,'d')),
                 s(x) AS ({'VALUES ' + ', '.join(f'({v})' for v in vals.split(', ')) if sub_rows else 'SELECT 1 WHERE false'})
            SELECT tag FROM l WHERE k NOT IN (SELECT x FROM s) ORDER BY tag
        """
        want = [r[0] for r in ddb.sql(want_sql).fetchall()]
        assert got == want, f"{label}: spark={got} duckdb={want}"


def test_s04_rewrite_bounded_under_pathological_basket(spark):
    """Pathological-basket proof for the s04 scale rewrite (VERDICT r3
    #6): one 1000-line order (100 lines x 10 types) plus normal orders.
    The literal self-join expands the giant basket to ~450k joined rows
    through a skewed shuffle key; the multiplicity-compressed rewrite
    carries 10 (type, count) entries for that basket and enumerates 45
    products.  Asserts (a) exact equivalence of both plans on the skewed
    fixture, (b) the analytic pair count of the giant basket, and
    (c) the per-basket state bound |xs| == |types|, independent of line
    count."""
    from chinook_music_database_analysis_spark.plans import QUERIES
    from chinook_music_database_analysis_spark.sources.session import TABLE_OVERRIDES

    n_lines, n_types = 1000, 10
    giant = spark.range(n_lines).selectExpr(
        "CAST(1 AS BIGINT) AS l_orderkey",
        "CAST(id AS INT) AS l_linenumber",
        "id % 50 AS l_partkey",
    )
    normal = spark.range(300).selectExpr(
        "CAST(2 + id % 100 AS BIGINT) AS l_orderkey",
        "CAST(id AS INT) AS l_linenumber",
        "(id * 7) % 50 AS l_partkey",
    )
    li = giant.unionByName(normal)
    part = spark.range(50).selectExpr(
        "id AS p_partkey", "concat('type', id % 10) AS p_type"
    )
    handle = "skew://s04-basket"
    TABLE_OVERRIDES[handle] = {"lineitem": li, "part": part}
    try:
        lit = sorted(
            map(tuple, QUERIES["s04_affinity_types"](spark, handle).collect())
        )
        scaled = sorted(
            map(tuple, QUERIES["s04_affinity_types_scaled"](spark, handle).collect())
        )
        assert lit == scaled
        # analytic cross-check on the giant basket alone: 1000 lines
        # uniform over 10 types -> cnt=100 each; different-type line
        # pairs = (1000^2 - 10*100^2) / 2 = 450_000.
        TABLE_OVERRIDES[handle] = {"lineitem": giant, "part": part}
        only_giant = QUERIES["s04_affinity_types_scaled"](spark, handle)
        assert only_giant.agg(F.sum("n_pairs")).collect()[0][0] == 450_000
        # per-basket compressed state is the TYPE vocabulary, not the
        # line count: 10 entries for the 1000-line basket.
        counts = (
            giant.join(part, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("l_orderkey", "p_type")
            .count()
        )
        assert counts.count() == n_types
    finally:
        del TABLE_OVERRIDES[handle]


def test_s04_literal_skew_mitigation_story(spark, tmp_path):
    """r9 verdict item 6 resolved with the TRUE mechanics (measured,
    not assumed).  On the LITERAL s04 self-join AQE's skew split is
    STRUCTURALLY unavailable: the deterministic rid window sits
    between the shuffle and the join, so the SMJ's children are
    Window(Sort(ShuffleRead)) — not the Sort(ShuffleQueryStage)
    pattern OptimizeSkewedJoin matches — and splitting a partition
    under a row_number window would break rank semantics anyway.  A
    hot-order probe therefore DOES keep the giant basket on one task
    on the literal plan; the registered scale answer is the
    multiplicity-compressed _scaled rewrite (no per-line rid at all).

    The production mitigation when the literal shape itself must run
    (e.g. downstream wants row pairs, not counts) is to MATERIALIZE
    the rid relation first: the self-join then gets its own shuffle
    directly beneath it and AQE's skew split engages (skew=true),
    splitting the hot key across map-output groups.  Two empirically
    load-bearing details this test pins: the shuffle needs >= 2 map
    tasks (AQE splits a reduce partition by grouping MAP outputs — a
    single-mapper shuffle is unsplittable however skewed), and at toy
    sizes the hot partition must be incompressible (a constant-key
    run compresses below the MEDIAN partition size, inverting the
    stats the detector reads — measured: 6000 identical-key rows
    compressed SMALLER than 130-row mixed partitions)."""
    from chinook_music_database_analysis_spark.plans import QUERIES
    from chinook_music_database_analysis_spark.sources.session import TABLE_OVERRIDES

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    # one 6000-line hot order (the skewed shuffle key) + 2000 spread
    # orders of 2 lines each, over a 50-part / 10-type dictionary
    hot = spark.range(6000).selectExpr(
        "CAST(1 AS BIGINT) AS l_orderkey",
        "CAST(id AS INT) AS l_linenumber",
        "id % 50 AS l_partkey",
    )
    spread = spark.range(4000).selectExpr(
        "CAST(2 + id % 2000 AS BIGINT) AS l_orderkey",
        "CAST(id AS INT) AS l_linenumber",
        "(id * 7) % 50 AS l_partkey",
    )
    part = spark.range(50).selectExpr(
        "id AS p_partkey", "concat('type', id % 10) AS p_type"
    )
    handle = "skew://s04-aqe"
    TABLE_OVERRIDES[handle] = {
        "lineitem": hot.unionByName(spread),
        "part": part,
    }
    try:
        # (1) literal registered path: correct under skew, equivalent
        # to the rewrite, but NO runtime skew split (window-pinned)
        lit_df = QUERIES["s04_affinity_types"](spark, handle)
        lit = sorted(map(tuple, lit_df.collect()))
        plan = lit_df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in plan  # structurally unavailable
        assert "Window" in plan
        scaled = sorted(
            map(tuple, QUERIES["s04_affinity_types_scaled"](spark, handle).collect())
        )
        assert lit == scaled

        # (2) materialized-rid mitigation: persist the rid relation
        # (with an incompressible payload so toy-scale shuffle stats
        # reflect the row skew), re-join -> AQE splits the hot key
        from pyspark.sql import Window as W

        rid = F.row_number().over(
            W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
        )
        base = (
            hot.unionByName(spread)
            .join(part, F.col("l_partkey") == F.col("p_partkey"))
            .select("l_orderkey", rid.alias("rid"), F.col("p_type").alias("v"))
            .withColumn(
                "payload", F.sha2(F.concat_ws(":", "l_orderkey", "rid"), 256)
            )
        )
        base.write.parquet(f"{tmp_path}/rid_rel.parquet")
        rel = spark.read.parquet(f"{tmp_path}/rid_rel.parquet").repartition(8)
        a, b = rel.alias("a"), rel.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.rid") < F.col("b.rid"))
                & (F.col("a.payload") != F.col("b.payload")),
            )
            .filter(F.col("a.v") != F.col("b.v"))
            .select(
                F.least("a.v", "b.v").alias("p_type_1"),
                F.greatest("a.v", "b.v").alias("p_type_2"),
            )
            .groupBy("p_type_1", "p_type_2")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )
        got = sorted(map(tuple, pairs.collect()))
        plan2 = pairs._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan2, plan2[:3000]
        assert got == lit  # mitigation preserves the exact result
    finally:
        del TABLE_OVERRIDES[handle]
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_quality_report_null_and_empty_edges(spark):
    """r10 review: fk_violation_report counted NULL child keys as FK
    violations (SQL FK semantics and the NOT IN oracle never do);
    null_report/expectation_report returned NULL counts on empty
    input; expectation_report crashed on an empty rules dict and was
    breakable by a quoted rule name."""
    import pytest

    from chinook_music_database_analysis_spark.operators.quality import (
        expectation_report,
        fk_violation_report,
        null_report,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, None), (3, 99)], "id long, fk int"
    )
    parent = spark.createDataFrame([(10,)], "pk int")
    r = fk_violation_report(child, parent, "fk", "pk", "fk_ok").collect()[0]
    assert r["n_violations"] == 1  # only fk=99; the NULL is not a violation
    assert r["n_rows"] == 3

    empty = spark.createDataFrame([], "a int, b string")
    nr = null_report(empty).collect()[0]
    assert nr["a"] == 0 and nr["b"] == 0

    with pytest.raises(ValueError, match="non-empty"):
        expectation_report(empty, {})
    rep = {
        row["rule"]: row
        for row in expectation_report(
            empty, {"a > 0 ('usd')": F.col("a") > 0}
        ).collect()
    }
    assert rep["a > 0 ('usd')"]["n_violations"] == 0
