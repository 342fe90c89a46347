"""Misra-Gries heavy-key sketch: exactness despite the approximate
intermediate, the superset recall guarantee, and the guard that keeps
the two coupled.  Oracle parity for the registered ev_heavy_keys is in
test_oracle_parity; here the sketch runs on an adversarial synthetic
stream with far more distinct keys than counters, so the
eviction/merge path actually executes (the driver corpus's ~46 keys
never fill 63 counters)."""

from __future__ import annotations

from collections import Counter

from conftest import SF_TEST_DIR

import pytest

from chinook_music_database_analysis_spark.operators.sketch import (
    heavy_keys,
    misra_gries_candidates,
)


def _stream():
    """Deterministic Zipf-ish stream: key 0 = 40%, key 1 = 10%, then a
    500-key uniform tail — 4000 rows, 502 distinct keys."""
    rows = [0] * 1600 + [1] * 400
    for i in range(2000):
        rows.append(2 + (i % 500))
    return rows


@pytest.fixture(scope="module")
def stream_df(spark):
    return spark.createDataFrame([(k,) for k in _stream()], "k long")


def test_heavy_keys_matches_exact_groupby_under_repartition(stream_df):
    rows = _stream()
    total = len(rows)
    exact = {
        k: c for k, c in Counter(rows).items() if c * 16 > total
    }
    want = {(k, c, c * 10_000 // total) for k, c in exact.items()}
    assert want  # the fixture really has heavy keys
    for parts in (1, 7, 32):
        got = {
            (r.k, r.cnt, r.share_q)
            for r in heavy_keys(
                stream_df.repartition(parts), "k", support_k=16, capacity=20
            ).collect()
        }
        assert got == want, parts  # exact under any physical layout


def test_candidate_superset_guarantee(stream_df):
    """Union of per-partition MG(20) summaries must contain every key
    with global count > N/21 — with 502 distinct keys per partition the
    compress/evict path runs constantly and must not break recall."""
    rows = _stream()
    floor = len(rows) / 21
    must_have = {k for k, c in Counter(rows).items() if c > floor}
    for parts in (1, 7, 32):
        cands = {
            r.k
            for r in misra_gries_candidates(
                stream_df.repartition(parts).select("k"), "k", capacity=20
            ).collect()
        }
        assert must_have <= cands, parts
        # and the sketch stays bounded: <= capacity rows per partition
        assert len(cands) <= 20 * parts


def test_support_finer_than_guarantee_raises(stream_df):
    with pytest.raises(ValueError):
        heavy_keys(stream_df, "k", support_k=22, capacity=20)


def test_hll_distinct_accuracy_and_lc_branch(spark):
    """The portable md5-HLL estimate stays within ~3x the sketch's
    theoretical 6.5% standard error on every group of both registered
    audits, and the tiny-cardinality fixture exercises the
    LinearCounting branch (raw estimator's ~alpha*m floor would be
    >10x off there — a wrong branch fails loudly)."""
    from chinook_music_database_analysis_spark.plans import QUERIES

    for name in ("ev_hll_users", "tx_hll_vocab"):
        rows = QUERIES[name](spark, SF_TEST_DIR).collect()
        assert rows, name
        for r in rows:
            assert r.err_bp <= 2000, (name, dict(r.asDict()))


def test_hll_register_state_is_bounded(spark):
    """The sketch side's shuffle state: the register relation after
    the (group, j) aggregate can never exceed groups x 256 rows."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.sketch import (
        HLL_M,
        hll_distinct,
    )

    ev = spark.read.parquet(f"{SF_TEST_DIR}/events.parquet").select(
        "event_type", "user_id"
    )
    n_groups = ev.select("event_type").distinct().count()
    # reconstruct the intermediate register relation exactly as the
    # operator builds it (same hash / bucketing expressions)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), F.col("user_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    regs = (
        ev.select("event_type", F.pmod(h, F.lit(HLL_M)).alias("j"))
        .groupBy("event_type", "j")
        .count()
    )
    assert regs.count() <= n_groups * HLL_M
    # and the operator output is one row per group
    assert hll_distinct(ev, "user_id", "event_type").count() == n_groups


def test_hll_register_merge_is_union_sketch(spark):
    """Mergeability: the element-wise max of two groups' register sets
    must equal the registers built over the concatenated stream — the
    property that lets stored sketches roll up without raw data — and
    the overlap estimates must satisfy the set-algebra sanity bounds."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.sketch import (
        hll_overlap,
        hll_registers,
    )

    ev = spark.read.parquet(f"{SF_TEST_DIR}/events.parquet").select(
        "event_type", "user_id"
    )
    two = ev.filter(F.col("event_type").isin("view", "purchase"))
    regs = hll_registers(two, "user_id", "event_type")
    merged = {
        r.j: r.m
        for r in regs.groupBy("j").agg(F.max("m_j").alias("m")).collect()
    }
    direct = {
        r.j: r.m_j
        for r in hll_registers(
            two.select(F.lit("u").alias("g"), "user_id"), "user_id", "g"
        ).collect()
    }
    assert merged == direct
    row = hll_overlap(ev, "user_id", "event_type", "view", "purchase").first()
    assert row.est_union >= max(row.est_a, row.est_b)
    assert 0 <= row.est_inter <= min(row.est_a, row.est_b)


def test_cms_never_underestimates_and_state_is_bounded(spark):
    """Count-min estimates must be >= the true count for EVERY key
    (the sketch's defining one-sided guarantee), and the register
    relation can never exceed depth x width rows however many
    distinct keys stream by."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.sketch import (
        CMS_D,
        CMS_W,
        cms_lookup,
        cms_registers,
    )

    toks = (
        spark.read.parquet(f"{SF_TEST_DIR}/documents.parquet")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    )
    regs = cms_registers(toks, "tok")
    assert regs.count() <= CMS_D * CMS_W
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_lookup(regs, exact, "tok")
    bad = est.filter(F.col("cms_est") < F.col("n_exact")).count()
    assert bad == 0


def test_cms_register_sum_merge_is_concat_sketch(spark):
    """Mergeability: element-wise SUM of the register sets built over
    two disjoint halves must equal the registers over the whole
    stream — the property that lets per-partition/per-day sketches
    roll up without raw data (contrast HLL, whose merge is max)."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.sketch import (
        cms_registers,
    )

    docs = spark.read.parquet(f"{SF_TEST_DIR}/documents.parquet")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    a = toks.filter(F.col("doc_id") % 2 == 0)
    b = toks.filter(F.col("doc_id") % 2 == 1)
    merged = {
        (r.d, r.bucket): r.cnt
        for r in (
            cms_registers(a, "tok")
            .unionByName(cms_registers(b, "tok"))
            .groupBy("d", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        )
    }
    direct = {
        (r.d, r.bucket): r.cnt for r in cms_registers(toks, "tok").collect()
    }
    assert merged == direct


def test_cms_unseen_key_reads_only_collision_mass(spark):
    """A probe key the stream never contained must read collision mass
    only — bounded above by the worst single counter — and a sketch
    over an EMPTY stream answers 0 for everything."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.sketch import (
        cms_lookup,
        cms_registers,
    )

    toks = (
        spark.read.parquet(f"{SF_TEST_DIR}/documents.parquet")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    )
    regs = cms_registers(toks, "tok")
    max_counter = regs.agg(F.max("cnt")).first()[0]
    probe = spark.createDataFrame(
        [("zzz-never-a-token-7f3a",)], "tok string"
    )
    est = cms_lookup(regs, probe, "tok").first().cms_est
    assert 0 <= est <= max_counter
    empty = cms_registers(toks.limit(0), "tok")
    assert cms_lookup(empty, probe, "tok").first().cms_est == 0


def test_bloom_has_no_false_negatives_and_bounded_state(spark):
    """Every key in the build set MUST pass its own filter (the Bloom
    guarantee that makes pruning safe), the word relation can never
    exceed BLOOM_BITS/32 rows, and an empty build side rejects every
    probe row."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.sketch import (
        BLOOM_BITS,
        bloom_build,
        bloom_prune,
    )

    cust = spark.read.parquet(f"{SF_TEST_DIR}/customer.parquet")
    allowed = cust.filter(F.col("c_nationkey") == 0).select(
        F.col("c_custkey").alias("k")
    )
    words = bloom_build(allowed, "k")
    assert words.count() <= BLOOM_BITS // 32
    n_allowed = allowed.count()
    assert bloom_prune(allowed, "k", words).count() == n_allowed
    # empty build side
    empty = bloom_build(allowed.limit(0), "k")
    probe = spark.createDataFrame([(1,), (2,)], "k long")
    assert bloom_prune(probe, "k", empty).count() == 0


def test_bloom_survivors_superset_of_semijoin(spark):
    """The pruned fact set must contain EVERY true match (supersets
    only, never a dropped row) — checked row-for-row against the exact
    semi-join on the events fact."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.sketch import (
        bloom_build,
        bloom_prune,
    )

    cust = spark.read.parquet(f"{SF_TEST_DIR}/customer.parquet")
    ev = spark.read.parquet(f"{SF_TEST_DIR}/events.parquet").select(
        "event_id", "user_id"
    )
    allowed = cust.filter(F.col("c_nationkey") == 0).select(
        F.col("c_custkey").alias("k")
    )
    words = bloom_build(allowed, "k")
    got = {r.event_id for r in bloom_prune(ev, "user_id", words).collect()}
    want = {
        r.event_id
        for r in ev.join(
            allowed.withColumnRenamed("k", "user_id"), "user_id", "left_semi"
        ).collect()
    }
    assert want <= got, "bloom dropped true matches"


def test_hll_ignores_null_keys(spark):
    """COUNT(DISTINCT) semantics: NULL keys contribute nothing — the
    r10 review found a NULL key emitting a (group, NULL, NULL) register
    row that biased the harmonic sum and the empty-register count."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    base = spark.range(500).selectExpr("'g' AS g", "CAST(id AS STRING) AS k")
    with_nulls = base.unionByName(
        spark.range(50).selectExpr("'g' AS g", "CAST(NULL AS STRING) AS k")
    )
    est_clean = hll_estimate(hll_registers(base, "k", "g"), "g").collect()[0]
    est_nulls = hll_estimate(hll_registers(with_nulls, "k", "g"), "g").collect()[0]
    assert est_clean["hll_est"] == est_nulls["hll_est"]


def test_hll_overlap_empty_group_yields_zero_row(spark):
    """One (est_a, est_b, est_union, est_inter) row even when a group
    has no rows — the r10 review found the empty side emptying the
    whole crossJoin composition (docstring promises one row)."""
    from chinook_music_database_analysis_spark.operators.sketch import hll_overlap

    df = spark.range(300).selectExpr("'a' AS g", "CAST(id AS STRING) AS k")
    out = hll_overlap(df, "k", "g", "a", "b").collect()
    assert len(out) == 1
    r = out[0]
    assert r["est_b"] == 0 and r["est_inter"] == 0 and r["est_a"] > 0
    assert r["est_union"] == r["est_a"]


def test_histogram_quantiles_ignore_nulls(spark):
    """percentile/quantile_cont ignore NULLs; the r10 review found NULL
    rows shifting every target rank (NULLS FIRST in the cumulative
    window) so a half-NULL group reported its minimum as the median."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.sketch import (
        histogram_quantiles,
    )

    vals = spark.range(1, 101).selectExpr("'g' AS g", "CAST(id AS INT) AS v")
    nulls = spark.range(100).selectExpr("'g' AS g", "CAST(NULL AS INT) AS v")
    got = histogram_quantiles(vals.unionByName(nulls), "v", "g").collect()[0]
    want = vals.selectExpr("percentile(v, 0.5) AS p50").collect()[0]["p50"]
    assert abs(got["p50"] - want) < 1e-6
    assert got["n_rows"] == 100  # NULLs not counted


def test_cms_null_keys_consistent(spark):
    """The CMS counts non-NULL keys only (NULL buckets are unreachable
    by any probe's equi-join); a NULL probe reads 0, which IS its true
    count in the sketched population — the never-underestimate
    guarantee holds relative to what the sketch counts (r10 review)."""
    from chinook_music_database_analysis_spark.operators.sketch import (
        cms_lookup,
        cms_registers,
    )

    stream = spark.range(400).selectExpr(
        "CASE WHEN id % 4 = 0 THEN NULL ELSE CAST(id % 7 AS STRING) END AS k"
    )
    regs = cms_registers(stream, "k")
    assert regs.filter("bucket IS NULL").count() == 0
    probes = spark.createDataFrame([("3",), (None,)], "k string")
    got = {r["k"]: r["cms_est"] for r in cms_lookup(regs, probes, "k").collect()}
    true_3 = stream.filter("k = '3'").count()
    assert got["3"] >= true_3  # CMS may only overestimate counted keys
    assert got[None] == 0


def test_bloom_prune_is_lazy(spark):
    """Engine.query/explain are documented plan-only: constructing the
    pruned DataFrame must not execute the bloom build (the r10 review
    caught a words.collect() at construction time).  A words relation
    that CANNOT be evaluated (nonexistent path) proves it: construction
    and explain succeed; only an action fails."""
    import pytest
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.sketch import bloom_prune

    def _boom():
        raise RuntimeError("bloom words were evaluated")

    boom = F.udf(_boom, "long")
    fact = spark.range(10).selectExpr("CAST(id AS STRING) AS k")
    words = spark.range(1).select(
        boom().alias("word"), F.lit(1).cast("bigint").alias("bits")
    )
    pruned = bloom_prune(fact, "k", words)  # must not evaluate words
    assert "bloom" not in pruned.columns[0]  # constructed fine
    with pytest.raises(Exception, match="evaluated|PythonException|RuntimeError"):
        pruned.count()  # the action is where evaluation happens


def test_bloom_prune_matches_semi_join_superset(spark):
    """Soundness after the lazy rewrite: every true semi-join match
    passes the filter (no false negatives), NULL keys never pass, and
    an empty build side rejects everything."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.sketch import (
        bloom_build,
        bloom_prune,
    )

    keys = spark.range(50).selectExpr("CAST(id * 3 AS STRING) AS k")
    fact = spark.range(300).selectExpr(
        "CASE WHEN id % 29 = 0 THEN NULL ELSE CAST(id AS STRING) END AS k",
        "id AS payload",
    )
    words = bloom_build(keys, "k")
    passed = {r["k"] for r in bloom_prune(fact, "k", words).collect()}
    true_matches = {
        r["k"]
        for r in fact.join(keys.withColumnRenamed("k", "kk"),
                           F.col("k") == F.col("kk"), "left_semi").collect()
    }
    assert true_matches <= passed  # no false negatives
    assert None not in passed  # NULL keys rejected
    empty = bloom_build(keys.filter(F.lit(False)), "k")
    assert bloom_prune(fact, "k", empty).count() == 0


def test_histogram_quantiles_match_duckdb_on_adversarial_groups(spark):
    """r12: the histogram-form quantiles are oracle-verified on the
    corpus shape (tx_length_quantiles); this pins them against DuckDB
    quantile_cont on ADVERSARIAL per-group distributions — single row,
    two rows, all-equal, heavy ties, negatives, wide range — packed as
    groups of one relation so the whole check is one Spark job and one
    DuckDB query."""
    import random

    import duckdb

    from chinook_music_database_analysis_spark.operators.sketch import (
        histogram_quantiles,
    )

    rng = random.Random(712)
    groups: dict[str, list[int]] = {
        "single": [42],
        "pair": [1, 100],
        "equal": [7] * 25,
        "ties": [rng.choice((1, 2, 3)) for _ in range(40)],
        "negs": [rng.randint(-500, 500) for _ in range(33)],
        "wide": [rng.randint(0, 10**9) for _ in range(47)],
        "skew": [int(rng.paretovariate(1.2)) for _ in range(50)],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: r
        for r in histogram_quantiles(df, "v", "g", ps=(0.5, 0.9, 0.99)).collect()
    }

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = {
            r[0]: r
            for r in con.sql(
                "SELECT g, COUNT(*) n, MIN(v), MAX(v),"
                " ROUND(quantile_cont(v, 0.5), 4),"
                " ROUND(quantile_cont(v, 0.9), 4),"
                " ROUND(quantile_cont(v, 0.99), 4)"
                " FROM t GROUP BY g"
            ).fetchall()
        }
    finally:
        con.close()

    assert set(got) == set(want)
    for g, w in want.items():
        r = got[g]
        assert (r["n_rows"], r["min_v"], r["max_v"]) == (w[1], w[2], w[3]), g
        for tag, exp in zip(("p50", "p90", "p99"), w[4:]):
            assert abs(r[tag] - exp) <= 1e-9, (g, tag, r[tag], exp)


def test_heavy_keys_strict_threshold_boundary(spark):
    """r12: a key holding EXACTLY 1/support_k of the stream must be
    excluded (the filter is strictly greater), and one row more must
    flip it in — the boundary both engines' `cnt * k > total` must
    agree on."""
    # total = 40: key 10 holds exactly 10 = 40/4 rows (out), key 11
    # holds 11 (in), filler spreads the rest thinly.
    rows = [10] * 10 + [11] * 11 + list(range(100, 119))
    assert len(rows) == 40
    df = spark.createDataFrame([(k,) for k in rows], "k long")
    got = {(r.k, r.cnt) for r in heavy_keys(df, "k", support_k=4).collect()}
    assert got == {(11, 11)}
    # one more row for key 10 crosses the strict threshold
    df2 = df.unionByName(spark.createDataFrame([(10,)], "k long"))
    got2 = {(r.k, r.cnt) for r in heavy_keys(df2, "k", support_k=4).collect()}
    assert got2 == {(10, 11), (11, 11)}
