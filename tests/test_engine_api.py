"""Engine facade, remediation operators, and sink layout tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from chinook_music_database_analysis_spark.engine import Engine
from chinook_music_database_analysis_spark.operators.quality import (
    drop_duplicate_keys,
    fill_missing,
    null_report,
)
from chinook_music_database_analysis_spark.sources.sinks import write_fact_by_date

from conftest import SF_TEST_DIR


def test_engine_sql_entry_over_view(spark):
    eng = Engine(sf_dir=SF_TEST_DIR, spark=spark)
    pdf = eng.sql(
        "SELECT p_type, rnk FROM nation0_type_sales ORDER BY rnk"
    ).toPandas()
    # SQL entry must agree with the typed registry for the same relation.
    want = eng.query("q11_type_rank_nation0").toPandas().sort_values("rnk")
    assert list(pdf.p_type) == list(want.p_type)


def test_engine_sql_matches_dataframe_query(spark):
    eng = Engine(sf_dir=SF_TEST_DIR, spark=spark)
    got = eng.sql(
        """
        SELECT n.n_name, COUNT(o.o_orderkey) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    ).toPandas()
    want = eng.query("q04_rev_by_geo").toPandas()
    m = got.merge(want, on="n_name", suffixes=("_sql", "_df"))
    assert (m.n_orders_sql == m.n_orders_df).all()


def test_engine_explain_surface(spark):
    eng = Engine(sf_dir=SF_TEST_DIR, spark=spark)
    plan = eng.explain("q02_top_parts_nation0")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "Scan parquet" in plan


def test_quality_remediation(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (1, "a", 1.5), (2, None, None)],
        "id int, s string, v double",
    )
    assert drop_duplicate_keys(df, "id").count() == 2
    filled = fill_missing(df).toPandas()
    assert (filled.s.fillna("") != "").all()
    assert filled.v.notna().all()
    rep = null_report(df).toPandas()
    assert rep.s.iloc[0] == 1 and rep.v.iloc[0] == 1 and rep.id.iloc[0] == 0


def test_date_partitioned_sink_prunes(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_TEST_DIR}/orders.parquet")
    out = str(tmp_path / "orders_by_date")
    write_fact_by_date(orders.limit(500), out, "o_orderdate")
    back = spark.read.parquet(out)
    assert back.count() == 500
    one_day = back.select("_date").distinct().limit(1).collect()[0][0]
    pruned = back.filter(F.col("_date") == F.lit(one_day))
    # partition filter must reach the scan (pruning, not post-filter)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() > 0


def test_pandas_udf_norms_match_jvm(spark):
    from chinook_music_database_analysis_spark.operators.similarity import l2_norms_pandas

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    got = l2_norms_pandas(emb).toPandas().set_index("vec_id").sort_index()
    jvm = emb.selectExpr(
        "vec_id",
        "sqrt(aggregate(zip_with(embedding, embedding,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (a, v) -> a + v)) AS l2_norm",
    ).toPandas().set_index("vec_id").sort_index()
    assert (abs(got.l2_norm - jvm.l2_norm) < 1e-9).all()


def test_csv_json_readers_roundtrip(spark, tmp_path):
    from chinook_music_database_analysis_spark.sources.readers import read_csv, read_json

    nation = spark.read.parquet(f"{SF_TEST_DIR}/nation.parquet")
    csv_p, json_p = str(tmp_path / "n_csv"), str(tmp_path / "n_json")
    nation.write.option("header", "true").csv(csv_p)
    nation.write.json(json_p)
    schema = "n_nationkey int, n_name string, n_regionkey int"
    back_csv = read_csv(spark, csv_p, schema).toPandas().sort_values("n_nationkey")
    back_json = read_json(spark, json_p, schema).toPandas().sort_values("n_nationkey")
    want = nation.toPandas().sort_values("n_nationkey")
    assert list(back_csv.n_name) == list(want.n_name)
    assert list(back_json.n_name) == list(want.n_name)


def test_orc_reader_roundtrip_and_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.sources.readers import read_orc

    nation = spark.read.parquet(f"{SF_TEST_DIR}/nation.parquet")
    orc_p = str(tmp_path / "n_orc")
    nation.write.orc(orc_p)
    back = read_orc(spark, orc_p)
    want = nation.toPandas().sort_values("n_nationkey")
    got = back.toPandas().sort_values("n_nationkey")
    assert list(got.n_name) == list(want.n_name)
    # filter must push into the vectorized ORC scan, like Parquet
    plan = (
        back.filter(F.col("n_nationkey") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "n_nationkey" in plan.split("PushedFilters")[1][:80]


def test_schema_evolution_merge_read(spark, tmp_path):
    """ALTER TABLE ADD COLUMN at the Parquet layer (ref:649-650):
    append a superset-schema batch, read with mergeSchema — unified
    schema, NULL backfill for pre-evolution rows."""
    from chinook_music_database_analysis_spark.sources.sinks import (
        append_evolved,
        read_evolved,
        write_result,
    )

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    write_result(v1, path)
    v2 = spark.createDataFrame([(3, "c", 9.5)], "id long, s string, score double")
    append_evolved(v2, path)
    back = read_evolved(spark, path)
    assert set(back.columns) == {"id", "s", "score"}
    rows = {r.id: r for r in back.collect()}
    assert rows[3].score == 9.5
    assert rows[1].score is None and rows[2].score is None


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Both sides bucketed on the join key -> SortMergeJoin with ZERO
    Exchange: the co-located layout replaces the runtime shuffle (the
    100 TB recurring-join policy encoded by write_bucketed)."""
    from chinook_music_database_analysis_spark.sources.sinks import write_bucketed

    orders = spark.read.parquet(f"{SF_TEST_DIR}/orders.parquet").limit(500)
    li = spark.read.parquet(f"{SF_TEST_DIR}/lineitem.parquet").limit(2000)
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)
    write_bucketed(li.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8)
    try:
        joined = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        # Force the bucketed SMJ path (no broadcast, no AQE replan).
        with_conf = [("spark.sql.autoBroadcastJoinThreshold", "-1")]
        old = {k: spark.conf.get(k) for k, _ in with_conf}
        for k, v in with_conf:
            spark.conf.set(k, v)
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() > 0
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_dynamic_partition_pruning_on_date_partitioned_fact(spark, tmp_path):
    """A date-partitioned fact joined to a FILTERED dimension must plan
    dynamic partition pruning: the fact scan's partition filter is fed
    at runtime from the dim side, so only matching date directories are
    read — the layout policy write_fact_by_date encodes, paying off on
    joins (static pruning is the already-tested direct-filter case)."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.sources.sinks import write_fact_by_date

    orders = spark.read.parquet(f"{SF_TEST_DIR}/orders.parquet")
    path = str(tmp_path / "fact_by_date")
    write_fact_by_date(orders.limit(3000), path, "o_orderdate")
    fact = spark.read.parquet(path)
    # Small date dimension, filtered to a handful of days.
    dim = (
        fact.select(F.col("_date").alias("d")).distinct().limit(50)
        .filter(F.dayofmonth("d") == 1)
    )
    joined = fact.join(dim, fact["_date"] == dim["d"]).groupBy("d").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # the runtime-pruned scan is the fact's partition column
    assert "_date" in plan.split("dynamicpruning")[0][-300:]
    joined.collect()  # sanity: executes


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """Fragmented table (64 tiny files) compacts to the computed file
    count with identical content."""
    import glob

    from chinook_music_database_analysis_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "frag")
    orders = spark.read.parquet(f"{SF_TEST_DIR}/orders.parquet")
    orders.repartition(64).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 64
    before = orders.count()
    n_out = compact_parquet(spark, path, target_file_bytes=1 << 30)
    files_after = glob.glob(f"{path}/*.parquet")
    assert len(files_after) == n_out == 1
    after = spark.read.parquet(path)
    assert after.count() == before
    assert set(after.columns) == set(orders.columns)


def test_python_datasource_synthetic_events(spark):
    """Custom Python Data Source (Spark 4 connector API): partitioned
    deterministic generation — correct row count, declared parallelism,
    bit-identical re-reads, and engine operators compose on top."""
    from chinook_music_database_analysis_spark.sources.synthetic import register

    register(spark)
    df = (
        spark.read.format("synthevents")
        .option("n_rows", 5000)
        .option("n_partitions", 8)
        .option("n_users", 50)
        .load()
    )
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 8
    assert df.select("event_id").distinct().count() == 5000
    # deterministic: a second read is identical
    df2 = (
        spark.read.format("synthevents")
        .option("n_rows", 5000)
        .option("n_partitions", 8)
        .option("n_users", 50)
        .load()
    )
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df2.collect()))
    assert a == b
    # composes with engine aggregation shapes
    agg = df.groupBy("event_type").count().collect()
    assert sum(r["count"] for r in agg) == 5000
    assert {r.event_type for r in agg} <= {"click", "error", "purchase", "signup", "view"}


def test_engine_profile_metrics(spark):
    eng = Engine(sf_dir=SF_TEST_DIR, spark=spark)
    prof = eng.profile("q04_rev_by_geo")
    assert prof["n_rows"] == 25
    assert prof["wall_sec"] > 0
    assert "HashAggregate" in prof["plan"] or "Aggregate" in prof["plan"]


def test_sorted_write_layout_enables_rowgroup_skipping(spark, tmp_path):
    """write_sorted_by must produce files with DISJOINT value ranges
    and narrow row-group min/max spans (verified from Parquet footers
    via pyarrow — engine-independent), so pushed range predicates can
    skip row groups at footer level."""
    import glob

    import pyarrow.parquet as pq

    from chinook_music_database_analysis_spark.sources.sinks import write_sorted_by

    orders = spark.read.parquet(f"{SF_TEST_DIR}/orders.parquet")
    path = str(tmp_path / "sorted")
    write_sorted_by(orders, path, "o_custkey", n_files=8)
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.read_metadata(f)
        idx = md.schema.names.index("o_custkey")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
    # files/row-groups cover disjoint, ordered ranges
    spans.sort()
    for (a_min, a_max), (b_min, b_max) in zip(spans, spans[1:]):
        assert a_max <= b_min, (a_min, a_max, b_min, b_max)
    # and the total span is partitioned, not replicated per group
    lo = min(s[0] for s in spans)
    hi = max(s[1] for s in spans)
    assert len(spans) >= 4 and hi > lo
    # a point-lookup filter still pushes to the scan
    from pyspark.sql import functions as F

    plan = (
        spark.read.parquet(path)
        .filter(F.col("o_custkey") == 42)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_custkey" in plan.split("PushedFilters")[1][:120]


def test_merge_upsert_and_delete_rows(spark, tmp_path):
    """Copy-on-write MERGE/DELETE on plain Parquet: updates replace
    matched keys, new keys insert, untouched rows survive byte-for-
    byte; delete removes exactly the predicate matches (NULL predicate
    rows are kept, per SQL DELETE semantics) and reports the count."""
    from chinook_music_database_analysis_spark.sources.sinks import (
        delete_rows,
        merge_upsert,
        write_result,
    )

    path = str(tmp_path / "cow")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "id long, tag string, v double",
    )
    write_result(base, path)

    updates = spark.createDataFrame(
        [(2, "B", 22.0), (5, "e", 50.0)], "id long, tag string, v double"
    )
    merge_upsert(spark, path, updates, "id")
    rows = {r.id: (r.tag, r.v) for r in spark.read.parquet(path).collect()}
    assert rows == {
        1: ("a", 10.0),
        2: ("B", 22.0),   # matched -> updated
        3: ("c", 30.0),
        4: (None, 40.0),
        5: ("e", 50.0),   # not matched -> inserted
    }

    # Delete by predicate: tag = 'a' matches id 1; id 4's NULL tag
    # makes the predicate NULL -> kept.
    n = delete_rows(spark, path, "tag = 'a'")
    assert n == 1
    left = {r.id for r in spark.read.parquet(path).collect()}
    assert left == {2, 3, 4, 5}

    # r12 review: updates with a NOVEL column are rejected by default
    # (the old select(*target.columns) dropped it silently) and stored
    # additively under evolve_schema=True.
    import pytest

    wide = spark.createDataFrame(
        [(6, "f", 60.0, "x")], "id long, tag string, v double, note string"
    )
    with pytest.raises(ValueError, match="note"):
        merge_upsert(spark, path, wide, "id")
    merge_upsert(spark, path, wide, "id", evolve_schema=True)
    out = {r.id: r.asDict().get("note") for r in spark.read.parquet(path).collect()}
    assert out[6] == "x" and out[2] is None


def test_read_json_quarantine_splits_good_and_bad(spark, tmp_path):
    """PERMISSIVE ingest with quarantine: clean lines parse to the
    pinned schema, broken lines come back raw for a quarantine sink,
    and nothing is silently dropped (good + bad == input lines)."""
    from chinook_music_database_analysis_spark.sources.readers import (
        read_json_quarantine,
    )

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "v": 1.5}\n'
        "this is not json\n"
        '{"id": 2, "v": null}\n'
        '{"id": "not-a-number-but-null-coerces", "v": 3.0}\n'
    )
    good, bad, raw = read_json_quarantine(spark, str(p), "id long, v double")
    g = {(r.id, r.v) for r in good.collect()}
    b = [r.raw for r in bad.collect()]
    assert (1, 1.5) in g and (2, None) in g
    assert any("not json" in r for r in b)
    assert good.count() + bad.count() == 4
    # the returned cache root is the releasable handle (r12): it IS
    # cached, and unpersisting it frees the only storage this load took
    assert raw.storageLevel.useMemory
    raw.unpersist(blocking=True)
    assert not raw.storageLevel.useMemory


def test_engine_validate_matches_oracle(spark):
    """Engine.validate is the correctness harness as an API: a known-
    good query validates clean, and the result shape is stable."""
    from chinook_music_database_analysis_spark.engine import Engine

    e = Engine(sf_dir=SF_TEST_DIR, spark=spark)
    r = e.validate("q04_rev_by_geo")
    assert r["rows_match"] and r["schema_match"] and r["values_match"]
    assert r["spark_rows"] == r["oracle_rows"] > 0


def test_engine_validate_rejects_mounted_table_set(spark):
    """r12 review: validate on a mounted (non-parquet) table set must
    fail with the actual situation — DuckDB has no parquet dir to read
    — not a confusing file-not-found from inside the oracle query; and
    validate_all must bucket it under errors (unverifiable), never as
    a silent pass."""
    import pytest

    from chinook_music_database_analysis_spark.engine import Engine
    from chinook_music_database_analysis_spark.sources import register_views
    from chinook_music_database_analysis_spark.sources.session import (
        TABLE_OVERRIDES,
    )

    h = "handle://validate-guard"
    TABLE_OVERRIDES[h] = {
        "customer": spark.range(1).selectExpr("id AS c_custkey")
    }
    try:
        e = Engine(sf_dir=h, spark=spark)
        with pytest.raises(ValueError, match="mounted table"):
            e.validate("q04_rev_by_geo")
        res = e.validate_all(["q04_rev_by_geo"])
        assert "q04_rev_by_geo" in res["errors"]
        assert res["passed"] == 0 and not res["failed"]
    finally:
        TABLE_OVERRIDES.pop(h, None)
        # restore the session-wide temp views the mounted Engine replaced
        register_views(spark, SF_TEST_DIR)


def test_sql_udf_through_engine(spark):
    """SQL-defined scalar functions (CREATE FUNCTION ... RETURN expr,
    Spark 4) run through Engine.sql and match the equivalent built-in
    expression — the catalog-level extensibility path that needs no
    Python worker at execution time (the body inlines into codegen,
    unlike a Python UDF)."""
    eng = Engine(sf_dir=SF_TEST_DIR, spark=spark)
    eng.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION money_pct(part DECIMAL(18,4), whole DECIMAL(18,4)) "
        "RETURNS DOUBLE RETURN CASE WHEN whole = 0 THEN NULL "
        "ELSE CAST(ROUND(part / whole * 100, 2) AS DOUBLE) END"
    )
    via_udf = eng.sql(
        "SELECT o_orderpriority, "
        "money_pct(SUM(CAST(o_totalprice AS DECIMAL(18,4))), "
        "          (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) FROM orders)) AS pct "
        "FROM orders GROUP BY o_orderpriority"
    ).collect()
    via_builtin = eng.sql(
        "SELECT o_orderpriority, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) / "
        "  (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) FROM orders) * 100, 2) AS DOUBLE) AS pct "
        "FROM orders GROUP BY o_orderpriority"
    ).collect()
    assert sorted(map(tuple, via_udf)) == sorted(map(tuple, via_builtin))
    # and the UDF body inlines — no Python evaluation node in the plan
    plan = (
        eng.sql("SELECT money_pct(CAST(1 AS DECIMAL(18,4)), CAST(4 AS DECIMAL(18,4))) AS p")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_write_with_metrics_single_pass(spark, tmp_path):
    """Observation metrics collected during the write must equal the
    recomputed ground truth — validation without a second scan."""
    from chinook_music_database_analysis_spark.operators.quality import (
        write_with_metrics,
    )

    cust = spark.read.parquet(f"{SF_TEST_DIR}/customer.parquet")
    path = str(tmp_path / "obs")
    got = write_with_metrics(cust, path, null_cols=("c_name", "c_mktsegment"))
    assert got["n_rows"] == cust.count()
    for c in ("c_name", "c_mktsegment"):
        assert got[f"nulls_{c}"] == cust.filter(F.col(c).isNull()).count()
    # and the written table round-trips
    assert spark.read.parquet(path).count() == got["n_rows"]


def test_validate_all_sweep(spark):
    """The health sweep runs a subset end-to-end and reports a clean
    summary shape (full-registry sweeps are the oracle-parity test's
    job; this pins the API contract incl. error isolation)."""
    eng = Engine(sf_dir=SF_TEST_DIR, spark=spark)
    res = eng.validate_all(["q04_rev_by_geo", "q07_purchase_trends", "tx_stats"])
    assert res == {"n": 3, "passed": 3, "failed": [], "errors": {}}


def test_runtime_bloom_filter_semi_join_reduction(spark):
    """Runtime bloom-filter injection (SPARK-32268): joining a big fact
    to a selectively-FILTERED dimension over a shuffle join must plant a
    bloom filter built from the dim's join keys onto the fact scan side,
    so non-matching fact rows die before the shuffle — the row-level
    companion of dynamic partition pruning, and the 100 TB lever that
    turns a 10x-selective dim filter into a ~10x fact shuffle cut.
    The filter is a pure prefilter (false positives only), so results
    are the exact join's — correctness never depends on it."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # local test tables are tiny — drop the size gates so the rule
        # fires at sf0.001 like it would on a 100 TB fact naturally
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # broadcast would bypass the shuffle (and the bloom's point)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    # Snapshot only EXPLICITLY-set values (RuntimeConfig.contains) —
    # conf.get(k, None) can surface a server-side default, which the
    # restore would then pin into the shared session fixture.
    jconf = spark._jsparkSession.conf()
    saved = {k: (spark.conf.get(k) if jconf.contains(k) else None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F

        orders = spark.read.parquet(f"{SF_TEST_DIR}/orders.parquet")
        cust = spark.read.parquet(f"{SF_TEST_DIR}/customer.parquet").filter(
            F.col("c_acctbal") > 9000  # selective dim filter -> worth a bloom
        )
        joined = (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        # exact result unaffected by the prefilter: compare against the
        # same join with the rule disabled
        with_bloom = {(r["c_nationkey"], r["n"]) for r in joined.collect()}
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        without = {
            (r["c_nationkey"], r["n"])
            for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert with_bloom == without
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_register_views_with_partial_override(spark):
    """A mounted TABLE_OVERRIDES set may be partial (the Chinook
    adapter maps 7 of the 10 driver tables): register_views must
    register what exists instead of KeyError-ing at mount time, and
    the session confs (UTC timezone) must apply on the override path
    too (r10 review)."""
    from chinook_music_database_analysis_spark.sources.session import (
        TABLE_OVERRIDES,
        register_views,
    )

    handle = "mem://partial-override"
    TABLE_OVERRIDES[handle] = {
        "region": spark.createDataFrame(
            [(0, "AMERICA", "")], "r_regionkey long, r_name string, r_comment string"
        ),
        "nation": spark.createDataFrame(
            [(0, "US", 0, "")],
            "n_nationkey long, n_name string, n_regionkey long, n_comment string",
        ),
    }
    try:
        register_views(spark, handle)
        assert spark.table("region").count() == 1
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        del TABLE_OVERRIDES[handle]
        spark.catalog.dropTempView("region")
        spark.catalog.dropTempView("nation")


def test_read_jdbc_requires_bounds_with_partition_column(spark):
    """Forgotten lowerBound/upperBound must fail fast with a clear
    ValueError, not reach the JDBC relation as the literal string
    'None' and die in Java number parsing (r10 review)."""
    import pytest

    from chinook_music_database_analysis_spark.sources.readers import read_jdbc

    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(
            spark, "jdbc:h2:mem:x", "t", partition_column="id", num_partitions=4
        )


def test_table_set_seq_survives_dict_id_reuse():
    """r11 review: plan/scalar caches keyed the mounted table set by
    bare id(dict); CPython may hand a re-mounted dict the freed dict's
    address, silently serving a STALE cached view.  table_set_seq
    holds each mount strongly and issues a monotonic seq, so a remount
    under the same handle is always a cache miss."""
    import gc

    from chinook_music_database_analysis_spark.sources.session import (
        TABLE_OVERRIDES,
        table_set_seq,
    )

    h = "handle://seqtest"
    try:
        TABLE_OVERRIDES[h] = {"customer": None}
        s1 = table_set_seq(h)
        assert table_set_seq(h) == s1  # stable across calls for one mount
        TABLE_OVERRIDES[h] = {"customer": None}  # remount same handle
        gc.collect()
        s2 = table_set_seq(h)
        assert s2 != s1
        assert table_set_seq("not-mounted") is None
        # r12 (r11 advice): unmounting must evict the strongly-held
        # record — otherwise every distinct handle a long session ever
        # mounts leaks its table set forever.
        from chinook_music_database_analysis_spark.sources.session import (
            _MOUNT_RECORDS,
        )

        assert h in _MOUNT_RECORDS
        TABLE_OVERRIDES.pop(h)
        assert table_set_seq(h) is None
        assert h not in _MOUNT_RECORDS
        # and a fresh remount after eviction gets a NEW seq
        TABLE_OVERRIDES[h] = {"customer": None}
        assert table_set_seq(h) not in (s1, s2, None)
    finally:
        TABLE_OVERRIDES.pop(h, None)
        table_set_seq(h)  # evict the record for the final mount too


def test_plan_memo_reuses_and_detects_rewrite(spark, tmp_path):
    """r13 plan memo: QUERIES[...] must serve the SAME lazy plan for an
    unchanged (session, corpus), and a rewritten table file — any table
    — must be a signature miss that rebuilds."""
    import shutil

    from chinook_music_database_analysis_spark.plans import QUERIES
    from chinook_music_database_analysis_spark.sources import TABLES

    d = tmp_path / "plan_memo_sf"
    d.mkdir()
    for t in TABLES:
        shutil.copy(f"{SF_TEST_DIR}/{t}.parquet", d / f"{t}.parquet")
    sf = str(d)
    df1 = QUERIES["q01_dupes"](spark, sf)
    df2 = QUERIES["q01_dupes"](spark, sf)
    assert df1 is df2, "unchanged corpus must hit the plan memo"

    import pyarrow.parquet as pq

    one = pq.read_table(f"{SF_TEST_DIR}/region.parquet").slice(0, 1)
    pq.write_table(one, d / "region.parquet")
    df3 = QUERIES["q01_dupes"](spark, sf)
    assert df3 is not df1, "corpus rewrite must be a plan-memo miss"

    from chinook_music_database_analysis_spark.plans.registry import (
        plan_memo_clear,
    )

    plan_memo_clear()
    assert QUERIES["q01_dupes"](spark, sf) is not df3


def test_vector_dot_kernel_matches_jvm_fold(spark):
    """r13: the env-gated Arrow dot-product kernel must be bit-identical
    to the JVM aggregate/zip_with fold on every input class — clean
    vectors, NULL arrays, ragged lengths, NULL elements, empty arrays,
    NaN and Inf arithmetic (the fuzz-gate edge shapes)."""
    import math
    import struct

    import chinook_music_database_analysis_spark.operators.similarity as S
    from pyspark.sql import functions as F

    rows = [
        (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (2, None, [1.0, 2.0, 3.0]),
        (3, [1.0, 2.0], None),
        (4, [1.0, 2.0], [1.0]),  # ragged -> NULL
        (5, [], []),  # empty fold -> 0.0
        (6, [float("nan"), 1.0], [1.0, 1.0]),  # NaN propagates
        (7, [float("inf"), 1.0], [1.0, 1.0]),
        (8, [float("inf"), float("-inf")], [1.0, 1.0]),  # inf + -inf -> NaN
        (9, [1.0, None, 3.0], [1.0, 1.0, 1.0]),  # NULL element -> NULL
        (10, [0.1] * 64, [0.3] * 64),  # fold-order-sensitive repeats
        (11, [1e308, 1e308, -1e308], [2.0, -2.0, 2.0]),  # overflow order
    ]
    df = spark.createDataFrame(rows, "id long, a array<float>, b array<float>")

    def run(vec: bool) -> dict:
        old = S.VECTOR_DOT
        S.VECTOR_DOT = vec
        try:
            return {
                r["id"]: r["d"]
                for r in df.select("id", S._dot("a", "b").alias("d")).collect()
            }
        finally:
            S.VECTOR_DOT = old

    jvm, vec = run(False), run(True)
    assert set(jvm) == set(vec)
    for k in jvm:
        x, y = jvm[k], vec[k]
        if x is None or y is None:
            assert x is None and y is None, f"id {k}: {x!r} vs {y!r}"
        elif math.isnan(x) or math.isnan(y):
            assert math.isnan(x) and math.isnan(y), f"id {k}: {x!r} vs {y!r}"
        else:
            assert struct.pack("d", x) == struct.pack("d", y), (
                f"id {k}: {x!r} vs {y!r} differ bitwise"
            )


def test_dd_ngram_no_persist_growth_across_executions(spark):
    """r13 (r12 advice/verdict item 7): the candidate-restricted shingle
    relation used by the jaccard/containment verify stages must NOT pin
    a fresh persisted relation per build — executor storage must stay
    flat across repeated executions, and reset_memo must release it."""
    from chinook_music_database_analysis_spark.plans import QUERIES
    from chinook_music_database_analysis_spark.plans.extensions import reset_memo

    def n_persisted() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    QUERIES["dd_ngram_jaccard"](spark, SF_TEST_DIR).count()
    n1 = n_persisted()
    for _ in range(3):
        QUERIES["dd_ngram_jaccard"](spark, SF_TEST_DIR).count()
    assert n_persisted() == n1, "repeated builds must not grow executor storage"
    reset_memo(SF_TEST_DIR)
    assert n_persisted() < n1 or n1 == 0, "reset_memo must release the memoized relations"


def test_reader_memo_reuses_and_detects_rewrite(spark, tmp_path):
    """r12 reader memo: load_tables must serve the SAME lazy relation
    for an unchanged table path (the per-build footer re-read was pure
    fixed cost), and a REWRITTEN path — same name, new bytes — must be
    a signature miss that reloads, serving the new rows (the stale-
    cache failure mode the stat signature exists to prevent)."""
    import shutil

    from chinook_music_database_analysis_spark.sources import load_tables
    from chinook_music_database_analysis_spark.sources.session import _READ_MEMO

    d = tmp_path / "memo_sf"
    d.mkdir()
    for t in ("region", "nation"):
        shutil.copy(f"{SF_TEST_DIR}/{t}.parquet", d / f"{t}.parquet")
    sf = str(d)
    df1 = load_tables(spark, sf)["region"]
    df2 = load_tables(spark, sf)["region"]
    assert df1 is df2, "unchanged path must hit the reader memo"
    n_before = df1.count()

    # rewrite the file with a 1-row slice (new size => new signature)
    one = spark.read.parquet(f"{SF_TEST_DIR}/region.parquet").limit(1).toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(one), d / "region.parquet")
    df3 = load_tables(spark, sf)["region"]
    assert df3 is not df1, "rewritten path must be a signature miss"
    assert df3.count() == 1 and n_before > 1

    # memo stays LRU-bounded
    from chinook_music_database_analysis_spark.sources.session import _READ_MEMO_MAX

    assert len(_READ_MEMO) <= _READ_MEMO_MAX
