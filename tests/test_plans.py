"""Physical-plan shape regressions.

Correctness is gated by the DuckDB oracle; these tests gate the
*plans* — the properties that decide whether a query survives a 100x
scale-up (broadcasts for dims, pushdown into scans, top-k heaps
instead of full sorts, bounded shuffle counts).  A refactor that keeps
values identical but, say, turns the dim joins into cartesian products
or adds a second corpus shuffle to the prep pipeline fails here, not
in production.
"""

from __future__ import annotations

from chinook_music_database_analysis_spark.plans import QUERIES

from conftest import SF_TEST_DIR


def _fresh(spark, name: str):
    """Build the query BYPASSING the registry's session plan memo
    (r13): these tests assert the BUILDER's initial plan shape, and a
    memoized DataFrame that some earlier test already executed prints
    its final AQE plan (AQEShuffleRead nodes, reused exchanges,
    in-memory scans) instead."""
    return getattr(QUERIES[name], "__wrapped__", QUERIES[name])(
        spark, SF_TEST_DIR
    )


def _plan(spark, name: str) -> str:
    return (
        _fresh(spark, name)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_star_join_broadcasts_dims_and_pushes_filters(spark):
    """q02's 5-way star join: every dim side must broadcast (no
    fact-fact shuffle join) and filters/projections must reach the
    parquet scans."""
    plan = _plan(spark, "q02_top_parts_nation0")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "PushedFilters" in plan
    assert "SortMergeJoin" not in plan


#: the J1/J2 star-join family: (query, minimum dim-side broadcast
#: joins).  The gate generalizes the q02 assertion (r7 verdict #7) so
#: a carelessly added or reordered join in ANY registered star builder
#: fails here: every dim side must broadcast, filters must reach the
#: scans, and no fact-side shuffle join (SortMergeJoin) may appear —
#: at 1000 executors an SMJ against the fact table is the shuffle
#: that dominates the stage.
STAR_JOINS = {
    "q02_top_parts_nation0": 4,
    "q04_rev_by_geo": 2,
    "q05_top5_cust_per_nation": 2,
    "q06_top_part_per_cust": 3,
    "s11_geo_behavior": 4,
}


def test_star_family_broadcasts_all_dims(spark):
    for name, min_bhj in STAR_JOINS.items():
        plan = _plan(spark, name)
        assert plan.count("BroadcastHashJoin") >= min_bhj, (
            f"{name}: expected >= {min_bhj} broadcast dim joins"
        )
        assert "SortMergeJoin" not in plan, f"{name}: fact-side shuffle join"
        assert "PushedFilters" in plan, f"{name}: filters not pushed to scan"


def test_rank_topk_plans_window_group_limit(spark):
    """Rank-filter top-k must plan WindowGroupLimit (per-partition
    top-k heap), not a full sort of every group."""
    for name in ("q05_top5_cust_per_nation", "q02_top_parts_nation0"):
        assert "WindowGroupLimit" in _plan(spark, name), name


def test_q02_global_topk_is_two_stage(spark):
    """q02's GLOBAL rank window must be two-stage: a Partial
    WindowGroupLimit prunes each input partition to its top-5 (rank
    semantics, tie-safe) BEFORE the SinglePartition exchange, so the
    one single-task stage only ever sees <=5 rows per upstream
    partition — bounded at any part cardinality."""
    plan = _plan(spark, "q02_top_parts_nation0")
    single_idx = plan.index("Exchange SinglePartition")
    # Plans print top-down, so the pruning child appears after the
    # gather in the string; the Partial-mode WindowGroupLimit must be
    # in that below-the-exchange region.
    below = plan[single_idx:]
    assert "WindowGroupLimit" in below and ", Partial" in below


def test_orderby_limit_plans_take_ordered(spark):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject (bounded heap),
    never a global sort."""
    assert "TakeOrderedAndProject" in _plan(spark, "q04b_topk_nations")


def test_fused_pipeline_is_single_shuffle(spark):
    """pipe_clean_corpus promises one scan + one shuffle: exactly one
    Exchange (the content-hash dedup window)."""
    assert _plan(spark, "pipe_clean_corpus").count("Exchange") == 1


def test_ivf_stages_broadcast(spark):
    """IVF assign/probe must broadcast the centroid set — the corpus
    side must never shuffle for the cross score."""
    assert "Broadcast" in _plan(spark, "sim_ivf_topk")


def test_cube_and_pivot_are_single_scan_expand(spark):
    """CUBE/PIVOT must evaluate all grouping sets / pivot columns in
    one Expand + aggregate over ONE scan — never one scan per level.
    The explicit pivot value list also means no distinct-discovery job
    (nothing runs at plan-build time)."""
    p = _plan(spark, "q04d_cube_geo")
    assert p.count("FileScan parquet") <= 4 and "Expand" in p
    # Pivot with an explicit value list + count compiles further still:
    # a single-scan __pivot aggregate (PivotFirst), no Expand at all.
    p = _plan(spark, "ev_pivot_user_types")
    assert p.count("FileScan parquet") == 1 and "__pivot" in p


def test_setops_plan_as_hash_aggregates(spark):
    """INTERSECT/EXCEPT must come out as joins/aggregates over deduped
    key sets — no cartesian or nested-loop fallback."""
    p = _plan(spark, "s12_retention_setops")
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


#: Queries whose plans intentionally contain BroadcastNestedLoopJoin:
#: 1-row scalar-anchor broadcasts (uncorrelated scalar subqueries) and
#: the deliberate broadcast-query-set ANN scorers.  Build sides are
#: O(1) or fixed-size — harmless at any corpus scale.
BNLJ_ALLOWED = {
    "q08_churn_rate",
    "q12_inactive_3mo",
    "s05_regional_churn",
    "s06_risk_profile",
    "s07_clv_segments",
    "dq_order_expectations",
    "q13b_not_in_null_aware",
    "sim_bruteforce_topk",
    # r8: |q|-row anchor broadcast for the negative-mining fan-out
    # (same cost class as bruteforce), pruned by WindowGroupLimit
    "pipe_contrastive_negatives",
    # r8: 1-row estimate relations composed by scalar-anchor broadcast
    "ev_hll_overlap",
    # same deliberate |q|-broadcast scoring fan-out as bruteforce,
    # over the pre-filtered allowed set
    "sim_filtered_topk",
    "sim_ivf_topk",
    # same broadcast-centroid probe, over the allowed-restricted file
    "sim_filtered_ivf_topk",
    "sim_ivf_stride_topk",
    "dd_semantic",
    "tx_surprisal",
    # dense half of the hybrid fusion: cosine_topk's broadcast of the
    # fixed query-vector set (same pattern as sim_bruteforce_topk)
    "tx_hybrid_rrf",
    "tx_hybrid_batch",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "sim_sq8_topk",
    # broadcast ~sqrt(N) centroid relation (the IVF assignment argmax)
    "cur_cluster_sample",
    # same broadcast-centroid argmax on its COLD path (store-served
    # when warm, so the BNLJ only appears while the index store for
    # the corpus is absent or mid-rebuild by a concurrent session)
    "cur_diverse_sample",
    # broadcast-centroid assignment argmax over the corpus (the IVF
    # build pass shape) for the staleness audit
    "sim_ivf_append",
    # store-served inverted file; the COLD path recomputes the
    # broadcast-centroid argmax (same caveat as cur_diverse_sample)
    "sim_outlier_audit",
    # matryoshka coarse pass: the fixed |q|-row prefix-vector set is
    # the broadcast side (same pattern as sim_bruteforce_topk); the
    # rerank joins are equi-joins on the broadcast shortlist
    "sim_mrl_topk",
    # salt replication: dimension x broadcast DEFAULT_SALTS-row range
    # (skew.salted_join) — fixed-size build side by construction
    "s15_skew_salted",
    # r10: the bloom word relation folds to ONE broadcast map row
    # (<= 256 words by construction) so the probe stays lazy — the
    # former literal-inlining ran the build job at plan time
    "ev_bloom_prune",
}


def test_registry_has_no_unintentional_nested_loops(spark):
    """Global scale guard: no query may plan a CartesianProduct, and
    BroadcastNestedLoopJoin only where the build side is a 1-row
    scalar anchor or the fixed-size ANN query set (allowlist above).
    Catches any future query or rewrite that degrades an equi-join
    into a nested loop."""
    from chinook_music_database_analysis_spark.plans import QUERIES

    offenders = []
    for name in sorted(QUERIES):
        p = _plan(spark, name)
        if "CartesianProduct" in p:
            offenders.append((name, "CartesianProduct"))
        if "BroadcastNestedLoop" in p and name not in BNLJ_ALLOWED:
            offenders.append((name, "BroadcastNestedLoopJoin"))
    assert not offenders, offenders


def test_column_pruning_reaches_scans(spark):
    """Representative queries must push projection into every parquet
    scan: lineitem (11 cols) reads <= 5 for q02, documents (5 cols)
    reads exactly (doc_id, text) for tx_tfidf, orders (9 cols) reads
    <= 4 for the rolling window — a scan reading all columns for a
    narrow projection is a 100 TB regression."""
    import re

    from chinook_music_database_analysis_spark.plans import QUERIES

    import io
    from contextlib import redirect_stdout

    def read_schemas(name):
        # formatted mode prints full (untruncated) ReadSchema lines
        buf = io.StringIO()
        with redirect_stdout(buf):
            _fresh(spark, name).explain(mode="formatted")
        return [
            set(re.findall(r"(\w+):", m))
            for m in re.findall(r"ReadSchema: struct<([^\n]*?)>\n", buf.getvalue() + "\n")
        ]

    for cols in read_schemas("q02_top_parts_nation0"):
        assert len(cols) <= 5, cols
    # r13: tx_tfidf reads the persisted (doc_id, term, tf) postings
    # store instead of re-tokenizing documents — the corpus text column
    # must NOT be scanned at all, and the store scan must stay narrow.
    tfidf_scans = read_schemas("tx_tfidf")
    assert not any("text" in c for c in tfidf_scans), tfidf_scans
    assert any(c == {"doc_id", "term", "tf"} for c in tfidf_scans), tfidf_scans
    for cols in read_schemas("q14_rolling_90d_spend"):
        assert len(cols) <= 4, cols
    # batch-5: surprisal reads only (doc_id, text) of documents' 5
    # cols; the fuzzy dictionary reads ONLY p_name of part's 6
    # r13: tx_surprisal also reads the postings store — no text scan.
    surp_scans = read_schemas("tx_surprisal")
    assert not any("text" in c for c in surp_scans), surp_scans
    assert any(c == {"doc_id", "term", "tf"} for c in surp_scans), surp_scans
    for cols in read_schemas("dd_fuzzy_dictionary"):
        assert cols == {"p_name"}, cols
    # late-r4: the Gopher rule chain reads only (doc_id, text)
    doc_scans = [c for c in read_schemas("tx_gopher_quality") if "text" in c]
    assert doc_scans and all(c == {"doc_id", "text"} for c in doc_scans)


def test_gopher_quality_plan_has_no_exchange(spark):
    """The rule-chain filter is the 100 TB first-pass map: its plan
    must contain zero shuffles (pure scan + codegen projections)."""
    p = _plan(spark, "tx_gopher_quality")
    assert "Exchange" not in p, p


def test_literal_not_in_sql_plans_null_aware_anti_join(spark):
    """The SQL-text form of q13b (literal NOT IN) must plan Catalyst's
    native single-column null-aware anti join — a BroadcastHashJoin
    LeftAnti with the isNullAwareAntiJoin flag (the trailing `true`),
    not a BroadcastNestedLoopJoin.  The DataFrame registry form uses
    the scale-safe decorrelation (plans/parity.not_in_anti); this pins
    that the planner-native path stays available through Engine.sql."""
    from chinook_music_database_analysis_spark.engine import Engine
    from chinook_music_database_analysis_spark.plans.sql_texts import SPARK_SQL

    e = Engine(sf_dir=SF_TEST_DIR, spark=spark)
    p = (
        e.sql(SPARK_SQL["q13b_not_in_null_aware"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in p, p
    import re

    assert re.search(r"BroadcastHashJoin .*LeftAnti, BuildRight, true", p), p


def test_s15_salted_join_spreads_hot_key(spark):
    """s15_skew_salted must physically join on (skew_key, _salt) —
    proof the hot key (70% of the fact on one key) spreads across
    DEFAULT_SALTS reducers instead of serializing one task.  Broadcast
    is disabled so the shuffle-join path (where the salt matters) is
    what plans; the salt column must appear in the join keys and be
    gone from the output."""
    import re

    from chinook_music_database_analysis_spark.plans import QUERIES

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _fresh(spark, "s15_skew_salted")
        p = df._jdf.queryExecution().executedPlan().toString()
        assert re.search(
            r"(SortMergeJoin|ShuffledHashJoin) \[skew_key#\d+L?, __salt#\d+", p
        ), p
        assert "__salt" not in df.columns
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_driver_window_rotation_invariants():
    """The correctness driver oracle-checks the FIRST 50 registry
    entries; the rotation list must (a) actually lead the iteration
    order, (b) fit inside that window with its explicit names, and
    (c) contain no duplicates or stale names — so every query that has
    not yet earned a driver row sits inside the checked window."""
    from chinook_music_database_analysis_spark.plans import (
        QUERIES,
        _WINDOW_FIRST,
    )

    assert len(_WINDOW_FIRST) == len(set(_WINDOW_FIRST)), "duplicate rotation names"
    assert len(_WINDOW_FIRST) <= 50, "rotation list overflows the driver window"
    missing = [n for n in _WINDOW_FIRST if n not in QUERIES]
    assert not missing, f"rotation names not registered: {missing}"
    head = list(QUERIES)[: len(_WINDOW_FIRST)]
    assert head == _WINDOW_FIRST, "rotation list does not lead iteration order"


def test_join_strategy_hints_are_respected(spark):
    """The three physical join strategies are selectable per join via
    hints — the control surface for overriding Catalyst's size
    estimates when table stats mislead it (a real 100 TB operations
    lever: e.g. forcing SHJ for a medium dimension that AQE's estimate
    would sort-merge)."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_TEST_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_TEST_DIR}/customer.parquet")

    def plan_of(j):
        return j._jdf.queryExecution().executedPlan().toString()

    joined = orders.join(
        cust.hint("broadcast"), orders.o_custkey == cust.c_custkey
    )
    assert "BroadcastHashJoin" in plan_of(joined)

    joined = orders.join(
        cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey
    )
    assert "ShuffledHashJoin" in plan_of(joined)

    joined = orders.join(
        cust.hint("merge"), orders.o_custkey == cust.c_custkey
    )
    assert "SortMergeJoin" in plan_of(joined)


def test_bm25_postings_scan_pushes_term_filter(spark):
    """The BM25 serving claim: both retrieval forms must read the
    persisted postings store with the query bag's term filter PUSHED
    into the parquet scan (In(term, ...) in PushedFilters), so the
    term-clustered store's row-group statistics can prune — a postings
    scan that filters post-read re-reads the whole vocabulary and is a
    100 TB regression."""
    import io
    import re
    from contextlib import redirect_stdout

    for name in ("tx_bm25_topk", "tx_bm25_batch"):
        buf = io.StringIO()
        with redirect_stdout(buf):
            _fresh(spark, name).explain(mode="formatted")
        plan = buf.getvalue()
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        assert any(
            "In(term" in p or ("EqualTo(term" in p) for p in pushed
        ), f"{name}: no term pushdown into the postings scan\n{plan[:2000]}"


def test_chunking_plans_are_narrow(spark):
    """cur_chunk promises a pure narrow map (tokenize + sequence/
    explode/slice): ZERO Exchange.  pipe_rag_index adds corpus-wide
    chunk dedup on top and must stay at <= 3 Exchanges (chunk-hash
    rep agg, the join back, the doc-keyed agg) — a fourth shuffle
    means the narrow chunking stage regressed."""
    assert _plan(spark, "cur_chunk").count("Exchange") == 0
    assert _plan(spark, "pipe_rag_index").count("Exchange") <= 3


def test_hybrid_batch_per_query_topk_is_window_group_limit(spark):
    """tx_hybrid_batch's per-query fusion top-k must compile to
    WindowGroupLimit (per-group heap), not a full sort of the fused
    relation."""
    assert "WindowGroupLimit" in _plan(spark, "tx_hybrid_batch")


def test_domain_cap_plans_partial_window_group_limit(spark):
    """cur_domain_cap's rank filter must plan WindowGroupLimit with a
    Partial pass below the exchange — each upstream partition keeps at
    most cap rows per domain BEFORE the shuffle, so a mega-domain's
    shuffle contribution is bounded at any corpus size."""
    plan = _plan(spark, "cur_domain_cap")
    assert plan.count("WindowGroupLimit") >= 2 and ", Partial" in plan
    assert plan.count("Exchange") == 1


def test_scd2_build_is_single_shuffle(spark):
    """ev_scd2_user_state runs TWO window passes (change detection,
    interval stamping) over the same (partitionBy, orderBy); the filter
    between them preserves both, so the physical plan must carry
    exactly ONE Exchange and ONE Sort for the whole history build."""
    plan = _plan(spark, "ev_scd2_user_state")
    assert plan.count("Exchange") == 1
    assert plan.count("Sort [") == 1
    assert plan.count("Window [") == 2


def test_quality_classifier_plan_has_no_exchange(spark):
    """tx_quality_classifier is a pure narrow map: zero shuffles, one
    codegen stage over the scan."""
    assert "Exchange" not in _plan(spark, "tx_quality_classifier")


def test_curriculum_sample_is_zero_shuffle(spark):
    """Classifier + tiered keep-decision must fuse into one codegen
    stage over the scan — no Exchange anywhere."""
    assert "Exchange" not in _plan(spark, "cur_curriculum_sample")


def test_corpus_health_two_bounded_shuffles_no_joins(spark):
    """Health rollup: hash-window + source agg = at most three
    Exchanges (dup window, partial/final agg), and NO join nodes —
    signals are computed fused in the scan, not joined back."""
    plan = _plan(spark, "cur_corpus_health")
    assert plan.count("Exchange") <= 3
    assert "Join" not in plan


def test_scd2_pit_lookup_no_join_two_exchanges(spark):
    """Point-in-time lookup = scd2 build + as-of union window: exactly
    two user_id exchanges and ZERO join nodes — match fan-out can never
    blow up a non-existent join."""
    plan = _plan(spark, "ev_scd2_pit_lookup")
    assert plan.count("Exchange") == 2
    assert "Join" not in plan


def test_heavy_keys_corpus_joins_broadcast_not_shuffled(spark):
    """ev_heavy_keys: the sketch must be an Arrow mapInPandas stage,
    the candidate membership test a BROADCAST join (the corpus is never
    sort-merge-shuffled by the skewed key), and the count shuffle
    carries only the collapsed (candidates + NULL-bucket) groups."""
    plan = _plan(spark, "ev_heavy_keys")
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scd2_consumers_inherit_single_shuffle(spark):
    """Snapshot and dwell-time report ride the scd2 build's single
    user_id shuffle: snapshot adds NOTHING (interval filter is narrow),
    durations adds only its partial/final agg exchange; neither joins."""
    snap = _plan(spark, "ev_scd2_snapshot")
    assert snap.count("Exchange") == 1 and "Join" not in snap
    dur = _plan(spark, "ev_state_durations")
    assert dur.count("Exchange") <= 2 and "Join" not in dur


def test_pca_outliers_zero_exchange_take_ordered(spark):
    """sim_pca_outliers: the PCA model enters as broadcast literals, so
    the projection is a narrow map with ZERO Exchanges and the top-20
    cut is TakeOrderedAndProject — the plan stays a single corpus scan
    at any N.  The model-build pass (memoized separately) must itself
    be one Arrow mapInPandas stage."""
    plan = _plan(spark, "sim_pca_outliers")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan

    from chinook_music_database_analysis_spark.operators.similarity import (
        embedding_moment_partials,
    )

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    mplan = (
        embedding_moment_partials(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in mplan
    assert "Exchange" not in mplan


def test_embedding_cosine_pair_sweep_is_equi_join(spark):
    """dd_embedding_cosine's r9 occupancy cap must keep the candidate
    stage an EQUI-join on (tbl, bucket, pos) — no nested-loop/cartesian
    node anywhere (the uncapped form was a bucket self-join whose hot
    buckets went occupancy^2; the windowed rewrite bounds it by
    construction, and this locks the plan so a regression to a
    non-equi pair join can't ship silently)."""
    plan = _plan(spark, "dd_embedding_cosine")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the positional window runs per (tbl, bucket)
    assert "row_number" in plan.lower() or "RunningWindowFunction" in plan


def test_core_tier_is_valid_subset():
    """The core test tier (SPARK_GRAFT_TEST_TIER=core) must stay a
    strict subset of the registry, contain EVERY SURVEY §2.12 parity
    target (q*/s* cohort — the reference's own workload is never
    skippable), and keep each named extension representative
    registered — so registry renames can't silently hollow out the
    fast gate."""
    import re

    from chinook_music_database_analysis_spark.plans import QUERIES

    from test_oracle_parity import _CORE_EXTENSION_REPS

    parity = {n for n in QUERIES if re.match(r"^[qs]\d", n)}
    core = parity | _CORE_EXTENSION_REPS
    assert _CORE_EXTENSION_REPS <= set(QUERIES), (
        _CORE_EXTENSION_REPS - set(QUERIES)
    )
    assert parity and core < set(QUERIES)
    # representative spread: every family prefix in the registry is
    # exercised by at least one core entry
    prefixes = {n.split("_")[0] for n in QUERIES}
    core_prefixes = {n.split("_")[0] for n in core}
    assert prefixes == core_prefixes, prefixes - core_prefixes


def test_bpe_retokenization_broadcasts_dictionary(spark):
    """The BPE consumers' scale claim is that corpus re-tokenization is
    ONE pass past a broadcast (tok -> n_syms) dictionary — never a
    shuffle join against the corpus and never a per-document merge
    replay.  Pin the physical plan: both consumers join the dictionary
    via BroadcastHashJoin, with no SortMergeJoin on the tok key."""
    for name in ("tx_bpe_source_tokens", "cur_bpe_length_buckets"):
        p = _plan(spark, name)
        assert "BroadcastHashJoin" in p, (name, p[:1500])
        assert "SortMergeJoin [tok" not in p, (name, p[:1500])
