"""Persisted bucketed ANN signature store: results identical to the
session-cached relations, and the candidate self-join over the
bucketed table plans with ZERO Exchange (the layout replaces the
runtime shuffle — the 100 TB signature-store shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chinook_music_database_analysis_spark.operators.similarity import (
    embedding_near_dup_pairs,
    load_ann_store,
    lsh_n_bits,
    lsh_topk,
    persist_ann_store,
)

from conftest import SF_TEST_DIR


def _pairs_set(df):
    return {(r.vec_a, r.vec_b, r.cos_sim) for r in df.collect()}


def test_persisted_store_matches_and_dedup_join_is_shuffle_free(spark):
    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    n_bits = lsh_n_bits(emb.count())
    persist_ann_store(spark, emb, "ann_t", n_bits)
    try:
        buckets, norms = load_ann_store(spark, "ann_t")

        # 1. Same answers as the derive-in-session path.
        stored = embedding_near_dup_pairs(emb, buckets=buckets, norms=norms)
        derived = embedding_near_dup_pairs(emb, n_bits=n_bits)
        assert _pairs_set(stored) == _pairs_set(derived)

        # 2. The candidate self-join (keys tbl+bucket == the table's
        # bucket spec, so both sides' layout already satisfies the
        # join's distribution) must plan with no Exchange.  Broadcast
        # disabled to force the SMJ path.
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            cand = (
                buckets.alias("a")
                .join(buckets.alias("b"), ["tbl", "bucket"])
                .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            )
            plan = cand._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert cand.count() >= 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

        # 3. The top-k path accepts the stored relations too.
        got = lsh_topk(emb, buckets=buckets, norms=norms)
        ref = lsh_topk(emb, n_bits=n_bits)
        assert {tuple(r) for r in got.collect()} == {tuple(r) for r in ref.collect()}
    finally:
        spark.sql("DROP TABLE IF EXISTS ann_t_buckets")
        spark.sql("DROP TABLE IF EXISTS ann_t_norms")


def test_persisted_pq_index_matches_derived(spark):
    """pq_topk over the persisted index tables must return exactly the
    in-session-derived results — train/encode once per corpus version,
    serve from the stored books + reconstructions."""
    from chinook_music_database_analysis_spark.operators.similarity import (
        load_pq_index,
        persist_pq_index,
        pq_topk,
    )

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    persist_pq_index(spark, emb, "pq_t")
    try:
        books, recon = load_pq_index(spark, "pq_t")
        got = pq_topk(emb, books=books, recon=recon)
        ref = pq_topk(emb)
        assert {tuple(r) for r in got.collect()} == {tuple(r) for r in ref.collect()}
        assert books.count() > 0 and recon.count() == emb.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS pq_t_books")
        spark.sql("DROP TABLE IF EXISTS pq_t_recon")


def test_index_store_fingerprint_guard(spark, tmp_path, monkeypatch):
    """The on-disk index store (plans.extensions._persisted_index) must
    (a) serve later sessions from disk — proven by doctoring the stored
    relation and observing the doctored row count — and (b) refuse a
    store whose corpus fingerprint mismatches, retraining instead (the
    staleness guard that makes a regenerated test corpus safe)."""
    import glob
    import os

    from chinook_music_database_analysis_spark.plans import extensions as ext

    monkeypatch.setattr(ext, "_INDEX_ROOT", str(tmp_path))
    ext.reset_memo(SF_TEST_DIR)
    try:
        full = ext._ivf_cents(spark, SF_TEST_DIR)
        n_full = full.count()
        assert n_full > 0
        d = glob.glob(str(tmp_path / "*" / "ivf_cents"))[0]

        # Doctor the stored relation (drop one row), keep the
        # fingerprint: a fresh "session" (memo reset) must read the
        # doctored store — proving the load path serves from disk.
        doctored = spark.read.parquet(os.path.join(d, "data")).limit(n_full - 1)
        doctored.write.mode("overwrite").parquet(os.path.join(d, "data.new"))
        import shutil

        shutil.rmtree(os.path.join(d, "data"))
        os.rename(os.path.join(d, "data.new"), os.path.join(d, "data"))
        ext.reset_memo(SF_TEST_DIR)
        assert ext._ivf_cents(spark, SF_TEST_DIR).count() == n_full - 1

        # Invalidate the fingerprint: the loader must retrain (full
        # cardinality restored) and replace the store.
        with open(os.path.join(d, "_FINGERPRINT"), "w") as fh:
            fh.write("stale")
        ext.reset_memo(SF_TEST_DIR)
        assert ext._ivf_cents(spark, SF_TEST_DIR).count() == n_full
        assert open(os.path.join(d, "_FINGERPRINT")).read().strip() != "stale"
    finally:
        ext.reset_memo(SF_TEST_DIR)


def test_fp_memo_evicted_on_reset_and_retrain_after_regen(spark, tmp_path, monkeypatch):
    """The corpus-fingerprint memo must share the (kind, appId, sf_dir,
    table_set_id) key shape so reset_memo(sf_dir) evicts it — otherwise
    an in-session corpus regeneration followed by the documented
    reset_memo() re-mount keeps serving the OLD fingerprint, which
    still matches the old store's _FINGERPRINT, and _persisted_index
    silently serves an index trained on the replaced corpus."""
    import shutil

    from chinook_music_database_analysis_spark.plans import extensions as ext

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    sf_dir = str(corpus)
    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    n_all = emb.count()
    emb.limit(n_all - 10).write.parquet(f"{sf_dir}/embeddings.parquet")

    monkeypatch.setattr(ext, "_INDEX_ROOT", str(tmp_path / "idx"))
    ext.reset_memo(sf_dir)
    try:
        fp1 = ext._corpus_fp(spark, sf_dir)
        assert any(k[2] == sf_dir and str(k[0]).startswith("fp:")
                   for k in ext._SCALAR_MEMO), "fp key not sf_dir-evictable"
        ext._ivf_cents(spark, sf_dir)

        # Regenerate the corpus in place (different contents), re-mount.
        shutil.rmtree(f"{sf_dir}/embeddings.parquet")
        emb.limit(n_all - 3).write.parquet(f"{sf_dir}/embeddings.parquet")
        ext.reset_memo(sf_dir)
        assert not any(k[2] == sf_dir for k in ext._SCALAR_MEMO)

        fp2 = ext._corpus_fp(spark, sf_dir)
        assert fp2 != fp1, "fingerprint did not track the regenerated corpus"
        # And the store retrains rather than serving the stale index:
        # the persisted fingerprint now matches the NEW corpus.
        ext._ivf_cents(spark, sf_dir)
        import glob

        fps = glob.glob(str(tmp_path / "idx" / "*" / "ivf_cents" / "_FINGERPRINT"))
        # stored form is "<corpus_fp>|<params>" since r7 (governing
        # constants are mixed in); the corpus half must track fp2
        assert fps and open(fps[0]).read().strip().split("|", 1)[0] == fp2
    finally:
        ext.reset_memo(sf_dir)


def test_stale_staging_dirs_reclaimed(spark, tmp_path, monkeypatch):
    """A build killed mid-write leaves its unique d.tmp.<pid>.<rand>
    staging dir behind; the next build for that store must GC siblings
    whose owning pid is dead (r5 review) while leaving a live-pid
    sibling and an unparseable-but-recent one alone."""
    import glob
    import os
    import subprocess

    from chinook_music_database_analysis_spark.plans import extensions as ext

    monkeypatch.setattr(ext, "_INDEX_ROOT", str(tmp_path))
    ext.reset_memo(SF_TEST_DIR)
    try:
        # Predict the store dir the same way _persisted_index does.
        import re

        tag = re.sub(r"[^A-Za-z0-9.]+", "_", SF_TEST_DIR).strip("_")
        d = os.path.join(str(tmp_path), tag, "ivf_cents")
        os.makedirs(os.path.dirname(d), exist_ok=True)
        proc = subprocess.Popen(["true"])  # a pid guaranteed dead
        proc.wait()
        dead = f"{d}.tmp.{proc.pid}.aaaaaaaa"
        live = f"{d}.tmp.{os.getpid()}.bbbbbbbb"
        odd = f"{d}.tmp.unparseable"
        for p in (dead, live, odd):
            os.makedirs(p, exist_ok=True)

        ext._ivf_cents(spark, SF_TEST_DIR).count()  # triggers a build
        left = set(glob.glob(f"{d}.tmp.*"))
        assert dead not in left, "dead-pid staging dir not reclaimed"
        assert live in left, "live-pid staging dir must survive"
        assert odd in left, "recent unparseable staging dir must survive"
        for p in (live, odd):
            os.rmdir(p)
    finally:
        ext.reset_memo(SF_TEST_DIR)


def test_fingerprint_sees_footer_content(tmp_path):
    """Two parquet rewrites with identical path/size/mtime but
    different values must fingerprint differently: the tail probe
    hashes a footer-length-proportional slice, and parquet footers
    carry column statistics (min/max) that differ with the data (r5
    review hardening — the old fixed-16-byte probe could collide on
    writer-constant thrift tail fields)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chinook_music_database_analysis_spark.plans import extensions as ext

    class _FakeCtx:
        applicationId = "fp-test"

    class _FakeSpark:
        sparkContext = _FakeCtx()

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    f = str(corpus / "documents.parquet")

    def write(vals):
        pq.write_table(pa.table({"doc_id": pa.array(vals, pa.int64())}), f)

    write([1, 2, 3, 4])
    st = os.stat(f)
    fp1 = ext._corpus_fp(_FakeSpark(), str(corpus), "documents")
    ext._SCALAR_MEMO.clear()
    write([1, 2, 3, 9])  # same schema/rowcount/writer -> same size
    assert os.path.getsize(f) == st.st_size, "fixture requires equal sizes"
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))  # mtime-preserving restore
    fp2 = ext._corpus_fp(_FakeSpark(), str(corpus), "documents")
    assert fp1 != fp2


def test_fingerprint_probes_footer_head_region(tmp_path):
    """Many-row-group files have footers larger than the 4 KiB tail
    slice; statistics for early row groups then sit entirely OUTSIDE
    the tail.  The r7 probe hashes the FIRST 4 KiB of the footer
    region too, so a same-size mtime-preserving rewrite that only
    changes an early row group's data/statistics must still change the
    fingerprint (r6 review: the old probe read only a footer SUFFIX)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chinook_music_database_analysis_spark.plans import extensions as ext

    class _FakeCtx:
        applicationId = "fp-head-test"

    class _FakeSpark:
        sparkContext = _FakeCtx()

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    f = str(corpus / "documents.parquet")

    def write(swap):
        # swapping a value across row groups 0 and 1 changes both
        # groups' min/max statistics (head of the footer) while the
        # value multiset — and thus the encoded size — stays identical
        vals = list(range(3000))
        if swap:
            vals[0], vals[5] = vals[5], vals[0]
        pq.write_table(
            pa.table({"doc_id": pa.array(vals, pa.int64())}), f, row_group_size=5
        )

    write(False)
    # precondition: the footer really is bigger than the tail slice
    with open(f, "rb") as fh:
        fh.seek(os.path.getsize(f) - 8)
        trailer = fh.read(8)
    assert trailer[4:] == b"PAR1"
    footer_len = int.from_bytes(trailer[:4], "little")
    assert footer_len + 8 > 4096, "fixture must exceed the 4 KiB tail slice"

    st = os.stat(f)
    fp1 = ext._corpus_fp(_FakeSpark(), str(corpus), "documents")
    ext._SCALAR_MEMO.clear()
    write(True)  # only early row groups' head-of-footer stats change
    assert os.path.getsize(f) == st.st_size, "fixture requires equal sizes"
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))
    fp2 = ext._corpus_fp(_FakeSpark(), str(corpus), "documents")
    assert fp1 != fp2


def test_eperm_staging_dir_never_reclaimed(spark, tmp_path, monkeypatch):
    """PermissionError from kill(pid, 0) means the pid EXISTS (another
    user's live build) — its staging dir must survive GC even when
    older than the 1-day age-out that applies to unparseable names
    (r6 review: EPERM was previously lumped with 'liveness unknown')."""
    import os
    import re
    import time

    from chinook_music_database_analysis_spark.plans import extensions as ext

    monkeypatch.setattr(ext, "_INDEX_ROOT", str(tmp_path))
    ext.reset_memo(SF_TEST_DIR)
    real_kill = os.kill
    eperm_pid = 999999 + os.getpid()  # never a real pid we own

    def fake_kill(pid, sig):
        if pid == eperm_pid:
            raise PermissionError("operation not permitted")
        return real_kill(pid, sig)

    monkeypatch.setattr(ext._os, "kill", fake_kill)
    try:
        tag = re.sub(r"[^A-Za-z0-9.]+", "_", SF_TEST_DIR).strip("_")
        d = os.path.join(str(tmp_path), tag, "ivf_cents")
        os.makedirs(os.path.dirname(d), exist_ok=True)
        eperm = f"{d}.tmp.{eperm_pid}.cccccccc"
        old_odd = f"{d}.tmp.unparseable_old"
        os.makedirs(eperm)
        os.makedirs(old_odd)
        two_days_ago = time.time() - 2 * 86400
        os.utime(eperm, (two_days_ago, two_days_ago))
        os.utime(old_odd, (two_days_ago, two_days_ago))

        ext._ivf_cents(spark, SF_TEST_DIR).count()  # triggers GC + build
        assert os.path.isdir(eperm), "EPERM (live foreign) staging dir reclaimed"
        assert not os.path.isdir(old_odd), "aged unparseable dir must be GC'd"
        os.rmdir(eperm)
    finally:
        ext.reset_memo(SF_TEST_DIR)


def test_store_params_mismatch_invalidates(spark, tmp_path, monkeypatch):
    """Governing constants are mixed into the stored fingerprint via
    ``params``: the same corpus with a different params string must
    retrain instead of serving the stale store (r6 review — a knob
    edit is invisible to corpus-byte fingerprints)."""
    from chinook_music_database_analysis_spark.plans import extensions as ext

    monkeypatch.setattr(ext, "_INDEX_ROOT", str(tmp_path))
    builds = []

    def make_build(tagval):
        def build():
            builds.append(tagval)
            return spark.range(3).select(F.col("id").alias("x"))

        return build

    try:
        ext.reset_memo(SF_TEST_DIR)
        ext._persisted_index(
            "params_probe", spark, SF_TEST_DIR, make_build("a"),
            table="documents", params="k=1",
        ).count()
        assert builds == ["a"]
        # same params, fresh session-memo: served from the store
        ext.reset_memo(SF_TEST_DIR)
        ext._persisted_index(
            "params_probe", spark, SF_TEST_DIR, make_build("a2"),
            table="documents", params="k=1",
        ).count()
        assert builds == ["a"], "matching params must hit the store"
        # changed params: must rebuild
        ext.reset_memo(SF_TEST_DIR)
        ext._persisted_index(
            "params_probe", spark, SF_TEST_DIR, make_build("b"),
            table="documents", params="k=2",
        ).count()
        assert builds == ["a", "b"], "changed params must invalidate the store"
    finally:
        ext.reset_memo(SF_TEST_DIR)


def test_mrl_recall_floor_and_shortlist_bound(spark):
    """Matryoshka retrieval must (a) hold recall@5 >= 0.8 against the
    exact scan at the registered parameters, and (b) keep its coarse
    shortlist at exactly MRL_SHORTLIST rows per query — the bound that
    makes the full-vector rerank |q| x shortlist however large the
    corpus is."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.operators.similarity import (
        MRL_SHORTLIST,
        cosine_topk,
        mrl_topk,
    )

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    exact: dict[int, set[int]] = {}
    for r in cosine_topk(emb).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx: dict[int, set[int]] = {}
    for r in mrl_topk(emb).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    per_q = [
        len(approx.get(q, set()) & exact[q]) / len(exact[q]) for q in exact
    ]
    assert sum(per_q) / len(per_q) >= 0.8
    # rerank cost bound: every query's shortlist is capped, and with
    # n_corpus > shortlist it is exactly MRL_SHORTLIST candidates
    n = emb.count()
    wide = mrl_topk(emb, k=MRL_SHORTLIST)
    sizes = wide.groupBy("query_id").count().collect()
    cap = min(MRL_SHORTLIST, n - 1)
    assert all(r["count"] <= cap for r in sizes)
    if n - 1 > MRL_SHORTLIST:
        assert all(r["count"] == MRL_SHORTLIST for r in sizes)


def test_ivf_append_audit_is_not_degenerate(spark):
    """Guard against the silent-empty failure mode the residue choice
    exists for (appended set aligned with the k-means stride sample
    empties the centroids and BOTH engines agree on zero rows): the
    audit must cover every cell-assigned vector, see both populations,
    and the appended share must be ~20% overall."""
    from pyspark.sql import functions as F

    from chinook_music_database_analysis_spark.plans import QUERIES

    out = QUERIES["sim_ivf_append"](spark, SF_TEST_DIR)
    rows = out.collect()
    assert rows, "audit returned no cells"
    n_base = sum(r.n_base for r in rows)
    n_app = sum(r.n_appended for r in rows)
    n = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet").count()
    assert n_base + n_app == n
    assert abs(n_app / n - 0.2) < 0.02


def test_pair_window_cap_complete_on_benign_buckets(spark):
    """r9 occupancy cap (the knn_graph pattern applied to the near-dup
    pair sweep): on buckets with occupancy <= PAIR_WINDOW + 1 the
    capped candidate set IS the full bucket self-join's, so the driver
    corpus loses nothing; and on a pathological one-cluster corpus the
    candidate count respects the N*window*tables bound instead of
    going occupancy^2."""
    from chinook_music_database_analysis_spark.operators.similarity import (
        N_TABLES,
        _bucket_windowed_pairs,
        lsh_buckets,
    )

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    n_bits = lsh_n_bits(emb.count())
    capped = embedding_near_dup_pairs(emb, n_bits=n_bits)
    # window >= corpus size == the uncapped full self-join
    full = embedding_near_dup_pairs(emb, n_bits=n_bits, window=10**6)
    assert _pairs_set(capped) == _pairs_set(full)

    # pathological: every vector in ONE bucket per table (identical
    # embeddings) -> full join would be N^2/2 pairs; the window keeps
    # candidates <= N * window * tables.
    n, window = 200, 16
    hot = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 8), i -> CAST(1.0 AS FLOAT))").alias(
            "embedding"
        ),
    )
    cand = _bucket_windowed_pairs(lsh_buckets(hot, 4), window)
    n_cand = cand.count()
    assert n_cand <= n * window * N_TABLES
    assert n_cand < n * (n - 1) // 2  # strictly below the self-join


def test_range_search_router_sparse_on_driver_dense_on_hot(spark):
    """The r9 stats-first radius router: driver-shaped corpora stay on
    the pruned LSH path (what the registered oracle replicates); a
    one-cluster corpus whose query buckets run hot takes the broadcast
    dense scan, whose result is EXACTLY the brute-force radius answer
    (recall 1.0 — a superset of the banded contract, never less)."""
    from chinook_music_database_analysis_spark.operators.similarity import (
        RANGE_DENSE_CUTOVER,
        lsh_buckets,
        range_probe_stats,
        range_search,
        with_norms,
    )

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    n_q = 10
    buckets = lsh_buckets(emb, lsh_n_bits(emb.count()))
    n_corpus, cand_upper = range_probe_stats(buckets, n_q)
    assert n_corpus == emb.count()
    assert cand_upper < RANGE_DENSE_CUTOVER * n_q * n_corpus
    plan = range_search(emb)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan  # pruned path

    # one tight cluster -> every query bucket holds the whole corpus
    n = 120
    hot = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8),"
            " i -> CAST(1.0 + id * 0.0001 AS FLOAT))"
        ).alias("embedding"),
    )
    hb = lsh_buckets(hot, 4)
    hn, hc = range_probe_stats(hb, n_q)
    assert hc >= RANGE_DENSE_CUTOVER * n_q * hn
    dense = range_search(hot, tau=0.5, n_queries=n_q)
    plan = dense._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # dense route engaged

    # dense == exact brute-force radius answer
    wn = with_norms(hot)
    q = wn.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    from chinook_music_database_analysis_spark.operators.similarity import _cos

    exact = (
        wn.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
            F.col("norm").alias("n_norm"),
        )
        .crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cos("q_emb", "n_emb", "q_norm", "n_norm").alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.5)
    )
    got = {(r.query_id, r.neighbor_id, r.cos_sim) for r in dense.collect()}
    want = {(r.query_id, r.neighbor_id, r.cos_sim) for r in exact.collect()}
    assert got == want


def test_pca_power_model_matches_numpy(spark):
    """The quantize-then-power-iterate eigensolve must agree with
    numpy's exact eigendecomposition OF THE SAME quantized matrix:
    top-2 eigenvalues within 1e-3 relative (12 power steps on a
    decaying spectrum) and loadings aligned up to sign
    (|cos| > 0.995).  This is the 'is it actually PCA' check the
    cross-engine hash-match can't give."""
    import numpy as np

    from chinook_music_database_analysis_spark.operators.similarity import (
        EMB_DIM,
        embedding_moment_partials,
        pca_power_model,
    )

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    parts = [
        (r["n"], r["s"], r["ss"])
        for r in embedding_moment_partials(emb).collect()
    ]
    model = pca_power_model(parts)
    C = np.array(model["m_q"]).reshape(EMB_DIM, EMB_DIM)
    assert np.allclose(C, C.T)  # symmetrized before quantization
    evals, evecs = np.linalg.eigh(C)
    lam_np = evals[::-1][:2]
    v_np = evecs[:, ::-1][:, :2]
    for k, (lam, v) in enumerate(model["comps"]):
        assert abs(lam - lam_np[k]) <= 1e-3 * abs(lam_np[k]), (k, lam, lam_np[k])
        cos = abs(float(np.dot(np.array(v), v_np[:, k])))
        assert cos > 0.995, (k, cos)
    assert model["comps"][0][0] >= model["comps"][1][0] > 0
    # trace bounds the spectrum: explained shares in (0, 1] and ordered
    e1 = model["comps"][0][0] / model["trace_q"]
    e2 = model["comps"][1][0] / model["trace_q"]
    assert 0 < e2 <= e1 <= 1.0


def test_pca_moment_partials_are_batch_independent(spark):
    """Combining the Arrow-batch partials must give the same model
    whatever the partitioning: 1-partition and 8-partition corpora
    yield identical quantized covariance and eigenpairs (the
    quantization grid absorbs the different partial-sum
    associations)."""
    from chinook_music_database_analysis_spark.operators.similarity import (
        embedding_moment_partials,
        pca_power_model,
    )

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    models = []
    for parts_df in (
        embedding_moment_partials(emb.coalesce(1)),
        embedding_moment_partials(emb.repartition(8)),
    ):
        parts = [(r["n"], r["s"], r["ss"]) for r in parts_df.collect()]
        models.append(pca_power_model(parts))
    a, b = models
    assert a["m_q"] == b["m_q"]
    assert a["mu_q"] == b["mu_q"]
    assert [c[0] for c in a["comps"]] == [c[0] for c in b["comps"]]
    assert [c[1] for c in a["comps"]] == [c[1] for c in b["comps"]]


def test_pca_drift_stable_on_anisotropic_append(spark):
    """On a corpus with one dominant direction, appending 25% more
    vectors FROM THE SAME distribution must leave the principal axis
    aligned (|cos| ~ 1) and the mean near-unmoved — the no-drift
    baseline the sim_pca_drift monitor alerts against.  Built from a
    deterministic expression corpus (dim 3 carries 10x the variance)."""
    import math

    from chinook_music_database_analysis_spark.operators.similarity import (
        _fold,
        embedding_moment_partials,
        pca_power_model,
    )

    def corpus(n):
        # pseudo-random but deterministic: sin-hash amplitude, dim 3
        # scaled 10x -> dominant direction is e3 on any slice
        return spark.range(n).selectExpr(
            "id AS vec_id",
            "transform(sequence(1, 64), j -> CAST("
            " CASE WHEN j = 3 THEN 10.0 ELSE 1.0 END"
            " * sin(CAST(id * 64 + j AS DOUBLE))"
            " AS FLOAT)) AS embedding",
        )

    def model(df):
        parts = [
            (r["n"], r["s"], r["ss"])
            for r in embedding_moment_partials(df).collect()
        ]
        return pca_power_model(parts)

    base, full = model(corpus(160)), model(corpus(200))
    (_, vb), (_, vf) = base["comps"][0], full["comps"][0]
    cos = abs(_fold([vb[i] * vf[i] for i in range(64)]))
    assert cos > 0.999, cos
    # the dominant loading is dim 3 on both
    assert max(range(64), key=lambda i: abs(vb[i])) == 2
    assert max(range(64), key=lambda i: abs(vf[i])) == 2
    shift = math.sqrt(
        _fold(
            [
                (full["mu_q"][i] - base["mu_q"][i]) ** 2
                for i in range(64)
            ]
        )
    )
    assert shift < 0.5  # centroid essentially unmoved vs 10x-var axis


def test_range_probe_stats_count_is_exact(spark):
    """range_probe_stats' candidate_upper is documented as the EXACT
    pre-distinct row count of the query-bucket x corpus-bucket probe
    join — verify by building that join and counting, on both a
    driver-shaped corpus and a one-cluster hot corpus (where the
    router decision hinges on this number being right)."""
    from chinook_music_database_analysis_spark.operators.similarity import (
        lsh_buckets,
        range_probe_stats,
    )

    def check(emb, n_bits, n_q):
        buckets = lsh_buckets(emb, n_bits)
        n_corpus, cand_upper = range_probe_stats(buckets, n_q)
        qb = buckets.filter(F.col("vec_id") < n_q).select(
            F.col("vec_id").alias("query_id"), "tbl", "bucket"
        )
        joined = qb.join(buckets, ["tbl", "bucket"]).count()
        assert cand_upper == joined, (cand_upper, joined)
        assert n_corpus == emb.count()

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    check(emb, lsh_n_bits(emb.count()), 10)

    hot = spark.range(150).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8), i -> CAST(1.0 + id * 0.0001 AS FLOAT))"
        ).alias("embedding"),
    )
    check(hot, 4, 10)


def test_lsh_topk_hot_route_is_exact_bruteforce(spark):
    """lsh_topk's r9 hot-corpus route: when the stats pass measures the
    probe at >= cutover x |q| x N, the router must answer with the
    EXACT brute-force top-k (recall 1.0), not a degraded bucket probe —
    verify row-for-row equality against cosine_topk on a one-cluster
    corpus, and that the driver corpus stays on the pruned path."""
    from chinook_music_database_analysis_spark.operators.similarity import (
        RANGE_DENSE_CUTOVER,
        cosine_topk,
        lsh_buckets,
        lsh_topk,
        range_probe_stats,
    )

    n, n_q = 120, 10
    hot = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8), i -> CAST(1.0 + id * 0.0001 AS FLOAT))"
        ).alias("embedding"),
    )
    hb = lsh_buckets(hot, 4)
    hn, hc = range_probe_stats(hb, n_q)
    assert hc >= RANGE_DENSE_CUTOVER * n_q * hn  # dense route engages
    got = {
        (r.query_id, r.neighbor_id, r.rnk)
        for r in lsh_topk(hot, n_queries=n_q, n_bits=4).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rnk)
        for r in cosine_topk(hot, n_queries=n_q).collect()
    }
    assert got == want and len(want) == n_q * 5

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    bk = lsh_buckets(emb, lsh_n_bits(emb.count()))
    cn, cc = range_probe_stats(bk, n_q)
    assert cc < RANGE_DENSE_CUTOVER * n_q * cn  # pruned path kept


def test_router_log_records_route_and_warns_on_dense(spark, caplog):
    """The routers change result SEMANTICS past the cutover (exact
    superset / exact top-k), so the decision must be observable:
    ROUTER_LOG records every routing decision with the stats behind
    it, and the dense engagement logs a WARNING — a registered-corpus
    oracle mismatch after a corpus revision is then attributable to
    the route flip at a glance (r9 advice)."""
    import logging

    from chinook_music_database_analysis_spark.operators.similarity import (
        ROUTER_LOG,
        lsh_buckets,
        lsh_topk,
        range_search,
    )

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    range_search(emb)
    lsh_topk(emb)
    for op in ("range_search", "lsh_topk"):
        rec = ROUTER_LOG[op]
        assert rec["route"] == "pruned_lsh"  # driver corpus: pruned path
        assert rec["cand_upper"] < rec["bound"]
        assert rec["n_corpus"] == emb.count()

    # hot corpus: dense route recorded + warned
    hot = spark.range(120).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8),"
            " i -> CAST(1.0 + id * 0.0001 AS FLOAT))"
        ).alias("embedding"),
    )
    with caplog.at_level(
        logging.WARNING,
        logger="chinook_music_database_analysis_spark.operators.similarity",
    ):
        range_search(hot, tau=0.5, n_queries=10)
    assert ROUTER_LOG["range_search"]["route"] == "dense_exact"
    assert any("DENSE EXACT" in r.message for r in caplog.records)
    # lsh_topk on the same hot corpus flips too (shared stats pass)
    lsh_topk(hot, n_queries=10, buckets=lsh_buckets(hot, 4))
    assert ROUTER_LOG["lsh_topk"]["route"] == "dense_exact"


def test_router_dual_route_oracle_gate(spark, tmp_path):
    """r10 verdict item 3 — dual-route oracle attributability.  The
    routers change result SEMANTICS past the cutover, so BOTH routes
    must pass the full DuckDB hash gate on a corpus that actually
    CROSSES RANGE_DENSE_CUTOVER: the registered plans pin
    route='pruned' (their oracles replicate only that path, so a
    driver-corpus revision can never flip them off their gate), and
    this test covers what the registry then can't — on a synthetic
    one-cluster corpus, the forced pruned result matches the
    REGISTERED oracle SQL verbatim and the forced dense result matches
    a brute-force oracle, row/schema/value-exact through the same
    compare the driver runs."""
    import duckdb

    from chinook_music_database_analysis_spark.operators.similarity import (
        RANGE_DENSE_CUTOVER,
        lsh_buckets,
        range_probe_stats,
        range_search,
    )
    from chinook_music_database_analysis_spark.plans import ORACLES
    from chinook_music_database_analysis_spark.plans.extensions import _sql_cos

    from conftest import assert_frames_match

    n, n_q = 150, 10
    hot = spark.range(n).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> CAST("
        " 1.0 + 0.0005 * sin(CAST(id * 64 + j AS DOUBLE)) AS FLOAT)) AS embedding",
        "CAST(id % 3 AS INT) AS label",
    )
    path = str(tmp_path / "embeddings.parquet")
    hot.coalesce(1).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)
    # the corpus must actually cross the cutover, or this gate proves
    # nothing about the route the registry can't reach
    n_corpus, cand_upper = range_probe_stats(
        lsh_buckets(emb, lsh_n_bits(n)), n_q
    )
    assert cand_upper >= RANGE_DENSE_CUTOVER * n_q * n_corpus, (
        cand_upper,
        n_corpus,
    )

    dense_topk_sql = f"""
    WITH p AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             {_sql_cos('q.embedding', 'e.embedding')} AS cos_sim
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < {n_q}
    )
    SELECT query_id, neighbor_id, cos_sim,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
           ) AS INTEGER) AS rnk
    FROM p QUALIFY rnk <= 5
    """
    dense_range_sql = f"""
    WITH p AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             {_sql_cos('q.embedding', 'e.embedding')} AS cos_sim
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < {n_q}
    )
    SELECT * FROM p WHERE cos_sim >= 0.2
    """
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{path}/*.parquet'"
        )
        cases = [
            ("lsh_topk_pruned", lsh_topk(emb, route="pruned"), ORACLES["sim_lsh_topk"]),
            ("lsh_topk_dense", lsh_topk(emb, route="dense"), dense_topk_sql),
            (
                "range_search_pruned",
                range_search(emb, route="pruned"),
                ORACLES["sim_range_search"],
            ),
            ("range_search_dense", range_search(emb, route="dense"), dense_range_sql),
        ]
        for name, df, sql in cases:
            assert_frames_match(df.toPandas(), con.sql(sql).df(), name)
    finally:
        con.close()


def test_pca_power_model_method_routing():
    """r11: dims above PCA_FOLD_MAX_DIM auto-route to the BLAS
    eigensolve (the exact-fold contract path costs minutes of
    interpreted Python at d=2048 and no oracle exists there); at
    oracle dims the two paths must agree on the quantized covariance
    BIT-FOR-BIT and on eigenvalues to float precision, so the routing
    can never move a registered query's result."""
    import numpy as np
    import pytest as _pytest

    from chinook_music_database_analysis_spark.operators.similarity import (
        PCA_FOLD_MAX_DIM,
        pca_power_model,
    )

    rng = np.random.default_rng(7)
    d = 64
    # 12 partials, not 3: numpy pairwise summation degenerates to the
    # sequential fold below ~8 addends, so a small partial count can't
    # catch an association mismatch in the BLAS twin's s/ss accumulate
    # (r12, closing the r11 advice).
    parts = []
    for _ in range(12):
        X = rng.normal(size=(200, d))
        X[:, 0] *= 4.0
        parts.append((200, X.sum(axis=0).tolist(), (X.T @ X).ravel().tolist()))
    fold = pca_power_model(parts, dim=d, method="fold")
    blas = pca_power_model(parts, dim=d, method="numpy")
    auto = pca_power_model(parts, dim=d)  # d=64 <= cap -> fold path
    assert fold["m_q"] == blas["m_q"] == auto["m_q"]
    assert fold["mu_q"] == blas["mu_q"] == auto["mu_q"]
    assert fold["trace_q"] == blas["trace_q"] == auto["trace_q"]
    assert fold["comps"][0][0] == auto["comps"][0][0]
    for (lf, _), (lb, _) in zip(fold["comps"], blas["comps"]):
        assert abs(lf - lb) <= 1e-12 * abs(lf)
    assert PCA_FOLD_MAX_DIM == 512  # doc'd cap; probe covers 2048 via numpy
    with _pytest.raises(ValueError, match="unknown method"):
        pca_power_model(parts, dim=d, method="exact")


def test_index_store_concurrent_writer_fallback(spark, tmp_path, monkeypatch):
    """r12 (r11 verdict task 3): two sessions racing the staged
    ``os.rename`` swap.  The loser's rename hits a non-empty target
    (the winner just swapped its build in) and must (a) serve the
    WINNER's store when the fingerprints agree, (b) fall back to its
    own in-session build when they don't, and (c) on the cache path,
    serve its own cached relation either way.  Simulated by planting a
    winner store at the target between the loser's rmtree and rename —
    exactly the lost-race interleaving."""
    import os
    import shutil

    from chinook_music_database_analysis_spark.plans import extensions as ext

    monkeypatch.setattr(ext, "_INDEX_ROOT", str(tmp_path))
    ext.reset_memo(SF_TEST_DIR)

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    loser_build = lambda: emb.select("vec_id").limit(20)  # noqa: E731
    fp = ext._corpus_fp(spark, SF_TEST_DIR)  # default table="embeddings"

    # Pre-materialize the winner's store payload (7 rows — count is the
    # tell for WHOSE relation got served).
    winner_side = tmp_path / "winner_payload"
    emb.select("vec_id").limit(7).write.parquet(str(winner_side / "data"))

    real_rename = os.rename
    state = {}

    def losing_rename(src, dst, *a, **kw):
        # Intercept ONLY the loser's final swap for the kind under
        # test (Spark's own output committer also renames — those pass
        # through untouched), and only once per case.
        if (
            os.path.basename(dst) == state.get("kind")
            and f"{state['kind']}.tmp." in src
            and not state.get("planted")
        ):
            state["planted"] = True
            shutil.copytree(winner_side, dst)
            with open(os.path.join(dst, "_FINGERPRINT"), "w") as fh:
                fh.write(state["winner_fp"])
        return real_rename(src, dst, *a, **kw)

    monkeypatch.setattr(ext._os, "rename", losing_rename)
    pq_writer = lambda df, path: df.write.mode("overwrite").parquet(path)  # noqa: E731

    def run(kind, winner_fp, writer):
        state.update(kind=kind, winner_fp=winner_fp, planted=False)
        got = ext._persisted_index(
            kind, spark, SF_TEST_DIR, loser_build, writer=writer
        )
        assert state["planted"], "race never triggered"
        return got

    # (a) writer path, fingerprints agree -> the winner's store serves.
    assert run("race_w_same", fp, pq_writer).count() == 7
    # (b) writer path, fingerprint mismatch -> loser's own build.
    assert run("race_w_diff", "someone-elses-corpus", pq_writer).count() == 20
    # the mismatched winner store stays on disk untouched (next session
    # with the matching corpus will replace it through the normal path)
    d_diff = next(tmp_path.glob("*/race_w_diff"))
    assert open(d_diff / "_FINGERPRINT").read() == "someone-elses-corpus"
    # (c) cache path (writer=None): the in-session cached build serves
    # regardless of the winner's fingerprint...
    assert run("race_c_same", fp, None).count() == 20
    # ...and the winner's store is left in place, not clobbered.
    d_same = next(tmp_path.glob("*/race_c_same"))
    assert spark.read.parquet(str(d_same / "data")).count() == 7
    ext.reset_memo(SF_TEST_DIR)
