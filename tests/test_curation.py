"""Curation-operator semantics + plan-shape tests.

Value correctness vs DuckDB is covered by test_oracle_parity (the
registry gate); these tests pin the properties the oracles can't see:
determinism/stability of the content-addressed sampling, actual
redaction (not a no-op), cluster/canonical set algebra, and the plan
shapes the 100 TB story depends on (narrow maps stay shuffle-free, the
decontamination corpus side is broadcast-joined, never shuffled).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from chinook_music_database_analysis_spark.operators.curation import (
    PII_RULES,
    benchmark_contamination,
    canonical_docs,
    hash_sample,
    pct_threshold,
    redact_pii,
    train_val_test_split,
)
from chinook_music_database_analysis_spark.plans import QUERIES
from chinook_music_database_analysis_spark.sources import load_tables

from conftest import SF_TEST_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark):
    return load_tables(spark, SF_TEST_DIR)["documents"]


def test_hash_sample_deterministic_and_repartition_stable(docs):
    ids1 = {r.doc_id for r in hash_sample(docs, "doc_id", 20.0).select("doc_id").collect()}
    ids2 = {
        r.doc_id
        for r in hash_sample(docs.repartition(7), "doc_id", 20.0).select("doc_id").collect()
    }
    assert ids1 == ids2 and ids1  # membership is content-addressed, not split-seeded
    n = docs.count()
    assert 0.10 * n <= len(ids1) <= 0.30 * n  # ~20% within loose bounds


def test_split_partitions_corpus_and_is_append_stable(docs):
    out = train_val_test_split(docs, "doc_id").select("doc_id", "split").collect()
    by = {}
    for r in out:
        by[r.split] = by.get(r.split, 0) + 1
    assert set(by) <= {"train", "val", "test"} and by["train"] > by.get("val", 0)
    # Append-stability: splitting HALF the corpus assigns the same
    # labels those docs get when splitting the whole corpus.
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sub = dict(
        train_val_test_split(half, "doc_id").select("doc_id", "split").collect()
    )
    full = {r.doc_id: r.split for r in out}
    assert all(full[k] == v for k, v in sub.items())


def test_sample_and_pii_plans_are_shuffle_free(spark):
    for name in ("cur_sample", "cur_split", "cur_pii_redact"):
        p = _plan(QUERIES[name](spark, SF_TEST_DIR))
        assert "Exchange" not in p, f"{name} must be a narrow map:\n{p}"


def test_redact_pii_actually_redacts(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.com call 415-555-0199 at 10.20.30.40 end")],
        "id int, text string",
    )
    row = redact_pii(df).collect()[0]
    assert row.n_redacted == 3
    assert "<EMAIL>" in row.clean_text and "<PHONE>" in row.clean_text and "<IP>" in row.clean_text
    for pat, _ in PII_RULES:
        assert not re.search(pat, row.clean_text)


def test_decontam_corpus_side_not_shuffled(docs):
    df = benchmark_contamination(docs, bench_pct=5.0)
    p = _plan(df)
    assert p.count("BroadcastHashJoin") == 1 and "SortMergeJoin" not in p
    # The probe (corpus) subtree below the broadcast join must be
    # shuffle-free: every Exchange lies in the bench build side or
    # above the join (the matched-rows agg).
    probe = p.split("BroadcastHashJoin")[1].split("BroadcastExchange")[0]
    assert "Exchange" not in probe, f"corpus side shuffled:\n{p}"


def test_canonical_docs_set_algebra(spark, docs):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    from chinook_music_database_analysis_spark.operators.dedup import duplicate_clusters

    clusters = duplicate_clusters(pairs)
    kept = {r.doc_id for r in canonical_docs(docs, clusters).select("doc_id").collect()}
    everyone = {r.doc_id for r in docs.select("doc_id").collect()}
    # Representatives (cluster minima) stay; other members drop.
    assert everyone - kept == {2, 3, 11}
    assert {1, 10} <= kept


def test_pct_threshold_exact_hex():
    assert pct_threshold(0) == "0000"
    assert pct_threshold(100) == "10000"  # sorts after every 4-hex bucket
    assert pct_threshold(20) == "3333"
    assert pct_threshold(10) == "199a"
    assert pct_threshold(5) == "0ccd"


def test_expectation_report_null_counts_as_violation(spark):
    from chinook_music_database_analysis_spark.operators.quality import (
        expectation_report,
        fk_violation_report,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id long, amount double"
    )
    rows = {
        r.rule: r
        for r in expectation_report(
            df, {"amount_positive": F.col("amount") > 0}
        ).collect()
    }
    r = rows["amount_positive"]
    assert r.n_rows == 3 and r.n_violations == 2  # -5 fails, NULL fails too
    parent = spark.createDataFrame([(1,), (3,)], "id long")
    fk = fk_violation_report(df, parent, "id", "id", "fk").collect()[0]
    assert fk.n_rows == 3 and fk.n_violations == 1  # id=2 orphaned
