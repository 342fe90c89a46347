"""Shared fixtures: one SparkSession per test session, a DuckDB oracle
connection with the driver tables registered as views, and the
order-insensitive compare helper mirroring the driver's correctness
gate (row count + column names + values after sorting)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from chinook_music_database_analysis_spark.sources import TABLES, get_spark

#: Tests default to the smallest SF for speed; CI can point elsewhere.
SF_TEST_DIR = os.environ.get("SF_TEST_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("chinook-spark-tests")
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_TEST_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by stringified values (the driver
    hashes order-insensitively; sorting on a string key is robust to
    mixed/null columns)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).reset_index(drop=True)
    if len(pdf):
        key = pdf.astype(str).agg("|".join, axis=1)
        pdf = pdf.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return pdf


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    # Timestamps arrive with different resolutions (Spark: us, DuckDB:
    # us/ns) — unify before the exact compare.
    for col in a.columns:
        if pd.api.types.is_datetime64_any_dtype(a[col]) or pd.api.types.is_datetime64_any_dtype(
            b[col]
        ):
            a[col] = pd.to_datetime(a[col]).astype("datetime64[us]")
            b[col] = pd.to_datetime(b[col]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)
    # The driver's gate compares STRINGIFIED values, so a numerically
    # equal result can still fail it on type drift — e.g. an uncast
    # DuckDB SUM(BIGINT) lands in pandas as float and prints 4568.0
    # against Spark's 4568 (caught live in r8 on three oracles).
    # Enforce the same strictness here so the class can't recur.
    assert a.astype(str).equals(b.astype(str)), (
        f"{name}: values match numerically but stringified compare "
        "differs — oracle/Spark type drift (cast the oracle aggregates)"
    )
