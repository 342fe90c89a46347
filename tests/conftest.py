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


# Compare logic lives in the package so the fuzz gate
# (scripts/fuzzgate.py) applies the IDENTICAL driver mirror; re-export
# for the existing test imports.
from chinook_music_database_analysis_spark.testing import (  # noqa: E402
    frames_mismatch,
    normalize,
)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    reason = frames_mismatch(spark_pdf, oracle_pdf, name)
    assert reason is None, f"{name}: {reason}"
