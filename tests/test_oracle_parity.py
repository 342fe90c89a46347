"""Oracle-parity gate: every registered query with an oracle must match
DuckDB exactly (row count + columns + values) — the same compare the
driver runs at sf0.01, here at sf0.001 for speed."""

from __future__ import annotations

import pytest

from chinook_music_database_analysis_spark.plans import ORACLES, QUERIES

from conftest import SF_TEST_DIR, assert_frames_match


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_TEST_DIR)
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        # Rows-only check for non-SQL-expressible ops (driver does the same).
        assert spark_pdf.shape[1] > 0
        return
    oracle_pdf = ddb.sql(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)
