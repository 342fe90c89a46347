"""Dual-surface equivalence: each Spark-SQL text must produce exactly
the DataFrame builder's result through Engine.sql."""

from __future__ import annotations

import pytest

from chinook_music_database_analysis_spark.engine import Engine
from chinook_music_database_analysis_spark.plans.sql_texts import SPARK_SQL

from conftest import SF_TEST_DIR, assert_frames_match


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(sf_dir=SF_TEST_DIR, spark=spark)


@pytest.mark.parametrize("name", sorted(SPARK_SQL))
def test_sql_text_equals_dataframe_builder(engine, name):
    via_sql = engine.sql(SPARK_SQL[name]).toPandas()
    via_df = engine.query(name).toPandas()
    assert_frames_match(via_sql, via_df, f"sql-vs-df:{name}")
