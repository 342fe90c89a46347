"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The registry lives in ``chinook_music_database_analysis_spark.plans``;
every entry mirrors one operator composition from SURVEY.md §2 (parity)
or an extension operator (dedup / similarity / text / streaming).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the caller's cwd.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q02: 5-way star join → agg → rank → top-k) on
    /root/testdata/sf0.001; driver checks rows>0."""
    from chinook_music_database_analysis_spark.plans import QUERIES

    return QUERIES["q02_top_parts_nation0"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from chinook_music_database_analysis_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same
    parquet tables.  Omitted entries get the driver's rows-only check."""
    from chinook_music_database_analysis_spark.plans import ORACLES

    return dict(ORACLES)
