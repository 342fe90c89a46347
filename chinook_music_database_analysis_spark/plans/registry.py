from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

#: name -> (spark, sf_dir) -> DataFrame
QUERIES: dict[str, "Callable[[SparkSession, str], DataFrame]"] = {}
#: name -> equivalent ANSI SQL for DuckDB (omitted for non-SQL-expressible ops)
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its oracle SQL) to the registry."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        fn.query_name = name
        return fn

    return deco
