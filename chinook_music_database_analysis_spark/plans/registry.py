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
    """Decorator: add a query (and optionally its oracle SQL) to the registry.

    Raises on a duplicate name: ``QUERIES[name] = fn`` would silently
    overwrite, so a copy-pasted registration block would ship as dead
    code with no warning (this bit r9 — sim_label_drift was registered
    twice, byte-identical; had the copies diverged, only the later one
    would have taken effect)."""

    def deco(fn):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} is already in the "
                f"registry (defined by {QUERIES[name].__module__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        fn.query_name = name
        return fn

    return deco
