"""User-facing engine facade.

The reference workload is "a session bound to the chinook database
plus 19 analytical statements" (ref /root/reference/SQL_file.sql:1).
The engine equivalent: one object owning a SparkSession with every
table (and the derived view) registered, exposing

* ``engine.sql(text)``      — raw Spark SQL over the registered views
  (entry point 1 of SURVEY.md §3.1),
* ``engine.query(name)``    — the typed query registry (every SURVEY
  §2.12 parity query + every extension),
* ``engine.explain(name)``  — the EXPLAIN surface (formatted physical
  plan, SURVEY §3.1 step 6),
* ``engine.tables``         — the catalog.

Usage::

    from chinook_music_database_analysis_spark.engine import Engine
    eng = Engine(sf_dir="/root/testdata/sf0.01")
    eng.query("q02_top_parts_nation0").show()
    eng.sql("SELECT * FROM nation0_type_sales ORDER BY rnk").show()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans import ORACLES, QUERIES
from .sources import get_spark, register_views
from .sources.session import DEFAULT_SF_DIR


class Engine:
    """A session + catalog + query registry bound to one data directory."""

    def __init__(self, sf_dir: str = DEFAULT_SF_DIR, spark: SparkSession | None = None):
        self.spark = spark or get_spark("chinook-engine")
        self.sf_dir = sf_dir
        self.tables = register_views(self.spark, sf_dir)

    # -- entry point 1: SQL text ------------------------------------------------
    def sql(self, text: str) -> DataFrame:
        """Run Spark SQL against the registered catalog (tables + the
        nation0_type_sales view)."""
        return self.spark.sql(text)

    # -- entry point 2: typed registry -----------------------------------------
    def query(self, name: str) -> DataFrame:
        """Build a registered query's DataFrame (lazily; no action run)."""
        return QUERIES[name](self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        return sorted(QUERIES)

    def oracle(self, name: str) -> str | None:
        """The ANSI-SQL oracle text for a query (None for ops that have
        no SQL equivalent)."""
        return ORACLES.get(name)

    # -- inspection -------------------------------------------------------------
    def explain(self, name: str, mode: str = "formatted") -> str:
        """The EXPLAIN surface: Catalyst's plan for a registered query.

        Uses the public ``DataFrame.explain`` (stdout-captured), so it
        works under Spark Connect and across minor versions — no
        ``_jvm``/``_jdf`` internals.
        """
        import contextlib
        import io

        df = self.query(name)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()

    def profile(self, name: str) -> dict:
        """Execute a registered query and return observed runtime
        metrics: wall seconds, output rows, and the executed (adaptive-
        final) plan text — the observability surface an operator uses
        to spot a bad plan in production without a UI.

        Metrics come from the public count() action plus the executed
        plan string; per-node SQL metrics stay in the Spark UI — this
        returns what a CLI health check needs."""
        import time

        df = self.query(name)
        t0 = time.perf_counter()
        n_rows = df.count()
        wall = time.perf_counter() - t0
        return {
            "query": name,
            "wall_sec": round(wall, 3),
            "n_rows": n_rows,
            # one capture implementation: explain() owns the
            # stdout-redirect quirks (Spark Connect etc.)
            "plan": self.explain(name, "simple"),
        }

    def validate(self, name: str) -> dict:
        """Run a registered query AND its DuckDB oracle on this
        engine's data directory and compare exactly (row count, column
        set, order-insensitive values) — the correctness harness as a
        first-class API, so a deployment can spot-check any query
        against an independent engine without the test suite.

        Returns {"query", "rows_match", "schema_match", "values_match",
        "spark_rows", "oracle_rows"}; queries without an oracle (none
        currently) report {"oracle": None}.
        """
        import duckdb
        import pandas as pd

        from .sources import TABLES
        from .sources.session import TABLE_OVERRIDES

        if self.sf_dir in TABLE_OVERRIDES:
            # A mounted table set has no parquet directory for DuckDB
            # to read — fail with the actual situation instead of a
            # confusing file-not-found from inside the oracle query
            # (r12 review).  validate_all records this per query under
            # "errors": honest "unverifiable here", not a silent pass.
            raise ValueError(
                f"validate({name!r}): {self.sf_dir!r} is a mounted table"
                " set (TABLE_OVERRIDES) — the DuckDB oracle needs a"
                " parquet data directory"
            )
        oracle = ORACLES.get(name)
        if oracle is None:
            return {"query": name, "oracle": None}
        spark_pdf = self.query(name).toPandas()
        con = duckdb.connect()
        try:
            for t in TABLES:
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS"
                    f" SELECT * FROM '{self.sf_dir}/{t}.parquet'"
                )
            oracle_pdf = con.sql(oracle).df()
        finally:
            con.close()

        def norm(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.reindex(sorted(pdf.columns), axis=1).reset_index(drop=True)
            for c in pdf.columns:
                if pd.api.types.is_datetime64_any_dtype(pdf[c]):
                    pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
            if len(pdf):
                key = pdf.astype(str).agg("|".join, axis=1)
                pdf = pdf.loc[key.sort_values(kind="mergesort").index]
            return pdf.reset_index(drop=True)

        a, b = norm(spark_pdf), norm(oracle_pdf)
        return {
            "query": name,
            "rows_match": len(spark_pdf) == len(oracle_pdf),
            "schema_match": sorted(spark_pdf.columns) == sorted(oracle_pdf.columns),
            "values_match": a.shape == b.shape and a.astype(str).equals(b.astype(str)),
            "spark_rows": len(spark_pdf),
            "oracle_rows": len(oracle_pdf),
        }

    def validate_all(self, names: list[str] | None = None) -> dict:
        """Run :meth:`validate` over ``names`` (default: every
        registered query) and return a summary — the deployment
        health sweep: {"n", "passed", "failed": [name...],
        "errors": {name: message}}.  A failure or error never aborts
        the sweep."""
        names = sorted(QUERIES) if names is None else names
        failed: list[str] = []
        errors: dict[str, str] = {}
        for name in names:
            try:
                res = self.validate(name)
                ok = res.get("oracle", True) is None or (
                    res.get("rows_match")
                    and res.get("schema_match")
                    and res.get("values_match")
                )
                if not ok:
                    failed.append(name)
            except Exception as ex:  # sweep must report, not die
                errors[name] = f"{type(ex).__name__}: {ex}"[:200]
        return {
            "n": len(names),
            "passed": len(names) - len(failed) - len(errors),
            "failed": failed,
            "errors": errors,
        }
