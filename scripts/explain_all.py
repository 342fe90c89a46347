"""Capture ``explain('formatted')`` for every registry query.

Usage:
    python scripts/explain_all.py OUTDIR [name ...]

Writes OUTDIR/<query>.txt per query (plan only — nothing executes
except the bounded ANALYZE-pattern scalars some plan builders compute
while constructing the DataFrame), plus OUTDIR/_plan_stats.tsv with
one row per query summarising the plan shape the optimization guide
says to look at (§7.2): Exchange count, join strategies, Python-eval
nodes, scans, and whether filters reached the parquet scan.
"""

from __future__ import annotations

import os
import re
import sys


def _explain_str(spark, df) -> str:
    try:
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return df._jdf.queryExecution().explainString(mode)
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def main() -> None:
    outdir = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from chinook_music_database_analysis_spark.plans import QUERIES
    from chinook_music_database_analysis_spark.sources import get_spark

    spark = get_spark("chinook-explain")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    try:
        for name in sorted(QUERIES):
            if only and name not in only:
                continue
            try:
                df = QUERIES[name](spark, sf_dir)
                plan = _explain_str(spark, df)
            except Exception as ex:  # keep sweeping
                plan = f"ERROR {type(ex).__name__}: {ex}"
            with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
            stats = {
                "exchanges": len(re.findall(r"\bExchange\b", plan)),
                "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
                "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
                "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
                "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
                "cart": len(re.findall(r"CartesianProduct", plan)),
                "pyeval": len(
                    re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)
                ),
                "scans": len(re.findall(r"Scan parquet|BatchScan", plan)),
                "sorts": len(re.findall(r"\bSort \[", plan)),
                "window": len(re.findall(r"\bWindow\b", plan)),
                "aggs": len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan)),
                "rowtojvm": len(re.findall(r"RowToColumnar|ColumnarToRow", plan)),
            }
            rows.append((name, stats))
            print(name, stats, file=sys.stderr)
    finally:
        spark.stop()
    with open(os.path.join(outdir, "_plan_stats.tsv"), "w") as fh:
        keys = ["exchanges", "smj", "bhj", "shj", "bnlj", "cart", "pyeval", "scans", "sorts", "window", "aggs", "rowtojvm"]
        fh.write("query\t" + "\t".join(keys) + "\n")
        for name, st in rows:
            fh.write(name + "\t" + "\t".join(str(st[k]) for k in keys) + "\n")


if __name__ == "__main__":
    main()
