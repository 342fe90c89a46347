"""Per-query profile: split plan-construction wall from execution wall.

Usage:
    python scripts/qprof.py [--reps N] [--action count|noop] name [name ...]

For each query: builds the DataFrame REPS times (timed — this is the
Python-side + analysis cost bench.py pays every rep) and executes it
REPS times (timed).  First build/execution is reported separately as
cold (memoized relations, codegen).  Jobs are labelled so a UI / event
log can attribute them (guide §1.5).
"""

from __future__ import annotations

import os
import statistics
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    action = "count"
    names = []
    it = iter(args)
    for a in it:
        if a == "--reps":
            reps = int(next(it))
        elif a == "--action":
            action = next(it)
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from chinook_music_database_analysis_spark.plans import QUERIES
    from chinook_music_database_analysis_spark.sources import get_spark

    spark = get_spark("chinook-qprof")
    spark.sparkContext.setLogLevel("ERROR")
    # generic warmup (mirrors bench.py)
    spark.range(1_000_000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id bigint").count()

    def run(df):
        if action == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    print(f"{'query':<30} {'build_cold':>10} {'build_med':>10} {'exec_cold':>10} {'exec_med':>10}")
    for name in names:
        spark.sparkContext.setJobDescription(f"qprof:{name}")
        builds, execs = [], []
        df = None
        for i in range(reps + 1):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            builds.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(df)
            execs.append(time.perf_counter() - t0)
        print(
            f"{name:<30} {builds[0]:>10.3f} {statistics.median(builds[1:]):>10.3f}"
            f" {execs[0]:>10.3f} {statistics.median(execs[1:]):>10.3f}"
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
