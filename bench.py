"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing is end-to-end per query: plan + execute + count (a count()
action materializes the full result without shipping rows to the
driver).  Warm-run methodology: every query executes once untimed
before the timed pass, so the numbers measure steady-state engine
throughput (codegen compiled, file footers cached, shared memoized
relations built) rather than JVM/JIT cold-start — matching how these
queries run in a long-lived session or cluster.  The warm number per
query is the MIN across SPARK_GRAFT_BENCH_REPS (default 2) timed
passes — single-pass local[32] timings move ~±15% with scheduler
noise, and min-of-2 is the standard steady-state estimator.  The cold
pass is timed too and emitted in the same JSON line ("cold_total" /
"cold_queries") so both methodologies are machine-readable.
Failures never kill the run:
broken queries land in an "errors" key with their message and elapsed
time, and the JSON line prints regardless.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from chinook_music_database_analysis_spark.plans import QUERIES
    from chinook_music_database_analysis_spark.sources import get_spark

    spark = get_spark("chinook-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    try:
        names = sorted(QUERIES)
        # Cold pass: run every query once (codegen, footer caches,
        # memoized shared relations all cold).  Timed and emitted in
        # the JSON alongside the warm numbers so both methodologies
        # are machine-readable; it doubles as the warm-up.
        cold: dict[str, float] = {}
        t_cold = time.perf_counter()
        for name in names:
            t0 = time.perf_counter()
            try:
                QUERIES[name](spark, sf_dir).count()
                cold[name] = round(time.perf_counter() - t0, 3)
                print(f"# cold {name}: {cold[name]:.3f}s", file=sys.stderr)
            except Exception as ex:
                print(f"# cold {name}: ERROR {type(ex).__name__}: {ex}"[:200], file=sys.stderr)
        cold_total = round(time.perf_counter() - t_cold, 3)

        reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
        timings: dict[str, float] = {}
        errors: dict[str, dict] = {}
        for rep in range(reps):
            for name in names:
                t0 = time.perf_counter()
                try:
                    n = QUERIES[name](spark, sf_dir).count()
                    sec = round(time.perf_counter() - t0, 3)
                    if name not in timings or sec < timings[name]:
                        timings[name] = sec
                    if rep == reps - 1:
                        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)
                except Exception as ex:  # one broken query must not kill the bench
                    elapsed = round(time.perf_counter() - t0, 3)
                    msg = f"{type(ex).__name__}: {ex}"[:200]
                    errors[name] = {"error": msg, "sec": elapsed}
                    print(f"# {name}: ERROR after {elapsed:.3f}s {msg}", file=sys.stderr)
        total = round(sum(timings.values()), 3)

        # Streaming micro-bench: the applyInPandasWithState path over
        # the events table (availableNow -> noop sink), so state-store
        # / Arrow-state regressions are visible per round.
        streaming_sec = None
        try:
            from chinook_music_database_analysis_spark.streaming.events import (
                read_events_stream,
            )
            from chinook_music_database_analysis_spark.streaming.stateful import (
                user_running_totals_stream,
            )

            t0 = time.perf_counter()
            q = (
                user_running_totals_stream(read_events_stream(spark, sf_dir))
                .writeStream.format("noop")
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            streaming_sec = round(time.perf_counter() - t0, 3)
            print(f"# streaming_stateful: {streaming_sec:.3f}s", file=sys.stderr)
        except Exception as ex:
            print(f"# streaming_stateful: ERROR {type(ex).__name__}: {ex}"[:200], file=sys.stderr)

        sf_token = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        try:
            sf = float(sf_token)
        except ValueError:
            sf = None
        out = {
            "metric": "total_query_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "cold_total": cold_total,
            "cold_queries": cold,
        }
        if streaming_sec is not None:
            out["streaming_stateful_sec"] = streaming_sec
        if errors:
            out["errors"] = errors
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
