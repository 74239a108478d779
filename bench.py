"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_runtime", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": "<dir>"}

Each query is fully materialized via the noop sink (no driver collect —
measures the distributed plan, not result transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stedi_human_balance_redis_kafka_spark_streaming_spark.plans import registry
from stedi_human_balance_redis_kafka_spark_streaming_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


RUNS_PER_QUERY = 2


def main() -> None:
    # Periodic-GC timer raised to 30min: the per-query explicit GC below
    # already keeps the ContextCleaner fed, and the 5-minute timer would
    # otherwise fire a concurrent cycle mid-bench that lands its cost on
    # whichever query happens to be running.
    spark = get_spark(
        app_name="stedi-bench",
        extra_conf={"spark.cleaner.periodicGC.interval": "30min"},
    )
    # JVM/codegen warmup on a trivial action so the first timed query
    # doesn't absorb session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        # Drop operator-local caches so queries are timed independently
        # (leaked cached frames + pinned broadcasts degrade later
        # queries), and force a GC cycle so the ContextCleaner reclaims
        # dead shuffles/broadcasts between measurements (round-1: a
        # 32-query run degraded late queries ~8× without this).
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        return elapsed

    timings: dict[str, float] = {}
    for name, fn in sorted(registry.queries().items()):
        # Steady-state timing: min of N runs.  Cleanup I/O (ContextCleaner
        # deleting the previous heavy query's shuffle files) is bursty and
        # lands on whichever query is running — observed as a roaming
        # 20-80 s spike that moves between runs.  The min is the query's
        # actual plan cost.
        timings[name] = round(min(run_once(fn) for _ in range(RUNS_PER_QUERY)), 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
            }
        ),
        flush=True,
    )
    # Truncation guard: the driver may keep only the tail of stdout, and the
    # full per-query line above can lose its head (round 3: BENCH_r03.json had
    # parsed=null).  Emit a short self-contained summary LAST so the official
    # artifact always carries a parseable total.
    print(
        json.dumps(
            {
                "metric": "total_runtime",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": SF_DIR,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
