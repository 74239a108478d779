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


def main() -> None:
    spark = get_spark(app_name="stedi-bench")
    # JVM/codegen warmup on a trivial action so the first timed query
    # doesn't absorb session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, fn in sorted(registry.queries().items()):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)
        # Drop operator-local caches so queries are timed independently
        # (leaked cached frames + pinned broadcasts degrade later queries).
        spark.catalog.clearCache()
        # ContextCleaner reclaims broadcasts/shuffles only when the JVM
        # GCs; a 32-query run accumulates enough dead state between GCs
        # that late queries degrade ~8× (round-1: 6.7 s isolated → 55.6 s
        # in-bench).  Force a concurrent cycle (ExplicitGCInvokesConcurrent
        # is set in session.py) after each query so cleanup keeps pace.
        spark.sparkContext._jvm.System.gc()

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
        )
    )


if __name__ == "__main__":
    main()
