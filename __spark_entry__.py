"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

REGISTRATION ORDER IS A COVERAGE DECISION: the driver checks only the
first 50 registered queries, so ``plans/registry.py`` orders the dict
explicitly — 50 primary queries (every claimed operator family) first,
then ``SUPPLEMENTARY_QUERIES`` (exact duals/subsets of an in-window
query) and ``EXTENDED_QUERIES`` (added capability beyond the window)
at the tail; every tail query is still oracle-backed and verified each
round by the dtype-faithful local parity suite
(tests/test_oracle_parity.py).  tests/test_registry_window.py enforces
the invariants.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stedi_human_balance_redis_kafka_spark_streaming_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the full reference pipeline end-to-end: Redis-CDC envelope decode
    chain ⨝ risk-event parse on customer == email → string-typed output
    contract (SURVEY.md §2.5.3).
    """
    return registry.queries()["stedi_customer_risk_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return registry.oracle_sql()
