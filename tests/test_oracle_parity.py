"""Driver-parity self-check: run every registered query on Spark AND its
DuckDB oracle on the same Parquet tables, compare row count + sorted
column names + order-insensitive values.

This mimics the driver's CORRECTNESS gate (see /root/repo/__spark_entry__.py
docstring) so mismatches surface locally before a round ends.  Runs at the
driver's sf0.01 scale and compares floats EXACTLY — round-1 lesson: the
stedi_risk_by_birth_year reassociation bug passed a 9-decimal-rounded
sf0.001 check locally while failing the driver's exact hash at sf0.01.
Set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 for a quicker iteration
loop while developing a new query.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(v):
    """Make values hashable/comparable across engines (floats EXACT —
    the driver hashes exact values, so so do we)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_normalize(x) for x in v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_normalize(r[i]) for i in order) for r in rows]
    # None-safe sort key (NULL grouping keys from ROLLUP/CUBE subtotals
    # are not comparable to str/int); equality compares the raw values.
    return sorted(normed, key=lambda t: tuple((x is None, x or 0 if not isinstance(x, str) else x) for x in t))


QUERY_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sc, dc = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
