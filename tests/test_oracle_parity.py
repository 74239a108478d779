"""Driver-parity self-check: run every registered query on Spark AND its
DuckDB oracle on the same Parquet tables, compare row count + sorted
column names + pandas dtypes + order-insensitive values.

This mimics the driver's CORRECTNESS gate (see /root/repo/__spark_entry__.py
docstring) so mismatches surface locally before a round ends.  Runs at the
driver's sf0.01 scale and compares floats EXACTLY — round-1 lesson: the
stedi_risk_by_birth_year reassociation bug passed a 9-decimal-rounded
sf0.001 check locally while failing the driver's exact hash at sf0.01.
Set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 for a quicker iteration
loop while developing a new query.

DTYPE FAITHFULNESS (round-2 lesson): both sides are canonicalized through
*pandas*, exactly like the driver, not through cursor ``fetchall()``.
DuckDB's ``SUM(BIGINT)`` returns HUGEINT; through ``fetchall()`` that
arrives as a plain Python int and equality passes, but through pandas it
becomes float64/object and the driver's value hash diverges from Spark's
int64.  Four uncast oracle SUMs shipped green locally and failed the
driver gate exactly this way, so this suite now compares pandas dtype
KINDS before values: an integer column on one side must be an integer
column on the other.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
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
    if v is pd.NaT:
        return None
    if isinstance(v, np.generic):
        return _normalize(v.item())
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        return tuple(_normalize(x) for x in v.tolist())
    if isinstance(v, list):
        return tuple(_normalize(x) for x in v)
    return v


def _canon(pdf: pd.DataFrame):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [
        tuple(_normalize(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    # None-safe sort key (NULL grouping keys from ROLLUP/CUBE subtotals
    # are not comparable to str/int); equality compares the raw values.
    return sorted(rows, key=lambda t: tuple(
        (x is None, x or 0 if not isinstance(x, str) else x) for x in t
    ))


def _dtype_kinds(pdf: pd.DataFrame) -> dict[str, str]:
    """Column → coarse dtype kind, with all-NULL float columns treated as
    'nullable' wildcards (a column of only NULLs is float64(NaN) on one
    engine and object(None) on the other — no value information to hash
    differently)."""
    kinds = {}
    for c in sorted(pdf.columns):
        k = pdf[c].dtype.kind
        if k in ("i", "u"):
            k = "i"
        if pdf[c].isna().all():
            k = "null"
        kinds[c] = k
    return kinds


QUERY_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    spark_pdf = qfn(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(entry_mod.oracle_sql()[name]).df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {list(spark_pdf.columns)} vs "
        f"{list(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    sk, dk = _dtype_kinds(spark_pdf), _dtype_kinds(duck_pdf)
    dtype_mismatch = {
        c: (sk[c], dk[c]) for c in sk
        if sk[c] != dk[c] and "null" not in (sk[c], dk[c])
    }
    assert not dtype_mismatch, (
        f"{name}: pandas dtype-kind mismatch (spark, oracle): "
        f"{dtype_mismatch} — an integer-aliased oracle column arriving as "
        f"float/object (e.g. uncast DuckDB HUGEINT SUM) fails the driver "
        f"hash even when values match; CAST the oracle output to BIGINT"
    )
    sc, dc = _canon(spark_pdf), _canon(duck_pdf)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
