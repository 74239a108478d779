"""Batch file sources over the driver-provided Parquet tables.

Parquet is the engine's batch substrate: columnar, predicate-pushdown- and
column-pruning-friendly (verify via ``df.explain`` → ``PushedFilters`` /
``ReadSchema``).  Loaders never infer schemas for the streaming-payload
tables; TPC-H-ish tables come straight from the files' own footers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (TESTDATA.md) as a DataFrame."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so SQL-form operators work."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
