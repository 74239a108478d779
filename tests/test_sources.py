"""File-source behaviors: bucketed co-located joins (the pay-the-shuffle-
once primitive for repeatedly-joined 100 TB facts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stedi_human_balance_redis_kafka_spark_streaming_spark.sources import files


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-join planning so the test proves bucketing (not a
    broadcast) removed the Exchanges."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, tmp_path, no_broadcast):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    files.write_bucketed(
        left, "bkt_left", "k", 4, sort_col="k", path=str(tmp_path / "l")
    )
    files.write_bucketed(
        right, "bkt_right", "k", 4, sort_col="k", path=str(tmp_path / "r")
    )
    try:
        l, r = spark.table("bkt_left"), spark.table("bkt_right")
        joined = l.join(r, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # same bucket count + join on the bucket column → both sides read
        # pre-partitioned, no shuffle on either side
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
        got = {r.k: (r.a, r.b) for r in joined.collect()}
        assert got[7] == (14, 21)

        # a groupBy on the bucket key also rides the bucketing — the
        # partial/final agg needs no Exchange either
        agg = l.groupBy("k").agg(F.sum("a").alias("s"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan, agg_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_unbucketed_join_does_shuffle(spark, no_broadcast):
    # control: the same join without bucketing pays two Exchanges
    left = spark.range(0, 1000).select(F.col("id").alias("k"))
    right = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = (
        left.join(right, "k")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in plan
