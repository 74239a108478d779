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


def test_jsonl_roundtrip_preserves_rows_and_schema(spark, tmp_path):
    from stedi_human_balance_redis_kafka_spark_streaming_spark.sources.files import (
        read_jsonl,
        write_jsonl,
    )

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, 'quote " and \\ backslash', "de")],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "corpus_jsonl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema="doc_id long, text string, lang string")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    assert dict(back.dtypes) == dict(df.dtypes)


def test_jsonl_partitioned_write_prunes(spark, tmp_path):
    from stedi_human_balance_redis_kafka_spark_streaming_spark.sources.files import (
        read_jsonl,
        write_jsonl,
    )
    import os

    df = spark.createDataFrame(
        [(i, f"doc {i}", "en" if i % 2 else "de") for i in range(10)],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "part_jsonl")
    write_jsonl(df, path, partition_by=("lang",))
    assert sorted(
        d for d in os.listdir(path) if d.startswith("lang=")
    ) == ["lang=de", "lang=en"]
    back = read_jsonl(spark, path, schema="doc_id long, text string, lang string")
    assert back.filter("lang = 'en'").count() == 5


def test_curated_write_enables_partition_pruning(spark, tmp_path):
    """The hive-partitioned curated layout must let Catalyst prune
    partitions: a lang filter appears as a PartitionFilter on the scan
    (zero data files of other partitions read), not a post-scan
    Filter."""
    from stedi_human_balance_redis_kafka_spark_streaming_spark.sources.files import (
        write_curated,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}", "en" if i % 2 else "de") for i in range(20)],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "curated_prune")
    write_curated(df, out)
    back = spark.read.parquet(out).filter("lang = 'en'")
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = back._jdf.queryExecution().explainString(mode)
    pf = plan.split("PartitionFilters:", 1)
    assert len(pf) == 2, plan
    assert "lang" in pf[1].splitlines()[0]
    assert back.count() == 10


def test_zorder_key_interleaves_bits_exactly(spark):
    from stedi_human_balance_redis_kafka_spark_streaming_spark.functions.zorder import (
        zorder_key,
    )
    import pyspark.sql.functions as F

    # x=0b10, y=0b11 at 2 bits: positions (b*k + i) → x0@0, y0@1, x1@2,
    # y1@3 → key 0b1110 = 14
    df = spark.createDataFrame([(2, 3)], "x long, y long")
    [row] = df.select(zorder_key(["x", "y"], bits=2).alias("z")).collect()
    assert row["z"] == 14
    # out-of-range high bits are masked, not smeared into neighbors
    df2 = spark.createDataFrame([(6, 3)], "x long, y long")  # 6 = 0b110
    [row2] = df2.select(zorder_key(["x", "y"], bits=2).alias("z")).collect()
    assert row2["z"] == 14  # x's bit 2 dropped → same key as x=2


def test_zorder_quadrants_form_contiguous_key_ranges(spark):
    from stedi_human_balance_redis_kafka_spark_streaming_spark.functions.zorder import (
        zorder_key,
    )

    # 4×4 grid at 2 bits: Morton order visits each 2×2 quadrant as one
    # contiguous key range — the property that makes min/max stats
    # selective for BOTH dimensions.
    pts = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select(
        "x", "y", zorder_key(["x", "y"], bits=2).alias("z")
    ).collect()
    keys = sorted(set(r["z"] for r in rows))
    assert keys == list(range(16))  # bijective on the grid
    quad = {
        (r["x"] // 2, r["y"] // 2): [] for r in rows
    }
    for r in rows:
        quad[(r["x"] // 2, r["y"] // 2)].append(r["z"])
    for ks in quad.values():
        ks.sort()
        assert ks == list(range(ks[0], ks[0] + 4))  # contiguous range


def test_write_zordered_roundtrip(spark, tmp_path):
    from stedi_human_balance_redis_kafka_spark_streaming_spark.functions.zorder import (
        write_zordered,
    )

    df = spark.createDataFrame(
        [(i % 7, (i * 3) % 11, i) for i in range(100)],
        "a long, b long, payload long",
    )
    out = str(tmp_path / "zordered")
    write_zordered(df, out, ["a", "b"], bits=4)
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert sorted(back.columns) == ["a", "b", "payload"]  # helper dropped
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
