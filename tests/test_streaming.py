"""Streaming integration tests: file source stands in for Kafka, memory
sink collects results (SURVEY.md §5 plan c) — every streaming query's
output is checked for equivalence against its batch dual on the same
finite input (append-mode inner join over a finite source converges to
the batch result).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from stedi_human_balance_redis_kafka_spark_streaming_spark.operators import joins, pipeline
from stedi_human_balance_redis_kafka_spark_streaming_spark.plans import synthetic
from stedi_human_balance_redis_kafka_spark_streaming_spark.streaming import (
    queries as sq,
    sinks,
    stateful,
)

SF = "/root/testdata/sf0.001"


def _run_to_memory(spark, sdf, name, output_mode="append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    """Materialize the synthesized wire payloads as parquet for readStream."""
    base = tmp_path_factory.mktemp("streams")
    redis_dir, events_dir = str(base / "redis"), str(base / "events")
    synthetic.redis_envelope_raw(spark, SF).write.parquet(redis_dir)
    synthetic.stedi_events_raw(spark, SF).write.parquet(events_dir)
    return redis_dir, events_dir


def _read_stream(spark, path):
    return spark.readStream.schema("value string").parquet(path)


def test_streaming_customers_matches_batch(spark, stream_dirs):
    redis_dir, _ = stream_dirs
    out = _run_to_memory(
        spark,
        sq.customers_stream(_read_stream(spark, redis_dir)),
        f"cust_{uuid.uuid4().hex[:8]}",
    )
    batch = pipeline.customers_from_redis_stream(
        spark.read.parquet(redis_dir)
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_join_matches_batch(spark, stream_dirs):
    redis_dir, events_dir = stream_dirs
    sdf = sq.customer_risk_stream(
        _read_stream(spark, redis_dir), _read_stream(spark, events_dir)
    )
    out = _run_to_memory(spark, sdf, f"join_{uuid.uuid4().hex[:8]}")
    assert out.columns == ["key", "value"]

    batch = joins.format_customer_risk(
        joins.join_risk_with_customers(
            pipeline.parse_risk_events(spark.read.parquet(events_dir)),
            pipeline.customers_from_redis_stream(spark.read.parquet(redis_dir)),
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_stateful_risk_gate(spark, stream_dirs):
    _, events_dir = stream_dirs
    risk = pipeline.parse_risk_events(_read_stream(spark, events_dir))
    out = _run_to_memory(
        spark,
        stateful.streaming_risk_gate_stateful(risk),
        f"gate_{uuid.uuid4().hex[:8]}",
        output_mode="update",
    )
    batch = stateful.streaming_risk_gate_agg(
        pipeline.parse_risk_events(spark.read.parquet(events_dir))
    ).select("customer", "n_assessments", "avg_score")
    # single micro-batch → the update-mode output IS the final state
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_dedup_within_watermark(spark, tmp_path):
    path = str(tmp_path / "dups")
    rows = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:05:00"),  # duplicate key within watermark
            (2, "2024-01-01 00:10:00"),
        ],
        "id long, ts_str string",
    ).withColumn("ts", F.col("ts_str").cast("timestamp"))
    rows.write.parquet(path)
    sdf = spark.readStream.schema("id long, ts_str string, ts timestamp").parquet(path)
    out = _run_to_memory(
        spark,
        stateful.dedup_within_watermark(sdf, ["id"], time_col="ts"),
        f"dedup_{uuid.uuid4().hex[:8]}",
    )
    assert sorted(r.id for r in out.select("id").collect()) == [1, 2]


def test_foreach_batch_sink_plumbing(spark, stream_dirs):
    redis_dir, _ = stream_dirs
    sdf = sq.customers_stream(_read_stream(spark, redis_dir))
    seen: list[int] = []
    q = sinks.foreach_batch_sink(
        sdf, lambda batch, epoch: seen.append(batch.count())
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(seen) == spark.read.parquet(redis_dir).count()


def test_windowed_risk_by_birth_year_streaming(spark, stream_dirs):
    _, events_dir = stream_dirs
    # single-stream form: birthYear surrogate derived from the event itself
    # (the operator under test is the watermarked windowed aggregation)
    risk = (
        sq.risk_stream(_read_stream(spark, events_dir))
        .withColumn("riskTime", F.to_timestamp("riskDate", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .withColumn("birthYear", F.substring("customer", 5, 1))
    )
    agg = stateful.windowed_risk_by_birth_year(risk)
    out = _run_to_memory(
        spark, agg, f"wndw_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    # append mode emits only windows the final watermark has passed —
    # a strict subset of the batch result, grouped identically
    assert out.count() > 0
    assert {"window", "birthYear", "n_scores", "avg_score"} == set(out.columns)

    batch = (
        spark.read.parquet(events_dir)
        .transform(pipeline.parse_risk_events)
        .withColumn("riskTime", F.to_timestamp("riskDate", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .withColumn("birthYear", F.substring("customer", 5, 1))
        .groupBy(F.window("riskTime", "1 hour"), "birthYear")
        .agg(F.count("*").alias("n_scores"), F.round(F.avg("score"), 4).alias("avg_score"))
    )
    got = {tuple(r) for r in out.collect()}
    expected = {tuple(r) for r in batch.collect()}
    assert got <= expected and len(got) > 0
