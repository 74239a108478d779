"""Kafka source/sink wrappers (SURVEY.md §2.1 S1-S5), parameterized.

The reference hard-codes ``localhost:9092`` / topic names / earliest
offsets (sparkpykafkajoin.py:66-73, :193-200, :286-294).  The engine
exposes the same capability with the knobs the reference leaves implicit:
``maxOffsetsPerTrigger`` (backpressure at scale), ``failOnDataLoss``,
``startingOffsets``, and checkpointing.

These builders only *declare* plans; nothing here talks to a broker at
import time, so the module is safely importable in broker-less test
environments (streaming tests stand in file/rate/memory sources per
SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def read_kafka_stream(
    spark: SparkSession,
    topic: str,
    *,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> DataFrame:
    """S1/S2: subscribe to a topic (reference: sparkpykafkajoin.py:66-73)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def write_kafka_stream(
    df: DataFrame,
    topic: str,
    *,
    bootstrap_servers: str = "localhost:9092",
    checkpoint_location: str,
    output_mode: str = "append",
    trigger_interval: str | None = None,
) -> StreamingQuery:
    """S4: publish (key, value) rows to a topic with a checkpoint.

    Reference: sparkpykafkajoin.py:286-294 (topic ``customer-risk``).
    ``df`` must expose string/binary ``key`` and ``value`` columns
    (see operators.joins.format_customer_risk).
    """
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .outputMode(output_mode)
    )
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def write_console_stream(
    df: DataFrame, *, output_mode: str = "append", truncate: bool = False
) -> StreamingQuery:
    """S3: debug console sink (reference: sparkpyrediskafkastreamtoconsole.py:203-209)."""
    return (
        df.writeStream.outputMode(output_mode)
        .format("console")
        .option("truncate", str(truncate).lower())
        .start()
    )
