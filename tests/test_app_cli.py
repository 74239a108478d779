"""CLI arg-surface tests (no SparkSession started)."""

from __future__ import annotations

import pytest

from stedi_human_balance_redis_kafka_spark_streaming_spark.app import _parser


def test_kafkajoin_defaults():
    args = _parser().parse_args(["kafkajoin"])
    assert args.command == "kafkajoin"
    assert args.bootstrap == "localhost:9092"
    assert args.out_topic == "customer-risk"
    assert args.checkpoint == "/tmp/spark-checkpoints/kafkajoin"
    assert not args.watermarked


def test_console_commands_and_flags():
    args = _parser().parse_args(
        ["--bootstrap", "broker:9093", "--max-offsets-per-trigger", "5000",
         "redis-console"]
    )
    assert args.command == "redis-console"
    assert args.bootstrap == "broker:9093"
    assert args.max_offsets_per_trigger == 5000
    assert _parser().parse_args(["events-console"]).command == "events-console"


def test_unknown_command_rejected():
    with pytest.raises(SystemExit):
        _parser().parse_args(["nope"])
