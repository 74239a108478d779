"""stedi_human_balance_redis_kafka_spark_streaming_spark — a PySpark-native analytics engine.

A brand-new, Spark-first reimplementation of the capabilities of the
reference pipeline (shilpamadini/stedi-human-balance-redis-kafka-spark-streaming):
Kafka-sourced Redis change-data-capture decoding, risk-event parsing, the
stream-stream customer⨝risk join with its exact output contract, plus the
scale-oriented extension operators a large training-data pipeline needs
(dedup, similarity search, text analysis, multimodal column plumbing).

Design stance (see SURVEY.md §7):
  * every operator is a pure ``DataFrame -> DataFrame`` transform, usable
    identically in batch (testable against a DuckDB oracle) and streaming
    (reference-faithful);
  * built-in ``pyspark.sql.functions`` column expressions only on hot
    paths — no row-at-a-time Python UDFs (SURVEY.md §3);
  * explicit ``StructType`` schemas, no inference (SURVEY.md §1.2).

Import alias convention: ``import stedi_human_balance_redis_kafka_spark_streaming_spark as stedi``.
"""

__version__ = "0.1.0"
