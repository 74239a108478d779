"""The reference's three streaming entry points, reassembled (SURVEY.md §2.5).

Each builder takes already-loaded raw stream frames (from
sources.kafka.read_kafka_stream in production, or any file/memory stream
in tests — the transforms don't care), mirroring:

* ``customers_stream``  — sparkpyrediskafkastreamtoconsole.py (Q-customers)
* ``risk_stream``       — sparkpyeventskafkastreamtoconsole.py (Q-risk)
* ``customer_risk_stream`` — sparkpykafkajoin.py (Q-join → output contract)

The reference's join is windowless (unbounded state, sparkpykafkajoin.py:246-250);
``mode="watermarked"`` bounds state for production use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import joins, pipeline


def customers_stream(raw: DataFrame, *, explode: bool = False) -> DataFrame:
    """Q-customers: raw Kafka frame → decoded customer profiles."""
    casted = pipeline.cast_kafka_value_to_string(raw)
    return pipeline.customers_from_redis_stream(casted, explode=explode)


def risk_stream(raw: DataFrame) -> DataFrame:
    """Q-risk: raw Kafka frame → parsed risk events."""
    return pipeline.parse_risk_events(pipeline.cast_kafka_value_to_string(raw))


def customer_risk_stream(
    raw_redis: DataFrame,
    raw_events: DataFrame,
    *,
    mode: str = "unbounded",
    as_kafka_payload: bool = True,
) -> DataFrame:
    """Q-join: both feeds → inner join → ``customer-risk`` contract.

    With ``as_kafka_payload`` the result is (key, value) JSON rows ready
    for sources.kafka.write_kafka_stream, exactly like
    sparkpykafkajoin.py:274-294.
    """
    customers = customers_stream(raw_redis)
    risk = risk_stream(raw_events)
    joined = joins.join_risk_with_customers(risk, customers, mode=mode)
    return joins.format_customer_risk(joined) if as_kafka_payload else joined
