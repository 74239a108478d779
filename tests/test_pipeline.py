"""Unit tests for the decode chain, driven by the reference's golden payload.

The golden envelope is the documented Redis→Kafka round-trip at
/root/reference/project/starter/README.md:48-92 — the only test vector the
reference ships (SURVEY.md §5).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stedi_human_balance_redis_kafka_spark_streaming_spark.operators import joins, pipeline

# Verbatim from project/starter/README.md:55-56 (zadd Customer → redis-server
# topic payload), including the redundant lower-cased `zsetEntries` twin.
GOLDEN_ENVELOPE = (
    '{"key":"Q3VzdG9tZXI=","existType":"NONE","ch":false,"incr":false,'
    '"zSetEntries":[{"element":"eyJjdXN0b21lck5hbWUiOiJTYW0gVGVzdCIsImVtYWlsIjoic2FtLnRlc3RAdGVzdC5jb20iLCJwaG9uZSI6IjgwMTU1NTEyMTIiLCJiaXJ0aERheSI6IjIwMDEtMDEtMDMifQ==","score":0.0}],'
    '"zsetEntries":[{"element":"eyJjdXN0b21lck5hbWUiOiJTYW0gVGVzdCIsImVtYWlsIjoic2FtLnRlc3RAdGVzdC5jb20iLCJwaG9uZSI6IjgwMTU1NTEyMTIiLCJiaXJ0aERheSI6IjIwMDEtMDEtMDMifQ==","score":0.0}]}'
)

# Variant v1 (FIXTURES.md §1.1): non-zset Redis event — must be filtered.
NON_ZSET_ENVELOPE = '{"key":"c29tZXRoaW5n","value":"eyJmb28iOjF9","existType":"NONE","ch":false,"incr":false}'

# Variant v3: zset entry whose element decodes to non-customer JSON — the
# customer parse yields nulls and the P6 filter drops it.
#   base64('{"foo": 1}') == 'eyJmb28iOiAxfQ=='
OTHER_ZSET_ENVELOPE = (
    '{"key":"T3RoZXI=","existType":"NONE","ch":false,"incr":false,'
    '"zSetEntries":[{"element":"eyJmb28iOiAxfQ==","score":0.0}]}'
)


@pytest.fixture(scope="module")
def raw(spark):
    rows = [(GOLDEN_ENVELOPE,), (NON_ZSET_ENVELOPE,), (OTHER_ZSET_ENVELOPE,)]
    return spark.createDataFrame(rows, "value string")


def test_golden_decode_chain(raw):
    out = pipeline.customers_from_redis_stream(raw).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert row == {
        "customerName": "Sam Test",
        "email": "sam.test@test.com",
        "phone": "8015551212",
        "birthDay": "2001-01-03",
        "birthYear": "2001",
    }


def test_envelope_parse_keeps_declared_fields(raw):
    env = pipeline.parse_redis_envelope(raw)
    assert set(env.columns) == {
        "key", "value", "expiredType", "expiredValue", "existType", "Ch", "Incr", "zSetEntries",
    }
    golden = env.filter(F.col("key") == "Q3VzdG9tZXI=").collect()[0]
    assert golden.zSetEntries[0].element.startswith("eyJjdXN0b21lck5hbWUi")


def test_multi_entry_envelope_faithful_vs_explode(spark):
    import base64
    import json

    def enc(name, email):
        payload = json.dumps(
            {"customerName": name, "email": email, "phone": "1", "birthDay": "1990-05-01"}
        )
        return base64.b64encode(payload.encode()).decode()

    multi = json.dumps(
        {
            "key": "Q3VzdG9tZXI=",
            "existType": "NONE",
            "ch": False,
            "incr": False,
            "zSetEntries": [
                {"element": enc("A", "a@test.com"), "score": "0"},
                {"element": enc("B", "b@test.com"), "score": "0"},
            ],
        }
    )
    df = spark.createDataFrame([(multi,)], "value string")
    faithful = pipeline.customers_from_redis_stream(df)
    assert [r.email for r in faithful.collect()] == ["a@test.com"]
    lossless = pipeline.customers_from_redis_stream(df, explode=True)
    assert sorted(r.email for r in lossless.collect()) == ["a@test.com", "b@test.com"]


def test_parse_risk_events(spark):
    # Payload shape from project/starter/README.md:98-103.
    rows = [
        ('{"customer":"Jason.Mitra@test.com","score":7.0,"riskDate":"2020-09-14T07:54:06.417Z"}',),
        ('{"customer":"neg@test.com","score":-1.4,"riskDate":"2020-09-14T08:00:00.000Z"}',),
        ('{"other":"shape"}',),  # customer null → filtered
    ]
    df = spark.createDataFrame(rows, "value string")
    out = pipeline.parse_risk_events(df).collect()
    assert len(out) == 2
    assert out[0].asDict() == {
        "customer": "Jason.Mitra@test.com",
        "score": 7.0,
        "riskDate": "2020-09-14T07:54:06.417Z",
    }
    assert out[1].score == -1.4


def test_join_and_output_contract(spark):
    customers = spark.createDataFrame(
        [("Sam Test", "sam.test@test.com", "8015551212", "2001-01-03", "2001")],
        "customerName string, email string, phone string, birthDay string, birthYear string",
    )
    risk = spark.createDataFrame(
        [
            ("sam.test@test.com", 7.0, "2020-09-14T07:54:06.417Z"),
            ("nobody@test.com", 1.0, "2020-09-14T07:54:06.417Z"),
        ],
        "customer string, score double, riskDate string",
    )
    joined = joins.join_risk_with_customers(risk, customers)
    assert joined.columns == ["customer", "score", "email", "birthYear"]
    rows = joined.collect()
    assert len(rows) == 1  # inner join drops the unmatched event

    out = joins.format_customer_risk(joined).collect()[0]
    assert out.key == "sam.test@test.com"
    # Exact golden output from FIXTURES.md §1.4 / project/starter/README.md:159-165:
    # score and birthYear are STRINGS in the output JSON.
    import json

    assert json.loads(out.value) == {
        "customer": "sam.test@test.com",
        "score": "7.0",
        "email": "sam.test@test.com",
        "birthYear": "2001",
    }
