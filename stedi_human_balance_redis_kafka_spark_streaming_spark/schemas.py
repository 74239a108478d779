"""Explicit StructType schemas for every payload the engine touches.

All schemas are declared (never inferred), mirroring the reference's
explicit declarations:

* ``REDIS_ENVELOPE`` — reference ``project/starter/sparkpykafkajoin.py:7-25``
  (identical at ``sparkpyrediskafkastreamtoconsole.py:7-25``): the Kafka
  Connect Redis Source change-capture record.  The raw payload carries a
  redundant lower-cased ``zsetEntries`` twin (``sparkpykafkajoin.py:104``);
  only the camel-cased field is declared, so the twin is dropped at parse.
* ``CUSTOMER`` — ``sparkpykafkajoin.py:32-37``: the base64-decoded content
  of ``zSetEntries[*].element``.
* ``STEDI_EVENT`` — ``sparkpykafkajoin.py:43-47``: a fall-risk assessment
  event.  ``score`` is DOUBLE; the reference's console variant declares it
  STRING (``sparkpyrediskafkastreamtoconsole.py:42``) which SURVEY.md §1.2
  resolves in favor of DOUBLE.
* ``CUSTOMER_RISK`` — ``sparkpykafkajoin.py:274-284``: the output contract;
  ``score`` and ``birthYear`` are strings *in the output JSON* even though
  they are double / year-int upstream.
"""

from __future__ import annotations

from pyspark.sql import types as T

ZSET_ENTRY = T.StructType(
    [
        T.StructField("element", T.StringType()),  # base64-encoded customer JSON
        T.StructField("score", T.StringType()),
    ]
)

REDIS_ENVELOPE = T.StructType(
    [
        T.StructField("key", T.StringType()),  # base64 of the Redis key
        T.StructField("value", T.StringType()),
        T.StructField("expiredType", T.StringType()),
        T.StructField("expiredValue", T.StringType()),
        T.StructField("existType", T.StringType()),
        T.StructField("Ch", T.BooleanType()),
        T.StructField("Incr", T.BooleanType()),
        T.StructField("zSetEntries", T.ArrayType(ZSET_ENTRY)),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("customerName", T.StringType()),
        T.StructField("email", T.StringType()),  # join key
        T.StructField("phone", T.StringType()),
        T.StructField("birthDay", T.StringType()),  # ISO date kept as string
    ]
)

STEDI_EVENT = T.StructType(
    [
        T.StructField("customer", T.StringType()),  # email — join key
        T.StructField("score", T.DoubleType()),  # may be negative
        T.StructField("riskDate", T.StringType()),  # ISO-8601 timestamp string
    ]
)

CUSTOMER_RISK = T.StructType(
    [
        T.StructField("customer", T.StringType()),
        T.StructField("score", T.StringType()),  # double cast to string at the edge
        T.StructField("email", T.StringType()),
        T.StructField("birthYear", T.StringType()),
    ]
)

# Driver-provided batch tables (/root/testdata, TESTDATA.md) — declared here so
# batch sources never rely on inference either.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON payload
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)
