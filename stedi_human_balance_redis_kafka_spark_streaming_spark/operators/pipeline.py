"""The reference decode chain, re-expressed as composable transforms.

Covers SURVEY.md §2.2 operators P1-P10 — the chain that unwinds the
triple encoding (base64 inside JSON inside Kafka bytes) of the Redis
change-capture feed, and the risk-event parse:

  Kafka bytes → CAST(value AS STRING)                 (P1)
  → from_json(envelope)                               (P2)
  → zSetEntries[0].element / explode variant          (P4)
  → unbase64 → utf8                                   (P5)
  → from_json(customer)                               (P2)
  → null filters                                      (P6)
  → split(birthDay,'-')[0] AS birthYear               (P7)

Reference parity citations (paths under /root/reference/project/starter/):
  P1 sparkpykafkajoin.py:79-81; P2 :115-126; P4 :133-138; P5 :156-158;
  P6 :137,:171-178,:240; P7 :184-187; P9 :274-284.

Everything here is built-in Column expressions — whole-stage-codegen'd
JVM-side, zero Python row crossings (SURVEY.md §3) — so each transform is
a narrow, shuffle-free map stage that scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import CUSTOMER, REDIS_ENVELOPE, STEDI_EVENT


def cast_kafka_value_to_string(df: DataFrame) -> DataFrame:
    """P1: keep only the Kafka ``value`` payload, cast binary→utf8.

    Dropping the topic/partition/offset metadata columns here lets
    Catalyst prune them out of the source scan.
    """
    return df.selectExpr("CAST(value AS STRING) AS value")


def parse_redis_envelope(df: DataFrame, value_col: str = "value") -> DataFrame:
    """P2: decode the Kafka Connect Redis Source change envelope.

    The redundant lower-cased ``zsetEntries`` twin in the raw payload is
    ignored because it is absent from the declared schema (the reference
    makes the same choice — sparkpykafkajoin.py:104 comment).
    """
    return df.select(
        F.from_json(F.col(value_col), REDIS_ENVELOPE).alias("envelope")
    ).select("envelope.*")


def extract_first_zset_element(df: DataFrame) -> DataFrame:
    """P4, reference-faithful: keep only ``zSetEntries[0].element``.

    ⚠ Drops entries 1..n of multi-entry envelopes, exactly like
    sparkpykafkajoin.py:133-138.  Use :func:`explode_zset_elements` when
    losing them is not acceptable.
    The NOT NULL guard is the P6 filter at sparkpykafkajoin.py:137 (skips
    non-zset Redis events such as string SETs from other apps).

    Uses ``get`` (NULL on out-of-bounds) rather than ``arr[0]``: the
    reference ran pre-ANSI Spark 3 where ``arr[0]`` of an empty array was
    NULL; under Spark 4's default ANSI mode it throws, so ``get`` is the
    semantics-preserving translation.
    """
    return df.filter(F.col("zSetEntries").isNotNull()).select(
        F.get(F.col("zSetEntries"), 0).getField("element").alias("encodedCustomer")
    )


def explode_zset_elements(df: DataFrame) -> DataFrame:
    """P4, lossless engine variant: one output row per zset entry.

    ``explode`` (not ``explode_outer``) also subsumes the NOT NULL guard:
    null/empty arrays simply emit no rows.
    """
    return df.select(F.explode("zSetEntries").alias("entry")).select(
        F.col("entry.element").alias("encodedCustomer")
    )


def decode_base64_json(df: DataFrame, col: str = "encodedCustomer") -> DataFrame:
    """P5: unwind the base64 layer — binary→utf8 JSON string.

    Mirrors sparkpykafkajoin.py:156-158 (``unbase64(...).cast("string")``),
    but via ``try_to_binary(.., 'base64')``: Spark 4's ANSI-mode
    ``unbase64`` throws on malformed input, whereas the reference's Spark 3
    decoded leniently; NULL-on-invalid (then filtered by P6) is the
    closest safe semantics for a stream that carries foreign payloads.
    """
    return df.select(
        F.try_to_binary(F.col(col), F.lit("base64")).cast("string").alias("customerJson")
    )


def parse_customer(df: DataFrame, col: str = "customerJson") -> DataFrame:
    """P2/P3: decode the customer record and flatten to columns."""
    return df.select(F.from_json(F.col(col), CUSTOMER).alias("c")).select("c.*")


def filter_valid_customers(df: DataFrame) -> DataFrame:
    """P6: drop rows where ``from_json`` matched a different payload shape.

    Mirrors the WHERE at sparkpykafkajoin.py:171-178 (comment at :169 —
    other Redis writes decode to all-null customers).
    """
    return df.filter(F.col("email").isNotNull() & F.col("birthDay").isNotNull())


def derive_birth_year(df: DataFrame) -> DataFrame:
    """P7: ``split(birthDay,'-')[0] AS birthYear`` (string-typed year).

    Faithful to sparkpykafkajoin.py:184-187; the ISO date stays a string
    end-to-end in the reference, so no to_date round-trip is forced here.
    """
    return df.withColumn("birthYear", F.split(F.col("birthDay"), "-").getItem(0))


def customers_from_redis_stream(
    df: DataFrame, *, value_col: str = "value", explode: bool = False
) -> DataFrame:
    """Full Q-customers chain (SURVEY.md §2.5.1) over a raw Kafka frame.

    Output columns: customerName, email, phone, birthDay, birthYear.
    Set ``explode=True`` for the lossless multi-entry variant.
    """
    env = parse_redis_envelope(df, value_col=value_col)
    extracted = explode_zset_elements(env) if explode else extract_first_zset_element(env)
    return derive_birth_year(
        filter_valid_customers(parse_customer(decode_base64_json(extracted)))
    )


def parse_risk_events(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Full Q-risk chain (SURVEY.md §2.5.2): parse + null-filter risk events.

    Mirrors sparkpyeventskafkastreamtoconsole.py:34-70; output columns
    customer (email), score (double), riskDate (ISO string).
    """
    return (
        df.select(F.from_json(F.col(value_col), STEDI_EVENT).alias("e"))
        .select("e.*")
        .filter(F.col("customer").isNotNull())
    )
