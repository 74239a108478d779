"""Deterministic synthesis of reference-shaped Kafka payloads from testdata.

The reference's inputs are Kafka topics (SURVEY.md §1.1); the driver's
correctness gate runs on Parquet tables.  Bridge: deterministically encode
the ``customer`` / ``events`` tables into the exact wire envelopes the
reference consumes (FIXTURES.md §3) — base64-inside-JSON for the Redis CDC
feed, plain JSON for the risk feed — then run the real decode chain over
them.  The DuckDB oracle computes the *final* columns directly, so any
encode/decode asymmetry shows up as a hash mismatch.

All synthesis is pure Column expressions → the encode is a narrow map
stage that scales with input splits, and both the encode and decode stay
in whole-stage codegen.

Derivation rules (mirrored 1:1 in the oracle SQL in plans/registry.py):
  email     = 'user' || c_custkey || '@test.com'       (join key; matches
              events' 'user' || user_id || '@test.com')
  phone     = lpad(c_custkey, 10, '0')
  birthDay  = (1940 + key%60) '-' lpad(1+key%12) '-' lpad(1+key%28)
  riskDate  = ts formatted yyyy-MM-dd'T'HH:mm:ss'Z' (second precision —
              truncation semantics agree between Spark and DuckDB)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table


def _email(key: Column) -> Column:
    return F.concat(F.lit("user"), key.cast("string"), F.lit("@test.com"))


def _birth_day(key: Column) -> Column:
    return F.concat_ws(
        "-",
        (F.lit(1940) + key % 60).cast("string"),
        F.lpad((F.lit(1) + key % 12).cast("string"), 2, "0"),
        F.lpad((F.lit(1) + key % 28).cast("string"), 2, "0"),
    )


def customer_struct(key: Column, name: Column) -> Column:
    """The decoded customer record (schemas.CUSTOMER) as a struct column."""
    return F.struct(
        name.alias("customerName"),
        _email(key).alias("email"),
        F.lpad(key.cast("string"), 10, "0").alias("phone"),
        _birth_day(key).alias("birthDay"),
    )


def redis_envelope_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer table → one Redis CDC envelope per row (single col ``value``).

    Shape matches the golden payload at
    /root/reference/project/starter/README.md:55-56 (sans the redundant
    lower-cased twin, which the declared schema ignores anyway).
    """
    # Re-split: the single-file table gives one input split, which would
    # run the whole encode→decode chain on one core (in production the
    # Kafka topic's partitions provide this parallelism).
    c = load_table(spark, sf_dir, "customer").repartition(
        spark.sparkContext.defaultParallelism
    )
    cust = customer_struct(F.col("c_custkey"), F.col("c_name"))
    envelope = F.to_json(
        F.struct(
            F.base64(F.lit("Customer").cast("binary")).alias("key"),
            F.lit("NONE").alias("existType"),
            F.lit(False).alias("Ch"),
            F.lit(False).alias("Incr"),
            F.array(
                F.struct(
                    F.base64(F.to_json(cust).cast("binary")).alias("element"),
                    F.lit("0").alias("score"),
                )
            ).alias("zSetEntries"),
        )
    )
    return c.select(envelope.alias("value"))


def stedi_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table → one stedi-events JSON payload per row (col ``value``).

    Shape matches /root/reference/project/starter/README.md:98-103.
    """
    e = load_table(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    payload = F.to_json(
        F.struct(
            _email(F.col("user_id")).alias("customer"),
            F.col("value").alias("score"),
            # Render the instant's UTC wall clock SESSION-TZ-INDEPENDENTLY
            # (cast→NTZ gives the session-zone wall clock; convert_timezone
            # maps it to UTC's) — a bare date_format would shift the string
            # under any non-UTC driver and break the DuckDB strftime oracle.
            F.date_format(
                F.expr(
                    "convert_timezone(current_timezone(), 'UTC',"
                    " CAST(ts AS TIMESTAMP_NTZ))"
                ),
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
            ).alias("riskDate"),
        )
    )
    return e.select(payload.alias("value"))


# DuckDB SQL fragments computing the same derivations directly (no
# encode/decode round-trip) — composed into full oracles in registry.py.
SQL_EMAIL_FROM_CUSTKEY = "'user' || CAST(c_custkey AS VARCHAR) || '@test.com'"
SQL_EMAIL_FROM_USERID = "'user' || CAST(user_id AS VARCHAR) || '@test.com'"
SQL_BIRTH_YEAR = "CAST(1940 + (c_custkey % 60) AS VARCHAR)"
SQL_BIRTH_DAY = (
    "CAST(1940 + (c_custkey % 60) AS VARCHAR) || '-' || "
    "lpad(CAST(1 + (c_custkey % 12) AS VARCHAR), 2, '0') || '-' || "
    "lpad(CAST(1 + (c_custkey % 28) AS VARCHAR), 2, '0')"
)
SQL_PHONE = "lpad(CAST(c_custkey AS VARCHAR), 10, '0')"
SQL_RISK_DATE = "strftime(ts, '%Y-%m-%dT%H:%M:%SZ')"


def pii_enriched_documents(docs: DataFrame) -> DataFrame:
    """Deterministically inject synthetic PII into the documents corpus.

    The driver's documents table is clean word-soup, so exercising the
    PII scrubber needs a corpus that actually contains PII.  Same
    golden-payload philosophy as :func:`redis_envelope_raw`: derive the
    injected strings purely from ``doc_id`` so the SQL oracle
    (``SQL_PII_TEXT``) reconstructs the identical corpus and the scrub
    must detect/redact EXACTLY the planted items.  Moduli are coprime-ish
    (7/11/13/17) so documents carry 0–4 PII kinds in mixed combinations.
    """
    d = F.col("doc_id")
    email = F.when(
        d % 7 == 0,
        F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 11 == 0,
        F.format_string(
            " call 555-%03d-%04d",
            (d % 1000).cast("int"),
            (d % 10000).cast("int"),
        ),
    ).otherwise(F.lit(""))
    ssn = F.when(
        d % 13 == 0,
        F.format_string(
            " ref %03d-%02d-%04d",
            (d % 900).cast("int"),
            (d % 90).cast("int"),
            (d % 9000).cast("int"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 17 == 0,
        F.concat(
            F.lit(" host 10.0."),
            (d % 256).cast("string"),
            F.lit("."),
            (d % 250).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.withColumn("text", F.concat(F.col("text"), email, phone, ssn, ip))


SQL_PII_TEXT = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' contact user'"
    " || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN"
    " printf(' call 555-%03d-%04d', doc_id % 1000, doc_id % 10000)"
    " ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN"
    " printf(' ref %03d-%02d-%04d', doc_id % 900, doc_id % 90, doc_id % 9000)"
    " ELSE '' END"
    " || CASE WHEN doc_id % 17 = 0 THEN ' host 10.0.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR)"
    " ELSE '' END"
)
