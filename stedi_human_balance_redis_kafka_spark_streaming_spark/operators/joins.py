"""J1 — the customer⨝risk join and its output contract.

Reference parity: sparkpykafkajoin.py:246-257 (join + projection) and
:274-284 (JSON output contract).  SURVEY.md §2.3 mandates two modes:

* ``unbounded`` — reference-faithful "windowless" stream-stream inner
  equi-join: no watermark, both sides' state retained forever.  Correct
  but unusable at scale (state = #customers × time).
* ``watermarked`` — production mode: watermarks on both sides plus an
  event-time range condition so Spark can evict state.  Late pairs beyond
  the watermark are dropped — the documented semantic difference.

Scale notes: the join key (customer email) is high-cardinality and
uniform, so the shuffle hash-partitions evenly; in batch mode Catalyst
is free to broadcast the smaller side (profiles are typically ≪ events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_risk_with_customers(
    risk: DataFrame,
    customers: DataFrame,
    *,
    mode: str = "unbounded",
    watermark_delay: str = "1 hour",
    risk_time_col: str = "riskTime",
    customer_time_col: str = "customerTime",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Inner equi-join risk events to customer profiles on customer == email.

    ``risk`` carries (customer, score, riskDate, …); ``customers`` carries
    (customerName, email, phone, birthDay, birthYear, …).  Returns the
    4-column projection of sparkpykafkajoin.py:252-257:
    (customer, score, email, birthYear).

    ``watermarked`` mode requires TimestampType columns ``risk_time_col``
    / ``customer_time_col`` on the respective sides and bounds state with
    ``withWatermark`` + a time-range join condition.

    ``extra_cols`` appends pass-through columns to the 4-column contract —
    e.g. ``("riskTime",)`` so a downstream windowed aggregation (A2) can
    keep the event-time column across the join.
    """
    if mode == "unbounded":
        cond = risk["customer"] == customers["email"]
        joined = risk.join(customers, cond, "inner")
    elif mode in ("watermarked", "left_outer"):
        # left_outer: same watermarks + time-range condition (mandatory
        # for streaming outer joins — Spark needs the range to know when
        # an unmatched left row can never match and must be emitted
        # null-padded).  A risk event with no profile surfaces once the
        # watermark passes the end of its match window, instead of
        # silently vanishing — the production observability variant
        # (catch events arriving for unknown/deleted customers).
        r = risk.withWatermark(risk_time_col, watermark_delay)
        c = customers.withWatermark(customer_time_col, watermark_delay)
        cond = (
            (r["customer"] == c["email"])
            & (r[risk_time_col] >= c[customer_time_col])
            & (
                r[risk_time_col]
                <= c[customer_time_col] + F.expr(f"INTERVAL {watermark_delay}")
            )
        )
        joined = r.join(c, cond, "inner" if mode == "watermarked" else "leftOuter")
    else:
        raise ValueError(f"unknown join mode: {mode!r}")
    return joined.select("customer", "score", "email", "birthYear", *extra_cols)


def format_customer_risk(df: DataFrame) -> DataFrame:
    """P9: serialize to the ``customer-risk`` output contract.

    Key = customer email, value = JSON with **string-typed** score and
    birthYear (sparkpykafkajoin.py:274-284; examples README.md:70-75).
    Returns (key, value) ready for a Kafka sink.
    """
    return df.select(
        F.col("customer").cast("string").alias("key"),
        F.to_json(
            F.struct(
                F.col("customer"),
                F.col("score").cast("string").alias("score"),
                F.col("email"),
                F.col("birthYear").cast("string").alias("birthYear"),
            )
        ).alias("value"),
    )
