"""Driver check-window invariants (plans/registry.py).

The round driver verifies only the first ``DRIVER_CHECK_WINDOW`` entries
of ``queries()`` in registration order — round-2 lesson: 6 queries
silently fell out of the correctness report because registration order
was an accident of import order.  These tests make the window an
enforced, documented decision.
"""

from __future__ import annotations

from stedi_human_balance_redis_kafka_spark_streaming_spark.plans import registry

NAMES = list(registry.queries())
WINDOW = NAMES[: registry.DRIVER_CHECK_WINDOW]
TAIL = NAMES[registry.DRIVER_CHECK_WINDOW:]

# Queries the engine claims as SURVEY.md §2 coverage — they must never
# drift out of the driver-checked window.
MANDATED = (
    "stedi_customers_decode_sql",     # P10 + the P1-P8 chain in SQL form
    "stedi_customers_decode_exploded",  # P4 lossless explode variant
    "stedi_risk_events",              # Q-risk parse chain
    "stedi_customer_risk_join",       # J1 + P9 output contract
    "stedi_risk_gate",                # A1
    "stedi_risk_by_birth_year",       # A2
)


def test_every_query_has_an_oracle():
    assert set(registry.oracle_sql()) == set(registry.queries())


def test_window_holds_every_primary_query():
    # the tail is exactly the declared supplementary + extended sets —
    # nothing else may silently fall out of the checked window
    assert set(TAIL) == set(registry.SUPPLEMENTARY_QUERIES) | set(
        registry.EXTENDED_QUERIES
    )
    assert len(WINDOW) <= registry.DRIVER_CHECK_WINDOW


def test_mandated_queries_in_window():
    for name in MANDATED:
        assert name in WINDOW, f"{name} fell out of the driver check window"


def test_supplementary_counterparts_are_checked():
    # every demoted dual's coverage carrier must itself sit in-window
    for demoted, carrier in registry.SUPPLEMENTARY_QUERIES.items():
        assert demoted in registry.queries()
        assert carrier in WINDOW, (
            f"{demoted} is demoted behind {carrier}, which is not in the "
            f"checked window"
        )
