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


def test_never_hashed_pool_shrinks_by_construction():
    """Window-eviction regression guard (VERDICT r09 #7): the rotation
    policy must retire the never-driver-hashed backlog by construction,
    not by judge pressure.

    Two asserts, driven by committed artifacts (CORRECTNESS_r*.json =
    the first-hashed record; tests/data/registry_birth.json = the
    first-registered record, derived from git history):

    1. BACKLOG CAP: the count of never-hashed queries OUTSIDE the
       current window must not exceed max(0, 28 - 12*(round - 9)) —
       the r09 pool was 28, and each rotation must promote >= 12 until
       it is empty (r10 <= 16, r11 <= 4, r12 0).
    2. FRESHNESS: any query registered round 7 or later must sit in
       the driver window within 4 rounds of registration (the backlog
       exemption covers only the pre-r7 residue the cap is draining).
    """
    import glob
    import json
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    birth = json.load(open(os.path.join(here, "data", "registry_birth.json")))
    # Round inference reads GIT-TRACKED artifacts only (ADVICE r10): the
    # driver drops CORRECTNESS_r{N}.json mid-judging before committing
    # it, and counting untracked files flipped unrelated local runs red
    # one round early.  The ratchet advances when the round's artifact
    # is committed — the actual round boundary.  Fall back to the disk
    # glob outside a git checkout (e.g. an exported tree).
    try:
        tracked = subprocess.run(
            ["git", "-C", root, "ls-files", "CORRECTNESS_r*.json"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
        corr_files = sorted(
            os.path.join(root, f)
            for f in tracked
            if os.path.exists(os.path.join(root, f))
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        corr_files = sorted(
            glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        )
    current_round = len(corr_files) + 1
    hashed = set()
    for f in corr_files:
        hashed |= set(json.load(open(f)))

    assert set(birth) >= set(NAMES), (
        "new registrations must be added to tests/data/registry_birth.json "
        f"with their birth round: {sorted(set(NAMES) - set(birth))}"
    )
    never = [q for q in NAMES if q not in hashed and q not in WINDOW]
    cap = max(0, 28 - 12 * (current_round - 9))
    assert len(never) <= cap, (
        f"never-driver-hashed pool outside the window is {len(never)} > "
        f"cap {cap} for round {current_round}; promote more queries in "
        f"this round's rotation: {sorted(never)}"
    )
    stale = [
        q for q in never
        if birth[q] >= 7 and current_round - birth[q] >= 4
    ]
    assert not stale, (
        f"queries registered r7+ must reach the window within 4 rounds; "
        f"overdue: {[(q, birth[q]) for q in stale]}"
    )
