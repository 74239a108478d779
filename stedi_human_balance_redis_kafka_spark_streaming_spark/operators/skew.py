"""Skew mitigation for shuffle joins: deterministic key salting.

AQE's skew-join splitting (on by default in session.py) handles most hot
keys by splitting oversized shuffle partitions at runtime.  Salting is
the complementary *plan-level* tool for the case AQE can't fix: a single
join KEY so hot that one task would still process it alone (AQE splits
partitions, not keys, for sort-merge joins without a replicable side).

``salted_join`` replicates the small/uniform side ``salt`` ways and
scatters the skewed side's rows across the replicas with a deterministic
per-row salt, so the hot key's rows spread over ``salt`` tasks.  The
result is row-identical to the plain join (each skewed row meets exactly
the one replica matching its salt).

Determinism: the salt is ``pmod(xxhash64(<salt_from columns>), salt)`` —
a pure function of row content, never a RNG — so results are
reproducible across runs, retries, and re-partitioning (same policy as
curation.sample_by_hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt: int = 8,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` ⨝ ``other`` on ``on`` with ``salt``-way key salting.

    ``skewed``: the side with hot keys — gets a deterministic per-row
    salt derived from ``salt_from`` (default: all its non-key columns).
    ``other``: the replicated side — exploded ``salt`` ways (its shuffle
    volume grows ×salt; keep it the smaller side).  ``how``: 'inner' or
    'left' (left = keep unmatched skewed rows).

    Scale: turns one task processing a hot key into ``salt`` tasks at
    the cost of replicating the other side — the standard trade when a
    single key exceeds one executor's share.  Compose with AQE rather
    than replacing it: salting bounds the worst key, AQE coalesces the
    rest.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    src = salt_from or [c for c in skewed.columns if c not in on]
    if not src:
        raise ValueError("salt_from is required when the skewed side is key-only")
    s = skewed.withColumn(
        _SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(salt)).cast("int")
    )
    o = other.withColumn(
        _SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return s.join(o, [*on, _SALT_COL], how).drop(_SALT_COL)
