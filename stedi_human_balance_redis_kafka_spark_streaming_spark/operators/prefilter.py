"""Bloom-filter join pruning — the classic 100 TB shuffle-reduction
technique, built DataFrame-native.

A shuffle join moves EVERY big-side row to its hash partition, including
rows whose key never appears on the other side.  A Bloom prefilter built
from the small side's keys drops most non-matching rows BEFORE the
exchange: at a 1% match rate the shuffle shrinks ~100×, for the cost of
one bounded broadcast and k hash probes per row.

Spark core has this idea as internal runtime filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, the unregistered
``bloom_filter_agg`` expression), but it only fires in specific
shapes; this operator is the explicit, composable form.

Correctness: a Bloom filter has NO false negatives — every true match
survives — so ``join(bloom_prefilter(big, small, key), small, key)`` is
ROW-IDENTICAL to the plain join (the oracle for any consumer query is
simply the plain join).  False positives only cost shuffle bytes.

Determinism: bit positions derive from md5 (the engine's cross-engine
hash convention, functions/hashing.py) — the filter contents are a pure
function of the key set, independent of partitioning (property-tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, num_hashes: int, num_bits: int) -> list[Column]:
    """k deterministic bit positions for a key: seed i's position is the
    first 8 hex digits of ``md5(i ':' key)`` as an int, mod num_bits.
    8 hex digits < 2^32 always fit the long that ``conv`` feeds."""
    return [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), key.cast("string")).cast("binary")),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % num_bits
        )
        for i in range(num_hashes)
    ]


def bloom_bits(
    small: DataFrame, key: str, num_hashes: int = 3, num_bits: int = 16384
) -> DataFrame:
    """Build the filter as a ONE-ROW DataFrame carrying an
    ``array<boolean>`` of length ``num_bits`` (column ``bf``).

    Scale shape: a distinct over exploded positions — bounded at
    ``num_bits`` ints (kilobytes) by construction, NEVER
    key-cardinality — left-joined by a dense ``range(num_bits)`` axis,
    then ONE num_bits-element sorted collect assembles the flags.
    Broadcast cost is num_bits bytes.  Size ``num_bits`` ≈ 10× expected
    distinct keys for ~1-2% false-positive rate at k=3.
    """
    pos = small.select(
        F.explode(F.array(*_positions(F.col(key), num_hashes, num_bits))).alias("p")
    ).distinct()
    # Render the filter as array<boolean> built DISTRIBUTED: dense bit
    # axis left-joins the set positions (one bounded shuffle), then a
    # single sorted collect assembles num_bits flags.  Two rejected
    # alternatives, both measured in MINUTES at num_bits=65536: a one-row
    # transform(sequence, i -> array_contains(ps, i)) is
    # O(num_bits·|positions|) on one task, and a '0'/'1' STRING probed
    # with substring scans O(position) bytes per probe (UTF8String
    # boundary walk) × rows × k.  Array element access is O(1).
    axis = small.sparkSession.range(num_bits).select(F.col("id").alias("i"))
    flags = axis.join(pos, axis["i"] == pos["p"], "left").select(
        "i", F.col("p").isNotNull().alias("b")
    )
    return flags.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "b"))), lambda s: s["b"]
        ).alias("bf")
    )


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    small_key: str | None = None,
    num_hashes: int = 3,
    num_bits: int = 16384,
) -> DataFrame:
    """Drop big-side rows whose ``key`` cannot match ``small``'s
    ``small_key`` set, before any shuffle.

    Returns ``big``'s rows (same schema) with the probe applied as a
    narrow codegen'd filter over a 1-row broadcast: k O(1) array-element
    probes per row — no join, no shuffle, pipelined with the scan.  Every
    true match survives (no false negatives), so composing with the real
    join afterwards is row-identical to joining unfiltered.
    """
    bits = bloom_bits(
        small, small_key or key, num_hashes=num_hashes, num_bits=num_bits
    )
    probe = None
    for p in _positions(F.col(key), num_hashes, num_bits):
        c = F.get(F.col("__bf"), p.cast("int"))  # O(1) array access
        probe = c if probe is None else (probe & c)
    return (
        big.crossJoin(F.broadcast(bits.withColumnRenamed("bf", "__bf")))
        .filter(probe)
        .drop("__bf")
    )
