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
    """Build the filter as a ONE-ROW DataFrame carrying a '0'/'1'
    bitstring of length ``num_bits`` (column ``bf``).

    Scale shape: one partial-aggregable ``collect_set`` over exploded
    positions — bounded at ``num_bits`` distinct ints (kilobytes) by
    construction, NEVER key-cardinality — then a single-row transform
    renders the bitstring.  Broadcast cost is num_bits bytes.  Size
    ``num_bits`` ≈ 10× expected distinct keys for ~1-2% false-positive
    rate at k=3.
    """
    pos = small.select(
        F.explode(F.array(*_positions(F.col(key), num_hashes, num_bits))).alias("p")
    )
    agg = pos.agg(F.sort_array(F.collect_set("p")).alias("ps"))
    return agg.select(
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bits - 1)),
                lambda i: F.when(
                    F.array_contains(F.col("ps"), i.cast("long")), F.lit("1")
                ).otherwise(F.lit("0")),
            ),
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
    narrow codegen'd filter over a 1-row broadcast: k O(1) ``substring``
    probes per row — no join, no shuffle, pipelined with the scan.  Every
    true match survives (no false negatives), so composing with the real
    join afterwards is row-identical to joining unfiltered.
    """
    bits = bloom_bits(
        small, small_key or key, num_hashes=num_hashes, num_bits=num_bits
    )
    probe = None
    for p in _positions(F.col(key), num_hashes, num_bits):
        c = F.substring(F.col("__bf"), (p + 1).cast("int"), 1) == "1"
        probe = c if probe is None else (probe & c)
    return (
        big.crossJoin(F.broadcast(bits.withColumnRenamed("bf", "__bf")))
        .filter(probe)
        .drop("__bf")
    )
