"""Z-order (Morton) interleaving for multi-dimensional data layout.

Sorting a table by a single column makes that column's parquet min/max
stats selective and every other column's useless; interleaving the bits
of several key columns gives every participating dimension *partial*
locality, so range filters on ANY of them prune row groups.  This is
the standard lakehouse layout trick (Delta/Iceberg `OPTIMIZE ZORDER
BY`), expressed here as a pure Column expression + a writer that
range-partitions and sorts by the interleaved key.

All bit math is `pyspark.sql.functions` (shiftleft/shiftright/bitwise
AND/OR composition) — codegen'd JVM-side, no UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column.

    ``cols`` must already be non-negative integers in ``[0, 2**bits)``
    — pre-bucket continuous values first (e.g. ``width_bucket`` or a
    quantile bucketer); out-of-range bits are masked off, so a too-hot
    column degrades locality instead of corrupting neighbors' bits.

    Column i's bit b lands at output position ``b * k + i`` (k = number
    of columns): the classic Morton layout where consecutive key ranges
    correspond to aligned hyper-rectangles of the key space.  Output is
    a BIGINT (so ``bits * k`` must be ≤ 63).
    """
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * k > 63:
        raise ValueError(f"bits*k = {bits * k} exceeds the 63-bit key budget")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    terms: list[Column] = []
    for i, c in enumerate(cs):
        v = c.cast("long")
        for b in range(bits):
            # ((v >> b) & 1) << (b*k + i)
            terms.append(
                F.shiftleft(
                    F.shiftright(v, b).bitwiseAND(F.lit(1)), b * k + i
                )
            )
    return reduce(lambda a, t: a.bitwiseOR(t), terms[1:], terms[0])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out in z-order on ``cols``.

    Range-partitions by the Morton key (so files hold contiguous key
    ranges — the property that makes min/max stats selective on every
    participating dimension), sorts within partitions, and drops the
    helper column before writing.
    """
    key = zorder_key(cols, bits=bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange("__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
