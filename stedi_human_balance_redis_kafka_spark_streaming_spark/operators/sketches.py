"""Count-Min frequency sketch — the third mergeable sketch next to the
built-in DataSketches HLL (distinct counts, plans/extras.py
events_sketch_reaggregate) and KLL (quantiles, orders_kll_quantile_merge):
CMS answers "how often did key x occur" from a fixed depth×width integer
grid, with the one-sided guarantee estimate ≥ true count.

Spark has no cms_sketch_agg built-in, but the sketch is just a keyed
partial-aggregable count grid, so it composes from DataFrame primitives
with nothing imperative:

* build  — explode each fact row into ``depth`` (seed, bucket) cells
           (md5-derived bucket per seed) and ONE groupBy count: the
           entire sketch is depth·width rows of exact int64, built
           map-side-combining like any count.
* merge  — cell-wise SUM of two sketch frames (union + re-groupBy):
           exact, associative, partition-order-free — the property that
           lets per-shard / per-day sketches roll up without re-reading
           facts.
* query  — probe a key's ``depth`` cells, take the MIN.

Determinism contract: buckets come from md5 hex (``conv(substr(md5,1,8),
16, 10) % width`` — the engine's established cross-engine hash-to-int
idiom), counts are exact integers, so every estimate is bit-identical in
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 64


def _cms_bucket(seed: int, key: Column, width: int) -> Column:
    """Bucket of ``key`` under hash row ``seed``: the first 8 md5 hex
    digits of "seed:key" as an integer, mod width — 32 hash bits per
    row, independent rows via the seed prefix."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def _cms_bucket_sql(seed: int, key_sql: str, width: int) -> str:
    """:func:`_cms_bucket` as SQL text — one-call construction for the
    depth×width grid builders, whose operator-by-operator Column form
    costs seconds of py4j round trips per query (see
    functions/vectors.py for the measured pattern).  Parses to the
    identical expression tree."""
    return (
        f"CAST(CONV(SUBSTRING(MD5(CONCAT('{seed}:', "
        f"CAST({key_sql} AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        f" % {width}"
    )


def cms_cells(
    facts: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Explode each fact row into its ``depth`` (seed, bucket) cells,
    carrying the ``keep`` columns through — the shared cell derivation
    under :func:`cms_build` (batch grid) and the streaming windowed
    grid (streaming/stateful.windowed_cms_grid, which keeps ``ts`` and
    adds the event-time window key before the count)."""
    k = F.col(key_col)
    return facts.select(
        *keep,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("seed"),
                        _cms_bucket(d, k, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(
        *keep,
        F.col("c.seed").alias("seed"),
        F.col("c.bucket").alias("bucket"),
    )


def cms_build(
    facts: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch grid: (seed, bucket, cnt), ≤ depth·width rows.

    One explode to depth narrow rows per fact + ONE partial-aggregable
    groupBy — the sketch build is exactly as distributed as a count.
    """
    return (
        cms_cells(facts, key_col, depth=depth, width=width)
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with identical (depth,
    width) — exact and associative, so shard/day sketches combine in
    any order into the same grid the single global build produces."""
    return (
        a.unionByName(b)
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: (key_col,
    cms_est) with cms_est = min over the key's depth cells (0 for a
    never-inserted key whose cells are absent).

    The probe frame is |keys|·depth narrow rows joined on (seed,
    bucket) against the ≤ depth·width-row sketch — AQE broadcasts the
    sketch side, so estimation is a map-side lookup at any fact
    volume.
    """
    k = F.col(key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("seed"),
                        _cms_bucket(d, k, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.seed").alias("seed"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_est")
        )
    )
