"""Table profiling: the per-column data-quality summary every ingest
pipeline runs before trusting a new drop — row/null/distinct counts,
an approximate-distinct cross-check, and value bounds.

One operator, three 1-row aggregates over the scan (plain / exact-
distinct / HLL — kept apart so Expand never meets an imperative
sketch buffer; see profile_table), long-form output so downstream
dashboards and drift diffs join on ``col_name``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# dtypes whose min/max render identically as strings in Spark and
# DuckDB (integral + string + date); floating/timestamp formatting is
# engine-specific, so bounds for those surface as NULL by policy.
_BOUND_RENDER_DTYPES = ("tinyint", "smallint", "int", "bigint", "string",
                       "date")

PROFILE_SCHEMA = (
    "col_name string, n_rows bigint, n_nulls bigint, n_distinct bigint, "
    "approx_ok boolean, min_s string, max_s string"
)


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column profile of ``df``: (col_name, n_rows, n_nulls,
    n_distinct, approx_ok, min_s, max_s).

    - ``n_distinct`` is EXACT (NULL excluded, SQL semantics); an
      HLL++-based estimate is computed alongside and surfaces as its
      ±5% cross-check flag (``approx_ok``) — the estimate itself is
      engine-specific so only the bound is emitted, the same
      estimate-next-to-exact contract as events_approx_distinct.  At
      100 TB the profile keeps the (partial-aggregable, expand-free)
      estimate and drops the exact count; the flag tells you the
      accuracy cost before you switch.
    - ``min_s``/``max_s`` render only for dtypes whose string form is
      engine-stable (integral, string, date); floating/timestamp
      bounds are NULL by policy (their rendering differs across
      engines, and FP bounds belong in quantized-integer queries).

    Scale shape: THREE 1-row aggregates over the scan, crossJoined
    (all broadcast) and unpivoted plan-side (explode over a literal
    struct array).  The split is deliberate, not cosmetic: the exact
    count-distincts rewrite through Spark's Expand, and mixing Expand
    with the IMPERATIVE HLL++ aggregate in one agg forces a sort-based
    aggregation that serializes/merges every sketch buffer per expanded
    row — measured 130 s on a 150 k-row table vs ~3 s split (plain
    codegen agg + distinct-only Expand agg + object-hash HLL agg).  At
    extreme scale drop the exact-distinct aggregate entirely and keep
    the HLL estimate (partial-aggregable, no expand).
    """
    dtypes = dict(df.dtypes)
    missing = [c for c in columns if c not in dtypes]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    plain = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        plain.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if dtypes[c] in _BOUND_RENDER_DTYPES:
            plain.append(F.min(F.col(c)).cast("string").alias(f"__mn_{c}"))
            plain.append(F.max(F.col(c)).cast("string").alias(f"__mx_{c}"))
    exact = [F.countDistinct(F.col(c)).alias(f"__nd_{c}") for c in columns]
    # rsd=0.02: measured ≤ ~2% deviation on every profiled dtype and
    # scale (HLL++ is deterministic per dataset), comfortably inside
    # the ±5% flag, at ~5× less sketch cost than rsd=0.01
    approx = [
        F.approx_count_distinct(F.col(c), 0.02).alias(f"__ad_{c}")
        for c in columns
    ]
    one = (
        df.agg(*plain)
        .crossJoin(F.broadcast(df.agg(*exact)))
        .crossJoin(F.broadcast(df.agg(*approx)))
    )
    per_col = []
    for c in columns:
        bounds = (
            (F.col(f"__mn_{c}"), F.col(f"__mx_{c}"))
            if dtypes[c] in _BOUND_RENDER_DTYPES
            else (F.lit(None).cast("string"), F.lit(None).cast("string"))
        )
        per_col.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (
                    F.abs(F.col(f"__ad_{c}") - F.col(f"__nd_{c}")) * 20
                    <= F.col(f"__nd_{c}")
                ).alias("approx_ok"),
                bounds[0].alias("min_s"),
                bounds[1].alias("max_s"),
            )
        )
    return (
        one.select(F.explode(F.array(*per_col)).alias("p"))
        .select("p.*")
        .select(
            "col_name",
            F.col("n_rows").cast("long"),
            F.col("n_nulls").cast("long"),
            F.col("n_distinct").cast("long"),
            "approx_ok",
            "min_s",
            "max_s",
        )
    )


def profile_drift(
    profile_a: DataFrame,
    profile_b: DataFrame,
    *,
    null_rate_delta_e6: int = 10_000,
    distinct_ratio_e6: int = 200_000,
) -> DataFrame:
    """Two-snapshot drift diff over :func:`profile_table` outputs — the
    natural consumer of the long-form profile and the data-quality gate
    an ingest pipeline actually runs: join yesterday's profile against
    today's on ``col_name`` and flag the deltas that mean the drop
    changed shape, not just size.

    Flags (all exact integer arithmetic, hence SQL-mirrorable):

    - ``null_drift`` — per-column null RATE (in 1e-6 units, div-
      truncated) moved by more than ``null_rate_delta_e6`` (default
      1%); rate, not count, so growth alone never trips it.
    - ``distinct_drift`` — the distinct-count ratio b/a (1e6 units)
      left [1e6 − t, 1e6 + t] for t = ``distinct_ratio_e6`` (default
      ±20%) RELATIVE to the row-count ratio is deliberately NOT used:
      cardinality tracking row volume is itself a signal dashboards
      want raw, so the flag is the plain ratio and the raw counts ride
      alongside.  A column absent from one side (schema change) flags
      unconditionally.
    - ``bounds_changed`` — the engine-stable rendered min/max strings
      differ (new extremes or a dtype whose bounds policy changed);
      rendered-string EQUALITY, never string ordering, so numeric
      columns can't false-positive on lexicographic quirks.

    Input frames only need the PROFILE_SCHEMA columns; the join is on
    the (columns-count-bounded) long form — zero new scans of either
    snapshot.  Output: one row per col_name in either profile.
    """
    sel = lambda p, s: p.select(  # noqa: E731
        "col_name",
        F.col("n_rows").alias(f"n_rows_{s}"),
        F.col("n_nulls").alias(f"__nn_{s}"),
        F.col("n_distinct").alias(f"n_distinct_{s}"),
        F.col("min_s").alias(f"__mn_{s}"),
        F.col("max_s").alias(f"__mx_{s}"),
    )
    j = sel(profile_a, "a").join(sel(profile_b, "b"), "col_name", "full_outer")
    rate = lambda s: F.when(  # noqa: E731
        F.col(f"n_rows_{s}") > 0,
        F.expr(f"(__nn_{s} * 1000000L) div n_rows_{s}"),
    ).otherwise(F.lit(0))
    both = F.col("n_rows_a").isNotNull() & F.col("n_rows_b").isNotNull()
    ratio = F.when(
        F.col("n_distinct_a") > 0,
        F.expr("(n_distinct_b * 1000000L) div n_distinct_a"),
    )
    return j.select(
        "col_name",
        both.alias("in_both"),
        F.col("n_rows_a").cast("long").alias("n_rows_a"),
        F.col("n_rows_b").cast("long").alias("n_rows_b"),
        rate("a").cast("long").alias("null_rate_a_e6"),
        rate("b").cast("long").alias("null_rate_b_e6"),
        F.col("n_distinct_a").cast("long").alias("n_distinct_a"),
        F.col("n_distinct_b").cast("long").alias("n_distinct_b"),
        F.when(
            both,
            F.abs(rate("b") - rate("a")) > null_rate_delta_e6,
        )
        .otherwise(F.lit(True))
        .alias("null_drift"),
        F.when(
            both,
            F.coalesce(
                F.abs(ratio - 1_000_000) > distinct_ratio_e6, F.lit(True)
            ),
        )
        .otherwise(F.lit(True))
        .alias("distinct_drift"),
        F.when(
            both,
            ~(F.col("__mn_a").eqNullSafe(F.col("__mn_b")))
            | ~(F.col("__mx_a").eqNullSafe(F.col("__mx_b"))),
        )
        .otherwise(F.lit(True))
        .alias("bounds_changed"),
    )


def mad_outliers(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Robust outlier profile per group: lower-median / lower-MAD
    (median absolute deviation) and the count of values whose absolute
    deviation exceeds ``k``·MAD — the robust dual of the z-score gate
    (``events_anomaly_outliers``): a single wild value shifts a mean
    and inflates a stddev (masking itself), but moves a median/MAD not
    at all, which is why data-quality monitors prefer the MAD flag on
    heavy-tailed feeds.

    Exactness contract: ``value_col`` must already be an integer-
    quantized value (the repo policy — e.g. cents / e6 units); the
    median is the LOWER median — the value at 1-indexed position
    ``(n+1) div 2`` of the (value, id) total order, an ELEMENT of the
    data, never an average of two — and the MAD is the lower median of
    |v − med|.  Every statistic and the ``k``·MAD comparison is then
    exact int64, so a SQL oracle replays the whole profile
    bit-for-bit.  The flag is STRICT (dev > k·MAD): on a degenerate
    group where > half the values are identical, MAD = 0 and every
    value off the median flags — the documented behavior, not an
    error (such a feed IS anomalous).  Null values are excluded from
    n and every statistic.

    Output: (group, n, med, mad, n_outliers), one row per group.

    Scale shape: two group-keyed sorted windows (the value order and
    the deviation order — the unavoidable price of EXACT order
    statistics; both windows share the ``group_col`` exchange key) and
    two broadcast joins of the |groups|-row median/MAD frames; the
    final rollup is partial-aggregable.  At extreme group sizes,
    pre-filter each selection with an approximate percentile band
    around the target rank (same kept element, bounded sort input) —
    the ``sample_quota`` playbook; the exact form is the oracle-
    checkable contract.
    """
    v = F.col(value_col)
    base = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("__g"), F.col(id_col).alias("__id"),
        v.cast("long").alias("__v"),
    )

    def _lower_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        wo = Window.partitionBy("__g").orderBy(col, "__id")
        wp = Window.partitionBy("__g")
        return (
            frame.withColumn("__rn", F.row_number().over(wo))
            .withColumn("__n", F.count("*").over(wp))
            .filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
            .select("__g", F.col(col).alias(out))
        )

    med = _lower_median(base, "__v", "__med")
    dev = base.join(F.broadcast(med), "__g").withColumn(
        "__dev", F.abs(F.col("__v") - F.col("__med"))
    )
    mad = _lower_median(dev, "__dev", "__mad")
    return (
        dev.join(F.broadcast(mad), "__g")
        .groupBy(F.col("__g").alias(group_col))
        .agg(
            F.count("*").alias("n"),
            F.max("__med").alias("med"),
            F.max("__mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("__dev") > F.lit(int(k)) * F.col("__mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )
