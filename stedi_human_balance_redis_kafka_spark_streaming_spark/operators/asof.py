"""As-of join and bucketed range join — operators Spark lacks natively
(SURVEY.md §2.6 class).

For each left row (key, t), find the most recent right row (key, t_r ≤ t).
Implemented the scalable way: tag both sides, UNION, and carry the last
right value forward with a single window pass — one shuffle+sort on
(key, t), no per-group pandas, no broadcast of the big side.  This is the
standard distributed as-of formulation (a sort-merge, expressed
declaratively so Catalyst/Tungsten run it).

Determinism: ties on t_r are broken by the largest ``right_val`` (and
right rows sort before left rows at equal timestamps, so an exactly-equal
timestamp matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_val: str,
) -> DataFrame:
    """Return ``left`` with ``asof_time`` / ``asof_val`` columns: the time
    and value of the latest right row at-or-before each left row's time.

    Left rows with no prior right row keep NULLs (left-outer semantics).
    """
    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),  # left sorts after right at equal t
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast("timestamp").alias("__rt"),
        F.lit(None).cast(dict(right.dtypes)[right_val]).alias("__rv"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        F.col(right_time).alias("__rt"),
        F.col(right_val).alias("__rv"),
    )
    # __rv in ORDER BY: among right rows at the same (k, t), the largest
    # value is carried — the deterministic tie-break.
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.select(
        "__side",
        "__l",
        F.last("__rt", ignorenulls=True).over(w).alias("asof_time"),
        F.last("__rv", ignorenulls=True).over(w).alias("asof_val"),
    ).filter(F.col("__side") == 1)
    return carried.select("__l.*", "asof_time", "asof_val")


def bucketed_range_join(
    events: DataFrame,
    intervals: DataFrame,
    *,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 day",
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Interval (range) join: event rows matched to every interval row
    whose half-open window ``[start, end)`` contains the event time.

    Spark has no native range join — a plain theta join
    ``ON t >= s AND t < e`` with no equi key plans a
    BroadcastNestedLoop/cartesian, which is O(|events|·|intervals|) and
    dies at scale.  This is the standard BUCKETED formulation: quantize
    time into ``bucket``-sized cells, explode each interval into the
    cells it covers, and equi-join on the cell id (+ ``extra_keys``),
    refining with the exact predicate afterwards.  Cost becomes
    Θ(|events| + Σ interval_cells + matches), hash-partitioned on the
    cell — no cartesian (plan-audited in tests/test_plans.py).  No
    double counting: an event lives in exactly one cell and interval
    cell ids are distinct per interval.

    Pick ``bucket`` near the typical interval length: much smaller
    explodes intervals into many cells; much larger puts many
    non-matching events in each cell (refine-filter waste).  Both are
    correct — it's a constant-factor knob.  Cell-id skew (hot hours)
    is partition-level and AQE-splittable.

    Output: one row per (event, interval) match with all columns from
    both sides (minus the helper cell id).
    """
    bucket_us = {"1 hour": 3_600_000_000, "1 day": 86_400_000_000}.get(bucket)
    if bucket_us is None:
        raise ValueError("bucket must be '1 hour' or '1 day'")

    # Epoch-micros per column, SESSION-TZ-INDEPENDENTLY by dtype:
    # TIMESTAMP → unix_micros directly; TIMESTAMP_NTZ / DATE → pure NTZ
    # arithmetic against the NTZ epoch (a cast-to-TIMESTAMP would
    # interpret the wall clock in the session zone — cells and refine
    # comparisons would shift under non-UTC drivers, inconsistently
    # across DST boundaries, and mixed NTZ/instant inputs would
    # disagree with DuckDB's naive comparisons outright).
    def _us(df: DataFrame, col: str) -> F.Column:
        dt = dict(df.dtypes)[col]
        if dt in ("timestamp_ntz", "date"):
            return F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ"
                f" '1970-01-01 00:00:00', cast({col} as timestamp_ntz))"
            )
        return F.expr(f"unix_micros(cast({col} as timestamp))")

    e = events.withColumn("__tus", _us(events, time_col)).withColumn(
        "__cell", F.expr(f"__tus div {bucket_us}")
    )
    iv = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn("__sus", _us(intervals, start_col))
        .withColumn("__eus", _us(intervals, end_col))
        .withColumn(
            "__cell",
            F.explode(
                F.sequence(
                    F.expr(f"__sus div {bucket_us}"),
                    F.expr(f"(__eus - 1) div {bucket_us}"),
                )
            ),
        )
    )
    return (
        e.join(iv, [*extra_keys, "__cell"])
        # exact refine on the integer micros — no further casts
        .filter((F.col("__tus") >= F.col("__sus")) & (F.col("__tus") < F.col("__eus")))
        .drop("__cell", "__tus", "__sus", "__eus")
    )
