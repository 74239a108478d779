"""As-of join — an operator Spark lacks natively (SURVEY.md §2.6 class).

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
